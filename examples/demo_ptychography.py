"""Ptychography: complex-field recovery from overlapping probe scans.

Mirrors the reference gallery's ``physics/demo_ptychography.py``
(reference physics/phase_retrieval.py:317,433): a complex object is scanned
by a localized probe over a grid of shifts; each scan records the far-field
intensity |F(probe * shift(x))|^2. With a scan grid whose probes tile the
whole field, plain gradient descent on the amplitude loss recovers the
object exactly (up to the unidentifiable global phase).
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import _util

_util.setup()  # CPU by default; DEEPINV_TPU_DEMO_PLATFORM overrides

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from deepinv_tpu.datasets import random_circles
from deepinv_tpu.optim import AmplitudeLoss
from deepinv_tpu.physics import Ptychography
from deepinv_tpu.physics.phase_retrieval import (
    correct_global_phase,
    cosine_similarity,
)


def main():
    H = W = 32
    # complex object: phantom amplitude, smooth phase
    amp = 0.5 + 0.5 * jnp.asarray(random_circles(H, seed=7)).reshape(1, 1, H, W)
    ii, jj = jnp.meshgrid(jnp.linspace(-1, 1, H), jnp.linspace(-1, 1, W),
                          indexing="ij")
    phase = 0.3 * jnp.sin(2 * jnp.pi * ii) * jnp.cos(2 * jnp.pi * jj)
    x = amp * jnp.exp(1j * phase)

    # 6x6 scan grid: every pixel is illuminated by several probes (the
    # default center-only raster leaves border pixels dark and unrecoverable)
    shifts = np.array([(r, c) for r in range(0, H, 6) for c in range(0, W, 6)])
    physics = Ptychography(img_size=(1, H, W), shifts=shifts)
    y = physics(x)  # per-scan far-field intensities
    print(f"scans: {y.shape[1]}, measurement {tuple(y.shape)}")

    # amplitude-loss gradient descent, jitted as one scan
    fid = AmplitudeLoss()
    x0 = jnp.full_like(x, 0.5 + 0j)

    @partial(jax.jit, static_argnums=(1,))
    def recon(x0, n):
        def body(xk, _):
            return xk - 0.03 * fid.grad(xk, y, physics), None
        return jax.lax.scan(body, x0, None, length=n)[0]

    x_hat = correct_global_phase(recon(x0, 1500), x)
    rel = float(jnp.linalg.norm(x_hat - x) / jnp.linalg.norm(x))
    cos = float(cosine_similarity(x_hat, x))
    print(f"relative error after 1500 GD steps: {rel:.2e} "
          f"(cosine similarity {cos:.5f})")
    assert rel < 1e-2, "full-coverage ptychography should recover x exactly"

    print("ptychography demo OK")


if __name__ == "__main__":
    main()
