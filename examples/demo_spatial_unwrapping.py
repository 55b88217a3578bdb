"""Phase unwrapping: recover absolute phase from wrapped measurements.

Mirrors the reference gallery's ``physics/demo_spatial_unwrapping.py``
(reference physics/spatial_unwrapping.py:8): the forward operator wraps
phase modulo a threshold (2*pi by default); ``A_dagger`` implements the Itoh
path-integration inverse, exact whenever neighboring-pixel phase jumps stay
below half the threshold.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import _util

_util.setup()  # CPU by default; DEEPINV_TPU_DEMO_PLATFORM overrides

import jax
import jax.numpy as jnp
import numpy as np

from deepinv_tpu.physics import GaussianNoise, SpatialUnwrapping


def main():
    H = W = 64
    ii, jj = jnp.meshgrid(jnp.linspace(-1, 1, H), jnp.linspace(-1, 1, W),
                          indexing="ij")
    # smooth ramp + bump: dynamic range ~6 thresholds, gradients < pi
    x = (8.0 * ii + 10.0 * jnp.exp(-4 * (ii**2 + jj**2)))[None, None]

    physics = SpatialUnwrapping(threshold=2 * jnp.pi, mode="round")
    y = physics.A(x)
    wraps = float((jnp.abs(x - y) > 1e-6).mean())
    print(f"wrapped pixels: {100 * wraps:.1f}% of the image")
    assert wraps > 0.2, "the test phase should actually wrap"

    # Itoh inversion: integrate wrapped finite differences
    x_hat = physics.A_dagger(y)
    # absolute phase is recovered up to a global multiple of the threshold
    offset = jnp.round((x_hat - x).mean() / (2 * jnp.pi)) * 2 * jnp.pi
    err = float(jnp.abs(x_hat - x - offset).max())
    print(f"Itoh unwrapping max error: {err:.2e}")
    assert err < 1e-4

    # with measurement noise the unwrap is approximate but still close
    yn = GaussianNoise(0.01)(y, key=jax.random.key(0))
    x_noisy = physics.A_dagger(yn)
    offset = jnp.round((x_noisy - x).mean() / (2 * jnp.pi)) * 2 * jnp.pi
    rel = float(jnp.linalg.norm(x_noisy - x - offset) / jnp.linalg.norm(x))
    print(f"noisy unwrap relative error: {rel:.3f}")
    assert rel < 0.1

    print("spatial unwrapping demo OK")


if __name__ == "__main__":
    main()
