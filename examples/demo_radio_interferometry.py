"""Radio-interferometric imaging with the pure-XLA Kaiser-Bessel NUFFT
(counterpart of reference examples/advanced/demo_radio_interferometry.py,
which needs torchkbnufft).

Simulates a random-baseline uv coverage, measures visibilities of a phantom
sky, and reconstructs with PnP-FISTA + TV. The data-fidelity gradient runs
through the Toeplitz-embedded normal operator (two FFTs per iteration — no
gridding gathers in the loop; see docs/tpu.md).
"""

# make the repo root importable when run as `python examples/<demo>.py`
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import _util

_util.setup()  # CPU by default; DEEPINV_TPU_DEMO_PLATFORM overrides

import jax
import jax.numpy as jnp
import numpy as np

from deepinv_tpu.physics import RadioInterferometry, GaussianNoise
from deepinv_tpu.optim import optim_builder, L2, PnP
from deepinv_tpu.models import TVDenoiser
from deepinv_tpu.datasets import shepp_logan
from deepinv_tpu.loss import PSNR


def main(size=128, n_vis=20_000, sigma=0.01):
    rng = np.random.default_rng(0)
    # dense centrally-concentrated uv coverage (baselines cluster short)
    uv = rng.normal(size=(2, n_vis)) * (np.pi / 3)
    uv = np.clip(uv, -np.pi * 0.95, np.pi * 0.95).astype(np.float32)

    x = jnp.asarray(shepp_logan(size))[None, None]
    physics = RadioInterferometry(
        (size, size), uv, noise_model=GaussianNoise(sigma)
    )
    y = jax.jit(lambda p, v, k: p(v, key=k))(physics, x, jax.random.key(0))

    # scale the step to the operator norm (power method, one-time)
    nrm = float(np.asarray(jax.jit(lambda p, v: p.compute_norm(v, max_iter=20))(
        physics, x)))
    model = optim_builder(
        "FISTA",
        data_fidelity=L2(),
        prior=PnP(lambda u, s: TVDenoiser(20)(jnp.real(u), 0.002)),
        params_algo={"stepsize": 1.0 / nrm, "g_param": 0.05},
        max_iter=40,
        custom_init=lambda yv, p: jnp.real(p.A_adjoint(yv)) / nrm,
    )
    xhat = jax.jit(lambda m, yv, p: m(yv, p))(model, y, physics)

    psnr = jax.jit(lambda a, b: jnp.mean(PSNR()(jnp.real(a), b)))
    dirty = jax.jit(lambda p, v: jnp.real(p.A_adjoint(v)) / nrm)(physics, y)
    print(f"dirty image PSNR: {float(np.asarray(psnr(dirty, x))):.2f} dB -> "
          f"PnP-FISTA: {float(np.asarray(psnr(xhat, x))):.2f} dB")


if __name__ == "__main__":
    main()
