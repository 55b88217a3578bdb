"""Diffusion posterior sampling with DDRM, DiffPIR and DPS on inpainting
(counterpart of reference examples/sampling/demo_ddrm.py, demo_diffpir.py,
demo_dps.py)."""

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

from deepinv_tpu.physics import Inpainting, GaussianNoise
from deepinv_tpu.sampling import DDRM, DiffPIR, DPS
from deepinv_tpu.optim import L2
from deepinv_tpu.models import WaveletDenoiser
from deepinv_tpu.loss import PSNR
from deepinv_tpu.datasets import random_circles


def main():
    x = jnp.asarray(random_circles(64, seed=1))[None]
    physics = Inpainting(img_size=(1, 64, 64), mask=0.5, key=jax.random.key(0),
                         noise_model=GaussianNoise(0.05))
    y = physics(x, key=jax.random.key(1))
    den = WaveletDenoiser("db4", 3)
    psnr = PSNR()
    p = lambda v: float(np.mean(np.asarray(psnr(v, x))))
    print(f"adjoint baseline: {p(physics.A_adjoint(y)):.2f} dB")

    ddrm = DDRM(denoiser=lambda u, s: den(u, 0.7 * s),
                sigmas=np.linspace(1, 0, 50))
    print(f"DDRM   : {p(ddrm(y, physics, key=jax.random.key(2))):.2f} dB")

    diffpir = DiffPIR(lambda u, s: den(u, 0.7 * s), data_fidelity=L2(),
                      max_iter=30, zeta=1.0, sigma=0.05)
    print(f"DiffPIR: {p(diffpir(y, physics, key=jax.random.key(3))):.2f} dB")

    # DPS guides the reverse diffusion with autodiff through the denoiser;
    # it needs a *score-model-like* denoiser (D ~ E[x0 | x_t]). With an
    # analytic Gaussian-prior denoiser the posterior sample provably
    # concentrates near the true posterior mean:
    mu, tau = float(x.mean()), 0.4

    def gauss_den(u, s, **kw):
        s2 = jnp.asarray(s) ** 2
        return (mu * s2 + u * tau**2) / (tau**2 + s2)

    dps = DPS(gauss_den, data_fidelity=L2(), max_iter=200, guidance_scale=3.0)
    xd = dps(y, physics, key=jax.random.key(4))
    print(f"DPS (Gaussian-prior score): {p(xd):.2f} dB "
          f"(sample mean {float(xd.mean()):.2f}, prior mean {mu:.2f})")


if __name__ == "__main__":
    main()
