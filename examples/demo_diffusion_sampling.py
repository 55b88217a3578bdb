"""Diffusion posterior sampling with DDRM on inpainting
(counterpart of reference examples/sampling)."""

# make the repo root importable when run as `python examples/<demo>.py`
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from deepinv_tpu.physics import Inpainting, GaussianNoise
from deepinv_tpu.sampling import DDRM
from deepinv_tpu.models import WaveletDenoiser
from deepinv_tpu.loss import PSNR
from deepinv_tpu.datasets import random_circles


def main():
    x = jnp.asarray(random_circles(64, seed=1))[None]
    physics = Inpainting(img_size=(1, 64, 64), mask=0.5, key=jax.random.key(0),
                         noise_model=GaussianNoise(0.05))
    y = physics(x, key=jax.random.key(1))
    den = WaveletDenoiser("db4", 3)
    model = DDRM(denoiser=lambda u, s: den(u, 0.7 * s), sigmas=np.linspace(1, 0, 50))
    xhat = model(y, physics, key=jax.random.key(2))
    psnr = PSNR()
    print(f"adjoint: {float(np.mean(np.asarray(psnr(physics.A_adjoint(y), x)))):.2f} dB -> "
          f"DDRM: {float(np.mean(np.asarray(psnr(xhat, x)))):.2f} dB")


if __name__ == "__main__":
    main()
