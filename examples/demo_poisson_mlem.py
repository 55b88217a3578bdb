"""Poisson MLEM tomography reconstruction — counterpart of reference
examples/optimization/demo_poisson_mlem.py."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import _util

_util.setup()  # CPU by default; DEEPINV_TPU_DEMO_PLATFORM overrides

import jax
import jax.numpy as jnp

from deepinv_tpu.physics import Tomography, PoissonNoise
from deepinv_tpu.optim import optim_builder, PoissonLikelihood, Zero
from deepinv_tpu.loss.metric import PSNR
from deepinv_tpu.datasets import shepp_logan


def main():
    x = jnp.asarray(shepp_logan(64))[None, None] + 0.05
    physics = Tomography(img_width=64, angles=60, normalize=True,
                         noise_model=PoissonNoise(gain=0.01))
    y = physics(x, key=jax.random.key(0))

    model = optim_builder("MLEM", data_fidelity=PoissonLikelihood(gain=0.01),
                          prior=Zero(), params_algo={"stepsize": 1.0},
                          max_iter=30)
    xhat = jax.jit(lambda m, yv, p: m(yv, p))(model, y, physics)

    fbp = physics.A_dagger(y)
    psnr = PSNR()
    print(f"FBP PSNR : {float(psnr(fbp, x)[0]):.2f} dB")
    print(f"MLEM PSNR: {float(psnr(xhat, x)[0]):.2f} dB")


if __name__ == "__main__":
    main()
