"""PnP mirror descent with a Bregman geometry (Burg entropy) for
Poisson-noise inverse problems — counterpart of reference
examples/plug-and-play/demo_PnP_mirror_descent.py."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import _util

_util.setup()  # CPU by default; DEEPINV_TPU_DEMO_PLATFORM overrides

import jax
import jax.numpy as jnp

from deepinv_tpu.physics import Denoising, PoissonNoise
from deepinv_tpu.optim import optim_builder, PoissonLikelihood, RED, BurgEntropy
from deepinv_tpu.models import MedianFilter
from deepinv_tpu.loss.metric import PSNR
from deepinv_tpu.datasets import random_circles


def main():
    gain = 0.01
    # keep the signal well inside the positive orthant (Burg geometry)
    x = jnp.asarray(random_circles(64, seed=2))[None] * 0.7 + 0.2
    physics = Denoising(noise_model=PoissonNoise(gain=gain))
    y = physics(x, key=jax.random.key(0))

    model = optim_builder(
        "MD", data_fidelity=PoissonLikelihood(gain=gain),
        # mirror descent needs a prior gradient: RED's x - denoiser(x)
        prior=RED(MedianFilter(kernel_size=3)),
        bregman_potential=BurgEntropy(),
        params_algo={"stepsize": 0.01, "g_param": 0.05, "lambda": 1.0},
        max_iter=50,
    )
    xhat = jax.jit(lambda m, yv, p: m(yv, p))(model, y, physics)
    psnr = PSNR()
    print(f"noisy: {float(psnr(y, x)[0]):.2f} dB, "
          f"PnP-MD: {float(psnr(xhat, x)[0]):.2f} dB")
    assert float(psnr(xhat, x)[0]) > float(psnr(y, x)[0])


if __name__ == "__main__":
    main()
