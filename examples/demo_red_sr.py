"""RED (regularization by denoising) super-resolution — counterpart of
reference examples/plug-and-play/demo_RED_GSPnP_SR.py (GSPnP weights are
download-gated; the RED prior uses a wavelet denoiser)."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import _util

_util.setup()  # CPU by default; DEEPINV_TPU_DEMO_PLATFORM overrides

import jax
import jax.numpy as jnp

from deepinv_tpu.physics import Downsampling, GaussianNoise
from deepinv_tpu.optim import optim_builder, L2, RED
from deepinv_tpu.models import WaveletDenoiser
from deepinv_tpu.loss.metric import PSNR
from deepinv_tpu.datasets import random_circles


def main():
    x = jnp.asarray(random_circles(64, seed=3))[None]
    physics = Downsampling(img_size=(1, 64, 64), factor=2, filter="gaussian",
                           noise_model=GaussianNoise(0.01))
    y = physics(x, key=jax.random.key(0))

    model = optim_builder(
        "GD", data_fidelity=L2(),
        prior=RED(WaveletDenoiser(wv="db4", level=3)),
        params_algo={"stepsize": 1.0, "g_param": 0.03, "lambda": 0.5},
        max_iter=40,
    )
    xhat = jax.jit(lambda m, yv, p: m(yv, p))(model, y, physics)

    naive = physics.A_adjoint(y) * 4  # zero-fill upsampling baseline
    psnr = PSNR()
    print(f"upsampled adjoint: {float(psnr(naive, x)[0]):.2f} dB, "
          f"RED: {float(psnr(xhat, x)[0]):.2f} dB")


if __name__ == "__main__":
    main()
