"""Vanilla plug-and-play: build PnP from first principles — counterpart of
reference examples/plug-and-play/demo_vanilla_PnP.py."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import _util

_util.setup()  # CPU by default; DEEPINV_TPU_DEMO_PLATFORM overrides

import jax
import jax.numpy as jnp

from deepinv_tpu.physics import Inpainting, GaussianNoise
from deepinv_tpu.models import WaveletDenoiser
from deepinv_tpu.loss.metric import PSNR
from deepinv_tpu.datasets import random_circles


def main():
    x = jnp.asarray(random_circles(64, seed=0))[None]
    physics = Inpainting(img_size=(1, 64, 64), mask=0.5,
                         key=jax.random.key(0),
                         noise_model=GaussianNoise(0.03))
    y = physics(x, key=jax.random.key(1))
    den = WaveletDenoiser(wv="db4", level=3)

    # hand-rolled PnP-PGD: gradient step on ||Ax-y||^2, then denoise —
    # compiled into one XLA program with lax.fori_loop
    @jax.jit
    def pnp(y):
        def body(_, z):
            z = z - physics.A_adjoint(physics.A(z) - y)
            return den(z, 0.06)

        return jax.lax.fori_loop(0, 40, body, physics.A_adjoint(y))

    xhat = pnp(y)
    psnr = PSNR()
    print(f"measurement: {float(psnr(y, x)[0]):.2f} dB, "
          f"vanilla PnP: {float(psnr(xhat, x)[0]):.2f} dB")
    assert float(psnr(xhat, x)[0]) > float(psnr(y, x)[0])


if __name__ == "__main__":
    main()
