"""Quickstart: measure, reconstruct, evaluate in ~15 lines
(counterpart of reference examples/basics/demo_quickstart.py)."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import _util

_util.setup()  # CPU by default; DEEPINV_TPU_DEMO_PLATFORM overrides

import jax
import jax.numpy as jnp

from deepinv_tpu.physics import Inpainting, GaussianNoise
from deepinv_tpu.optim import optim_builder, L2, PnP
from deepinv_tpu.models import MedianFilter
from deepinv_tpu.loss.metric import PSNR
from deepinv_tpu.datasets import random_circles


def main():
    x = jnp.asarray(random_circles(64, seed=0))[None]
    physics = Inpainting(img_size=(1, 64, 64), mask=0.6,
                         key=jax.random.key(0),
                         noise_model=GaussianNoise(0.05))
    y = physics(x, key=jax.random.key(1))

    model = optim_builder("PGD", data_fidelity=L2(),
                          prior=PnP(MedianFilter(kernel_size=3)),
                          params_algo={"stepsize": 1.0, "g_param": 0.05},
                          max_iter=20)
    xhat = jax.jit(lambda m, yv, p: m(yv, p))(model, y, physics)

    psnr = PSNR()
    print(f"PSNR measurement: {float(psnr(y, x)[0]):.2f} dB")
    print(f"PSNR reconstruction: {float(psnr(xhat, x)[0]):.2f} dB")
    assert float(psnr(xhat, x)[0]) > float(psnr(y, x)[0])


if __name__ == "__main__":
    main()
