"""Deep Image Prior: reconstruction with an untrained network —
counterpart of reference examples/optimization/demo_dip.py."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import _util

_util.setup()  # CPU by default; DEEPINV_TPU_DEMO_PLATFORM overrides

import jax
import jax.numpy as jnp

from deepinv_tpu.physics import Inpainting, GaussianNoise
from deepinv_tpu.models import DeepImagePrior
from deepinv_tpu.loss.metric import PSNR
from deepinv_tpu.datasets import random_circles


def main():
    x = jnp.asarray(random_circles(32, seed=1))[None]
    physics = Inpainting(img_size=(1, 32, 32), mask=0.3,
                         key=jax.random.key(0),
                         noise_model=GaussianNoise(0.02))
    y = physics(x, key=jax.random.key(1))

    model = DeepImagePrior(img_shape=(1, 32, 32), iterations=_util.scale(800, 100), lr=3e-2)
    xhat = model(y, physics, key=jax.random.key(2))

    psnr = PSNR()
    print(f"measurement PSNR   : {float(psnr(y, x)[0]):.2f} dB")
    print(f"DIP reconstruction : {float(psnr(xhat, x)[0]):.2f} dB")
    assert float(psnr(xhat, x)[0]) > float(psnr(y, x)[0])


if __name__ == "__main__":
    main()
