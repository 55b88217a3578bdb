"""DEAL: learned convex-masked regularization with equilibrium CG solves —
model-zoo demo (reference models/deal.py). Runs the weight-portable DEAL
in both denoiser and reconstructor modes (random weights here; load
published checkpoints with models.convert.port_deal)."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import _util

_util.setup()  # CPU by default; DEEPINV_TPU_DEMO_PLATFORM overrides

import jax
import jax.numpy as jnp

from deepinv_tpu.models import DEAL
from deepinv_tpu.physics import Inpainting, GaussianNoise
from deepinv_tpu.datasets import random_circles


def main():
    x = jnp.asarray(random_circles(32, seed=0))[None]
    model = DEAL(color=False, max_iter=5, lambda_reg=2.0,
                 key=jax.random.key(0))

    # denoiser convention: model(y, sigma)
    noisy = x + 0.1 * jax.random.normal(jax.random.key(1), x.shape)
    den = model(noisy, 0.1)
    print("denoised range:", float(den.min()), float(den.max()))

    # reconstructor convention: model(y, physics)
    physics = Inpainting(img_size=(1, 32, 32), mask=0.6,
                         key=jax.random.key(2),
                         noise_model=GaussianNoise(0.02))
    y = physics(x, key=jax.random.key(3))
    xhat = model(y, physics)
    print("reconstruction shape:", xhat.shape)


if __name__ == "__main__":
    main()
