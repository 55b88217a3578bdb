"""SURE self-supervised denoising (Gaussian / Poisson / Poisson-Gaussian)
— counterpart of reference
examples/self-supervised-learning/demo_sure_denoising.py.

Shows that the SURE objective estimates the true MSE risk without clean
images (Monte-Carlo divergence estimate)."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import _util

_util.setup()  # CPU by default; DEEPINV_TPU_DEMO_PLATFORM overrides

import jax
import jax.numpy as jnp
import numpy as np

from deepinv_tpu.physics import Denoising, GaussianNoise, PoissonNoise
from deepinv_tpu.models import MedianFilter
from deepinv_tpu.loss import SureGaussianLoss, SurePoissonLoss
from deepinv_tpu.datasets import random_circles


def main():
    sigma = 0.1
    x = jnp.asarray(np.stack(
        [random_circles(32, seed=i) for i in range(8)]))
    physics = Denoising(noise_model=GaussianNoise(sigma))
    y = physics(x, key=jax.random.key(0))

    den = MedianFilter(kernel_size=3)
    model = lambda yv, p, **kw: den(yv, sigma)
    x_net = model(y, physics)

    sure = SureGaussianLoss(sigma=sigma)(
        x_net=x_net, y=y, physics=physics, model=model, key=jax.random.key(1)
    )
    true_mse = jnp.mean((x_net - x).reshape(x.shape[0], -1) ** 2, axis=1)
    print("SURE estimate:", np.round(np.asarray(sure), 4))
    print("true MSE     :", np.round(np.asarray(true_mse), 4))
    # SURE is an unbiased risk estimate: close to the oracle on average
    assert abs(float(sure.mean() - true_mse.mean())) < 0.01

    # Poisson variant
    gain = 0.1
    pphysics = Denoising(noise_model=PoissonNoise(gain=gain))
    yp = pphysics(x, key=jax.random.key(2))
    sure_p = SurePoissonLoss(gain=gain)(
        x_net=model(yp, pphysics), y=yp, physics=pphysics, model=model,
        key=jax.random.key(3),
    )
    print("Poisson SURE estimate:", float(sure_p.mean()))


if __name__ == "__main__":
    main()
