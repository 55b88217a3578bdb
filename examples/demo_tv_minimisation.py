"""Total-variation minimisation with proximal algorithms — counterpart of
reference examples/optimization/demo_TV_minimisation.py. Compares PGD,
ADMM and Chambolle-Pock on the same deblurring problem."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import _util

_util.setup()  # CPU by default; DEEPINV_TPU_DEMO_PLATFORM overrides

import jax
import jax.numpy as jnp

from deepinv_tpu.physics import BlurFFT, GaussianNoise
from deepinv_tpu.ops import gaussian_blur
from deepinv_tpu.optim import optim_builder, L2, TVPrior
from deepinv_tpu.loss.metric import PSNR
from deepinv_tpu.datasets import random_circles


def main():
    x = jnp.asarray(random_circles(64, seed=0))[None]
    physics = BlurFFT(img_size=(1, 64, 64), filter=gaussian_blur(sigma=2.0),
                      noise_model=GaussianNoise(0.02))
    y = physics(x, key=jax.random.key(0))
    psnr = PSNR()
    print(f"measurement PSNR: {float(psnr(y, x)[0]):.2f} dB")

    for algo, params in [
        ("PGD", {"stepsize": 1.0, "lambda": 0.05}),
        ("ADMM", {"stepsize": 0.5, "lambda": 0.05}),
        ("CP", {"stepsize": 0.5, "sigma": 1.0, "lambda": 0.05}),
    ]:
        model = optim_builder(algo, data_fidelity=L2(),
                              prior=TVPrior(n_it_max=20),
                              params_algo=params, max_iter=30)
        xhat = jax.jit(lambda m, yv, p: m(yv, p))(model, y, physics)
        v = float(psnr(xhat, x)[0])
        print(f"{algo}: PSNR {v:.2f} dB")
        assert v > float(psnr(y, x)[0]) - 0.5


if __name__ == "__main__":
    main()
