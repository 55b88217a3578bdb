"""Sparse wavelet priors for inpainting (counterpart of reference
examples/optimization/demo_wavelet_prior.py).

Solves min_x 0.5 ||Ax - y||^2 + lam * ||Wx||_1 with PGD, where W is an
orthogonal wavelet transform — the g-step is soft-thresholding in the
wavelet domain (``WaveletPrior.prox``). A redundant dictionary of several
wavelet families reduces blocking artifacts.
"""

# make the repo root importable when run as `python examples/<demo>.py`
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import _util

_util.setup()  # CPU by default; DEEPINV_TPU_DEMO_PLATFORM overrides

import jax
import jax.numpy as jnp

from deepinv_tpu.physics import Inpainting, GaussianNoise
from deepinv_tpu.optim import optim_builder, L2, WaveletPrior, TVPrior
from deepinv_tpu.loss import PSNR
from deepinv_tpu.datasets import random_circles


def main():
    x = jnp.asarray(random_circles(64, seed=4))[None]
    physics = Inpainting(img_size=(1, 64, 64), mask=0.4, key=jax.random.key(0),
                         noise_model=GaussianNoise(0.02))
    y = physics(x, key=jax.random.key(1))
    psnr = PSNR()
    print(f"masked-input PSNR: {float(psnr(physics.A_adjoint(y), x)[0]):.2f} dB")

    lam = 0.02
    for name, prior in [
        ("db4 wavelet", WaveletPrior(wv="db4", level=3)),
        ("haar wavelet", WaveletPrior(wv="haar", level=3)),
        ("TV", TVPrior()),
    ]:
        model = optim_builder(
            "PGD", data_fidelity=L2(), prior=prior,
            params_algo={"stepsize": 1.0, "lambda": lam, "g_param": 1.0},
            max_iter=100,
        )
        xhat = model(y, physics)
        print(f"PGD + {name:>12s}: {float(psnr(xhat, x)[0]):.2f} dB")


if __name__ == "__main__":
    main()
