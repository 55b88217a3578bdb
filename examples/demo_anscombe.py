"""Anscombe transform: Poisson denoising with a Gaussian denoiser.

Mirrors the reference gallery's ``physics/demo_anscombe.py``
(reference models/anscombe.py:48-194): the generalized Anscombe transform
(GAT) variance-stabilizes Poisson(-Gaussian) noise so any Gaussian denoiser
applies; ``AnscombeDenoiser`` wraps the forward GAT, the wrapped denoiser,
and the unbiased inverse in one module.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import _util

_util.setup()  # CPU by default; DEEPINV_TPU_DEMO_PLATFORM overrides

import jax
import jax.numpy as jnp
import numpy as np

from deepinv_tpu.datasets import random_circles
from deepinv_tpu.loss.metric import PSNR
from deepinv_tpu.models import (
    AnscombeDenoiser,
    TVDenoiser,
    generalized_anscombe_transform,
    inverse_generalized_anscombe_transform,
)
from deepinv_tpu.physics import Denoising, PoissonNoise


def main():
    H = W = 64
    x = jnp.asarray(random_circles(H, seed=11))[None, None] * 0.9 + 0.05
    gain = 1 / 40.0  # ~40 photons at peak
    physics = Denoising(noise_model=PoissonNoise(gain=gain, normalize=True))
    y = physics(x, key=jax.random.key(0))
    psnr = PSNR()
    print(f"noisy input PSNR: {float(psnr(y, x)[0]):.2f} dB")

    # GAT stabilizes the variance: after transform, noise std ~= 1
    z = generalized_anscombe_transform(y, gain=gain)
    zc = generalized_anscombe_transform(x, gain=gain)
    resid = z - zc
    print(f"stabilized residual std: {float(resid.std()):.3f} (target ~1)")
    assert 0.7 < float(resid.std()) < 1.3

    # round trip of the exact unbiased inverse
    back = inverse_generalized_anscombe_transform(zc, gain=gain)
    assert float(jnp.abs(back - x).max()) < 1e-2

    # AnscombeDenoiser: gaussian denoiser inside the GAT domain
    # the GAT domain has ~unit noise std; TV threshold tuned accordingly
    den = AnscombeDenoiser(TVDenoiser(n_it_max=100), gain=gain)
    x_hat = den(y, 0.9)
    out = float(psnr(x_hat, x)[0])
    print(f"Anscombe+TV output PSNR: {out:.2f} dB")
    assert out > float(psnr(y, x)[0]) + 3.0, "denoiser should gain >3 dB"

    print("anscombe demo OK")


if __name__ == "__main__":
    main()
