"""Blind denoising: estimate the noise level, then denoise.

Mirrors the reference gallery's blind-inverse-problems
``demo_blind_denoising.py``: when the noise standard deviation is unknown,
estimate it from the measurement itself — here with both
:class:`WaveletNoiseEstimator` (median absolute deviation of the finest
diagonal wavelet details) and :class:`PatchCovarianceNoiseEstimator`
(smallest eigenvalue of flat-patch covariances) — and feed the estimate to
a sigma-conditioned denoiser.
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
from deepinv_tpu.models import (
    WaveletNoiseEstimator,
    PatchCovarianceNoiseEstimator,
    WaveletDenoiser,
)
from deepinv_tpu.loss import PSNR


def main():
    key = jax.random.key(0)
    x = jnp.asarray(np.stack([random_circles(64, seed=s) for s in (1, 2)]))
    sigma_true = 0.12
    y = x + sigma_true * jax.random.normal(key, x.shape)

    for name, estimator in [
        ("wavelet-MAD", WaveletNoiseEstimator()),
        ("patch-covariance", PatchCovarianceNoiseEstimator()),
    ]:
        sigma_hat = estimator(y)
        rel = float(jnp.max(jnp.abs(sigma_hat - sigma_true))) / sigma_true
        print(f"{name:18s} sigma_hat = {np.asarray(sigma_hat).round(4)} "
              f"(true {sigma_true}, rel err {rel:.1%})")
        assert rel < 0.35, f"{name} estimate too far off"

    # blind pipeline: estimated sigma drives the denoiser strength
    sigma_hat = WaveletNoiseEstimator()(y)
    denoiser = WaveletDenoiser(level=3)
    xhat = denoiser(y, 3.0 * jnp.mean(sigma_hat))

    psnr = PSNR(max_pixel=1.0)
    p_in = float(jnp.mean(psnr(y, x)))
    p_out = float(jnp.mean(psnr(xhat, x)))
    print(f"PSNR: noisy {p_in:.2f} dB -> blind-denoised {p_out:.2f} dB")
    assert p_out > p_in + 2.0, "blind denoising should clearly improve PSNR"
    print("blind denoising OK")


if __name__ == "__main__":
    main()
