"""Spectral deconvolution of non-circular blur with Liu-Jia padding
(counterpart of reference examples/physics/demo_liu_jia_padding.py).

Real blurry photographs are produced by *valid* convolution — the opposite
image boundaries are unrelated — while spectral deconvolution (inverse /
Wiener filtering) assumes a *circular* blur. Deconvolving the raw crop
therefore rings badly at the boundary. Liu-Jia padding extends the image
with a harmonic (biharmonic-smooth) fill whose boundaries wrap circularly,
making the FFT model consistent before deconvolution.
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

from deepinv_tpu.physics import Blur, GaussianNoise
from deepinv_tpu.physics.functional import liu_jia_pad
from deepinv_tpu.ops import gaussian_blur
from deepinv_tpu.loss import PSNR
from deepinv_tpu.datasets import random_circles


def _psf_otf(filt, shape):
    """Zero-pad the PSF to ``shape`` and center it at the origin (OTF)."""
    kh, kw = filt.shape[-2:]
    H, W = shape
    k = jnp.zeros((H, W), filt.dtype).at[:kh, :kw].set(filt[0, 0])
    k = jnp.roll(k, shift=(-(kh // 2), -(kw // 2)), axis=(0, 1))
    return jnp.fft.fft2(k)


def _wiener(y, otf, balance):
    Y = jnp.fft.fft2(y)
    H = otf[None, None]
    X = jnp.conj(H) * Y / (jnp.abs(H) ** 2 + balance)
    return jnp.real(jnp.fft.ifft2(X))


def main():
    sigma_blur, sigma_noise = 1.0, 1e-3
    ksize = 6 * int(jnp.ceil(sigma_blur)) + 1
    kernel = gaussian_blur(sigma=sigma_blur, psf_size=(ksize, ksize))

    # a scene with decorrelated opposite boundaries: circles + intensity ramp
    x = jnp.asarray(random_circles(128, seed=2))[None]
    ramp = jnp.linspace(0.0, 0.8, 128)[None, None, :, None]
    x = x * 0.5 + ramp

    # realistic observation: valid (cropped) convolution + noise
    physics = Blur(filter=kernel, padding="valid",
                   noise_model=GaussianNoise(sigma_noise))
    y = physics(x, key=jax.random.key(0))
    crop = ksize // 2
    x_in = x[..., crop:-crop, crop:-crop]  # ground truth aligned with y
    psnr = PSNR()
    print(f"valid-blurred observation: {tuple(y.shape)}, "
          f"blurry PSNR {float(psnr(y, x_in)[0]):.2f} dB")

    # ------------------------------------------------------------------
    # Wiener deconvolution, circular model applied directly to the crop:
    # the wrap-around mismatch at the boundary produces ringing
    # ------------------------------------------------------------------
    otf = _psf_otf(kernel, y.shape[-2:])
    x_naive = _wiener(y, otf, balance=10 * sigma_noise)
    print(f"Wiener, no padding      : {float(psnr(x_naive, x_in)[0]):.2f} dB")

    # ------------------------------------------------------------------
    # Liu-Jia pad -> circular-consistent signal -> deconvolve -> crop back
    # ------------------------------------------------------------------
    pad = 2 * ksize
    y_pad = liu_jia_pad(y, padding=(pad, pad))
    otf_p = _psf_otf(kernel, y_pad.shape[-2:])
    x_lj = _wiener(y_pad, otf_p, balance=10 * sigma_noise)[..., pad:-pad, pad:-pad]
    print(f"Wiener, Liu-Jia padding : {float(psnr(x_lj, x_in)[0]):.2f} dB")

    # inverse filtering (balance -> 0) amplifies the mismatch even more
    x_inv_naive = _wiener(y, otf, balance=1e-6)
    x_inv_lj = _wiener(y_pad, otf_p, balance=1e-6)[..., pad:-pad, pad:-pad]
    print(f"inverse filter, no pad  : {float(psnr(x_inv_naive, x_in)[0]):.2f} dB")
    print(f"inverse filter, Liu-Jia : {float(psnr(x_inv_lj, x_in)[0]):.2f} dB")


if __name__ == "__main__":
    main()
