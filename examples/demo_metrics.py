"""Metrics tour (reference examples/metrics/): full-reference distortion
metrics, perceptual metrics, no-reference metrics, and the Metric
preprocessing pipeline (complex inputs, normalization, train_loss).

Run: python examples/demo_metrics.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import _util

_util.setup()  # CPU by default; DEEPINV_TPU_DEMO_PLATFORM overrides

import numpy as np
import jax
import jax.numpy as jnp

from deepinv_tpu.loss.metric import (
    MSE, NMSE, MAE, PSNR, SNR, SSIM, LpNorm, SpectralAngleMapper, ERGAS,
)
from deepinv_tpu.loss.perceptual import (
    GMSD, HaarPSI, CosineSimilarity, BlurStrength, SharpnessIndex, LPIPS,
)
from deepinv_tpu.datasets import shepp_logan

x = jnp.asarray(shepp_logan(64))[None, None]
x3 = jnp.repeat(x, 3, axis=1)
noisy = x3 + 0.1 * jax.random.normal(jax.random.key(0), x3.shape)

print("== full-reference distortion ==")
for m in (MSE(), NMSE(), MAE(), PSNR(), SNR(), SSIM(), LpNorm(p=2)):
    print(f"{type(m).__name__:22s} {float(m(noisy, x3)[0]):.4f}")

print("\n== multispectral ==")
for m in (SpectralAngleMapper(), ERGAS(factor=4)):
    print(f"{type(m).__name__:22s} {float(m(noisy, x3)[0]):.4f}")

print("\n== perceptual (higher HaarPSI/Cosine = better; lower GMSD = better) ==")
noisy01 = jnp.clip(noisy, 0.0, 1.0)  # HaarPSI requires [0, 1] inputs
for m in (GMSD(), HaarPSI(), CosineSimilarity()):
    print(f"{type(m).__name__:22s} {float(m(noisy01, x3)[0]):.4f}")

# LPIPS pipeline (pass vgg_pretrained=<torchvision vgg16 .pth> for the
# calibrated published metric; random features still rank corruption)
lp = LPIPS(allow_random_weights=True)
mild = x3 + 0.02 * jax.random.normal(jax.random.key(1), x3.shape)
print(f"{'LPIPS':22s} mild {float(lp(mild, x3)[0]):.5f}  "
      f"heavy {float(lp(noisy, x3)[0]):.5f}")

print("\n== no-reference ==")
for m in (BlurStrength(), SharpnessIndex()):
    print(f"{type(m).__name__:22s} {float(m(x3)[0]):.4f}")

print("\n== pipeline features ==")
# complex data: magnitude-based PSNR for MRI-style 2-channel images
z = jnp.concatenate([x, jnp.zeros_like(x)], axis=1)
print("PSNR(complex_abs)     ", float(PSNR(complex_abs=True)(z, z)[0]))
# metrics as training losses: higher-better metrics invert automatically
print("SSIM(train_loss)      ", float(SSIM(train_loss=True)(noisy, x3)[0]))
print("batch reduction (mean)", float(PSNR(reduction="mean")(noisy, x3)))
