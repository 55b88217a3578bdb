"""Classic (training-free) denoisers head-to-head, including the pure-JAX
BM3D (the reference needs an external pip package for it).

Run: python examples/demo_classic_denoisers.py
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

from deepinv_tpu.models import BM3D, TVDenoiser, WaveletDenoiser, MedianFilter
from deepinv_tpu.datasets import shepp_logan
from deepinv_tpu.loss.metric import PSNR

x = jnp.asarray(shepp_logan(96))[None, None]
sigma = 25 / 255
y = x + sigma * jax.random.normal(jax.random.key(0), x.shape)
psnr = PSNR()

print(f"noisy             {float(psnr(y, x)[0]):5.2f} dB")
for name, den, ths in [
    ("median 3x3", MedianFilter(3), None),
    ("wavelet db4", WaveletDenoiser(wv="db4", level=3), sigma),
    ("TV (pallas on TPU)", TVDenoiser(100), 0.12),
    ("BM3D", BM3D(search_radius=8, ref_stride=3), sigma),
]:
    out = den(y) if ths is None else den(y, ths)
    print(f"{name:18s}{float(psnr(out, x)[0]):5.2f} dB")
