"""3D wavelet denoising of a volume (counterpart of reference
examples/optimization/demo_3D_denoising.py).

Volumetric data (CT/MRI/microscopy stacks) carries structure along the
depth axis too: a full 3D wavelet transform (``wvdim=3``, 7 detail bands
per level) exploits it, while slice-by-slice 2D denoising ignores it.
Both run as single XLA programs; the 3D synthesis is the exact transpose
of the orthonormal analysis (``jax.linear_transpose``), so perfect
reconstruction is structural, not numerical.
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
import numpy as np

from deepinv_tpu.models import WaveletDenoiser, WaveletDictDenoiser
from deepinv_tpu.loss import PSNR


def phantom_volume(D=16, H=64, W=64):
    """Smooth ellipsoidal blobs — a stand-in for a CT/microscopy volume."""
    z, y, x = np.mgrid[0:D, 0:H, 0:W].astype(np.float32)
    v = np.zeros((D, H, W), np.float32)
    for (cz, cy, cx, rz, ry, rx, a) in [
        (8, 32, 32, 6, 22, 22, 1.0), (8, 24, 40, 3, 8, 6, -0.4),
        (10, 44, 24, 4, 7, 9, -0.6), (5, 30, 30, 2, 5, 5, 0.5),
    ]:
        m = ((z - cz) / rz) ** 2 + ((y - cy) / ry) ** 2 + ((x - cx) / rx) ** 2
        v += a * (m < 1)
    return np.clip(v, 0, 1)


def main():
    x = jnp.asarray(phantom_volume())[None, None]  # (1, 1, D, H, W)
    sigma = 0.3  # heavier noise: the cross-slice redundancy pays off
    noisy = x + sigma * jax.random.normal(jax.random.key(0), x.shape)
    psnr = PSNR()

    # slice-by-slice 2D wavelets: fold depth into the batch axis
    den2d = WaveletDenoiser("db4", level=2, wvdim=2)
    B, C, D, H, W = noisy.shape
    x2d = den2d(noisy.reshape(B * D, C, H, W), sigma).reshape(noisy.shape)

    # full 3D wavelets (7 detail bands/level over D, H, W)
    den3d = WaveletDenoiser("db4", level=2, wvdim=3)
    x3d = den3d(noisy, sigma)

    # dictionary of 3D wavelets (db2/db4/db8 average)
    dict3d = WaveletDictDenoiser(("db2", "db4", "db8"), level=2, wvdim=3)
    xdict = dict3d(noisy, sigma)

    print(f"noisy volume        PSNR: {float(psnr(noisy, x)[0]):6.2f} dB")
    print(f"2D per-slice db4    PSNR: {float(psnr(x2d, x)[0]):6.2f} dB")
    print(f"3D db4 (wvdim=3)    PSNR: {float(psnr(x3d, x)[0]):6.2f} dB")
    print(f"3D wavelet dict     PSNR: {float(psnr(xdict, x)[0]):6.2f} dB")


if __name__ == "__main__":
    main()
