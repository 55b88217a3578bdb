"""Tour of denoisers (counterpart of reference
examples/models/demo_denoiser_tour.py).

Every denoiser shares one signature — ``x_hat = denoiser(y, sigma)`` — so
they are interchangeable inside PnP, RED, diffusion sampling, and
unfolded networks. We run the classic (training-free) zoo on the same
noisy image; pretrained deep denoisers (DRUNet/SCUNet/Restormer/SwinIR)
use the identical call with locally supplied weights (see
tests/test_weight_porting.py for the bit-faithful ports).
"""

# make the repo root importable when run as `python examples/<demo>.py`
import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import _util

_util.setup()  # CPU by default; DEEPINV_TPU_DEMO_PLATFORM overrides

import jax
import jax.numpy as jnp
import numpy as np

from deepinv_tpu.models import (
    BM3D, MedianFilter, BilateralFilter, TVDenoiser, TGVDenoiser,
    WaveletDenoiser, WaveletDictDenoiser, EPLLDenoiser,
)
from deepinv_tpu.optim import GaussianMixtureModel
from deepinv_tpu.optim.patch_prior import patch_extractor
from deepinv_tpu.loss import PSNR
from deepinv_tpu.datasets import random_circles


def fitted_epll(patch=6, components=8):
    """EPLL needs a patch GMM; fit one on clean synthetic images (the
    reference downloads a pretrained GMM instead)."""
    imgs = jnp.asarray(np.stack([random_circles(64, seed=50 + i)
                                 for i in range(10)]))
    patches, _ = patch_extractor(imgs, patch)
    gmm = GaussianMixtureModel(components, patch * patch, seed=1).fit(
        patches.reshape(-1, patch * patch)[:6000], max_iters=40)
    return EPLLDenoiser(gmm=gmm, patch_size=patch)


def main():
    x = jnp.asarray(random_circles(64, seed=7))[None]
    sigma = 25 / 255
    noisy = x + sigma * jax.random.normal(jax.random.key(0), x.shape)
    psnr = PSNR()

    denoisers = [
        ("MedianFilter", MedianFilter(kernel_size=3)),
        ("BilateralFilter", BilateralFilter(sigma_space=2.0, sigma_color=0.2)),
        ("TV", TVDenoiser()),
        ("TGV", TGVDenoiser()),
        ("Wavelet (db8)", WaveletDenoiser("db8", level=3)),
        ("WaveletDict", WaveletDictDenoiser(("db2", "db4", "db8"), level=3)),
        ("BM3D", BM3D()),
        ("EPLL (fitted GMM)", fitted_epll()),
    ]

    print(f"noisy input: {float(psnr(noisy, x)[0]):.2f} dB (sigma=25/255)\n")
    print(f"{'denoiser':>16s}  {'PSNR':>6s}  {'time':>7s}")
    for name, den in denoisers:
        t0 = time.perf_counter()
        out = den(noisy, sigma)
        out.block_until_ready()
        dt = time.perf_counter() - t0
        print(f"{name:>16s}  {float(psnr(out, x)[0]):6.2f}  {dt:6.2f}s")

    print("\nsame call for deep denoisers: DRUNet(pretrained='drunet.pth')"
          "(noisy, sigma) etc. — weight-ported bit-for-bit.")


if __name__ == "__main__":
    main()
