"""Fitting NIQE on a custom dataset (counterpart of reference
examples/metrics/demo_custom_niqe.py).

NIQE is a no-reference metric: it scores an image by the distance between
the multivariate Gaussian fitted to its local NSS (AGGD) features and a
pristine MVG model. The pristine model is just (mu, cov) over patch
features — so it can be *re-fitted on any domain-specific distortion-free
dataset*, no downloads required. Here we fit on synthetic smooth "natural"
images and check the fitted metric ranks degradations correctly.
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

from deepinv_tpu.loss import NIQE, PSNR
from deepinv_tpu.models import MedianFilter
from deepinv_tpu.ops import gaussian_blur
from deepinv_tpu.ops.conv import conv2d


def natural_image(seed, size=96):
    """Low-pass filtered noise, normalized to [0, 1] — a stand-in for a
    pristine photographic dataset (use your own images in practice)."""
    r = np.random.default_rng(seed)
    f = np.fft.fft2(r.normal(size=(size, size)))
    k = np.hypot(np.fft.fftfreq(size)[:, None], np.fft.fftfreq(size)[None])
    img = np.real(np.fft.ifft2(f * np.exp(-(k**2) / (2 * 0.06**2))))
    img = (img - img.min()) / (img.max() - img.min() + 1e-9)
    return img.astype(np.float32)[None]  # (1, H, W)


def main():
    # ------------------------------------------------------------------
    # Fit the pristine model: 8 distortion-free images, 16px patches
    # (96px in the original; smaller here so small demo images work)
    # ------------------------------------------------------------------
    pristine = [natural_image(100 + i) for i in range(8)]
    niqe = NIQE(patch_size=16, patch_overlap=8, denominator=1 / 255.0)
    params = niqe.create_weights(pristine, sharpness_threshold=0.5)
    print(f"fitted pristine MVG: mu {params['mu'].shape}, "
          f"cov {params['cov'].shape}")

    # weights round-trip through a local file like the reference's
    # save_path= (no download involved)
    niqe.create_weights(pristine, sharpness_threshold=0.5,
                        save_path="/tmp/niqe_custom.npz")
    niqe = NIQE(weights_path="/tmp/niqe_custom.npz",
                patch_size=16, patch_overlap=8, denominator=1 / 255.0)

    # ------------------------------------------------------------------
    # Score degradations of a held-out image: the fitted NIQE should give
    # the clean image the lowest (best) score
    # ------------------------------------------------------------------
    x = jnp.asarray(natural_image(7))[None]
    key = jax.random.key(0)
    noisy = jnp.clip(x + 0.10 * jax.random.normal(key, x.shape), 0, 1)
    blurry = conv2d(x, gaussian_blur(sigma=2.0), padding="replicate")
    denoised = MedianFilter(kernel_size=3)(noisy, None)

    psnr = PSNR()
    print(f"{'image':>10s}  {'NIQE':>7s}  {'PSNR':>6s}")
    for name, im in [("clean", x), ("noisy", noisy),
                     ("blurry", blurry), ("denoised", denoised)]:
        print(f"{name:>10s}  {float(niqe(im)[0]):7.2f} "
              f" {float(psnr(im, x)[0]):6.2f}")

    s_clean, s_noisy = float(niqe(x)[0]), float(niqe(noisy)[0])
    assert s_clean < s_noisy, "fitted NIQE should prefer the clean image"
    print("fitted NIQE ranks the clean image best — OK")


if __name__ == "__main__":
    main()
