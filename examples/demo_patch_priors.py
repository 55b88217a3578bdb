"""Patch priors: EPLL (GMM) denoising and restoration
(counterpart of reference examples/patch-priors/demo_epll.py and
demo_patch_priors_CT.py)."""

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

from deepinv_tpu.optim import EPLL, GaussianMixtureModel
from deepinv_tpu.optim.patch_prior import patch_extractor
from deepinv_tpu.datasets import random_circles
from deepinv_tpu.loss import PSNR


def main(size=64, patch=6, components=8, sigma=0.1):
    # "training set": clean synthetic images -> patch GMM by jitted EM
    imgs = jnp.asarray(np.stack([random_circles(size, seed=i) for i in range(12)]))
    patches, _ = patch_extractor(imgs, patch)
    flat = patches.reshape(-1, patch * patch)
    gmm = GaussianMixtureModel(components, patch * patch, seed=1).fit(
        flat[:6000], max_iters=40
    )
    epll = EPLL(gmm=gmm, patch_size=patch)

    x = jnp.asarray(random_circles(size, seed=100))[None]  # (1, 1, H, W)
    y = x + sigma * jax.random.normal(jax.random.key(0), x.shape)
    xhat = jax.jit(lambda e, v: e.denoise(v, sigma))(epll, y)

    psnr = jax.jit(lambda a, b: jnp.mean(PSNR()(a, b)))
    print(f"EPLL denoising: noisy {float(np.asarray(psnr(y, x))):.2f} dB -> "
          f"{float(np.asarray(psnr(xhat, x))):.2f} dB")


if __name__ == "__main__":
    main()
