"""PnP-HQS (DPIR) deblurring — the flagship benchmark flow
(counterpart of reference examples/plug-and-play/demo_PnP_DPIR_deblur.py).

Runs on CPU or TPU; uses a random-weight DRUNet unless a ported checkpoint
path is given.
"""

# make the repo root importable when run as `python examples/<demo>.py`
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import _util

_util.setup()  # CPU by default; DEEPINV_TPU_DEMO_PLATFORM overrides

import time

import jax
import jax.numpy as jnp
import numpy as np

import deepinv_tpu as dinv
from deepinv_tpu.physics import BlurFFT, GaussianNoise
from deepinv_tpu.ops import gaussian_blur
from deepinv_tpu.optim import DPIR
from deepinv_tpu.models import DRUNet, TVDenoiser
from deepinv_tpu.loss import PSNR
from deepinv_tpu.datasets import shepp_logan
from deepinv_tpu.utils import plot


def main(pretrained=None, size=256, sigma_noise=0.03):
    x = jnp.asarray(shepp_logan(size))[None, None].repeat(3, 1)
    physics = BlurFFT(
        img_size=(3, size, size),
        filter=gaussian_blur(sigma=2.0),
        noise_model=GaussianNoise(sigma_noise),
    )
    # measure under jit (eager FFT is unsupported on some TPU runtimes)
    y = jax.jit(lambda p, xv, k: p(xv, key=k))(physics, x, jax.random.key(0))

    if pretrained:
        denoiser = DRUNet(pretrained=pretrained)
    else:
        # classical fallback so the demo is meaningful without weights
        denoiser = lambda u, s: TVDenoiser(30)(u, 0.1 * s)
    model = DPIR(sigma=sigma_noise, denoiser=denoiser)

    recon = jax.jit(lambda m, yv, p: m(yv, p))
    t0 = time.perf_counter()
    xhat = recon(model, y, physics)
    xhat.block_until_ready()
    print(f"compile+run: {time.perf_counter() - t0:.1f}s")

    psnr = jax.jit(lambda a, b: jnp.mean(PSNR()(a, b)))
    print(f"PSNR y: {float(np.asarray(psnr(y, x))):.2f} dB -> "
          f"xhat: {float(np.asarray(psnr(xhat, x))):.2f} dB")
    plot([x, y, xhat], titles=["x", "y", "DPIR"], save_fn="dpir_deblur.png")


if __name__ == "__main__":
    main()
