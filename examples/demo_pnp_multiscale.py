"""Coarse-to-fine plug-and-play with multiscale physics wrappers
(counterpart of reference examples/plug-and-play/demo_PnP_multiscale.py).

``LinearPhysicsMultiScaler`` lets the same measurement operator be evaluated
from coarse-scale images: ``A_s = A U_s`` with ``U_s`` a sinc upsampler.
Running the first PnP iterations at a coarse scale is cheap (the denoiser
sees a 4x smaller image) and the upsampled coarse solution warm-starts the
fine-scale solve, cutting the total number of expensive fine iterations.
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

from deepinv_tpu.physics import Inpainting, GaussianNoise, LinearPhysicsMultiScaler
from deepinv_tpu.optim import optim_builder, L2, PnP
from deepinv_tpu.models import WaveletDenoiser
from deepinv_tpu.loss import PSNR
from deepinv_tpu.datasets import random_circles


def main():
    x = jnp.asarray(random_circles(64, seed=5))[None]
    base = Inpainting(img_size=(1, 64, 64), mask=0.3, key=jax.random.key(0),
                      noise_model=GaussianNoise(0.02))
    y = base(x, key=jax.random.key(1))
    psnr = PSNR()

    ms = LinearPhysicsMultiScaler(base, img_size=(1, 64, 64), factors=(2, 4, 8))
    den = WaveletDenoiser("db4", 2)
    prior = PnP(den)

    def pnp(physics_s, y_s, x_init, iters):
        model = optim_builder(
            "PGD", data_fidelity=L2(), prior=prior,
            params_algo={"stepsize": 1.0, "g_param": 0.05}, max_iter=iters,
        )
        return model(y_s, physics_s, x_init=x_init)

    # ------------------------------------------------------------------
    # single-scale baseline: all iterations at the fine scale
    # ------------------------------------------------------------------
    x_fine = pnp(base, y, None, 40)
    print(f"single-scale PnP (40 fine its): {float(psnr(x_fine, x)[0]):.2f} dB")

    # ------------------------------------------------------------------
    # coarse-to-fine: 30 iterations at scale 1 (32x32 images through the
    # denoiser), upsample, then only 10 fine-scale iterations
    # ------------------------------------------------------------------
    p1 = ms.with_scale(1)
    x1 = pnp(p1, y, None, 30)             # coarse solve, 2x downsampled grid
    x0_init = ms.upsample(x1, scale=1)    # sinc-upsample to the fine grid
    x_c2f = pnp(base, y, x0_init, 10)
    print(f"coarse-to-fine PnP (30 coarse + 10 fine): "
          f"{float(psnr(x_c2f, x)[0]):.2f} dB")
    print(f"coarse iterate upsampled (no fine its): "
          f"{float(psnr(x0_init, x)[0]):.2f} dB")


if __name__ == "__main__":
    main()
