"""First steps (reference examples/basics/): define a physics, measure,
reconstruct three ways — pseudo-inverse, variational (TV), and PnP — and
score with the metrics.

Run: python examples/demo_basics.py
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

from deepinv_tpu.physics import Inpainting, GaussianNoise
from deepinv_tpu.optim import optim_builder, L2, TVPrior, PnP
from deepinv_tpu.models import TVDenoiser
from deepinv_tpu.loss.metric import PSNR, SSIM
from deepinv_tpu.datasets import shepp_logan

# 1. ground truth + forward operator ------------------------------------
x = jnp.asarray(shepp_logan(64))[None, None]
physics = Inpainting(img_size=(1, 64, 64), mask=0.5, key=jax.random.key(0),
                     noise_model=GaussianNoise(0.05))

# 2. measure (randomness is explicit: pass a key) -----------------------
y = physics(x, key=jax.random.key(1))

psnr, ssim = PSNR(), SSIM()
print(f"measurement      PSNR {float(psnr(y, x)[0]):5.2f}  "
      f"SSIM {float(ssim(y, x)[0]):.3f}")

# 3a. linear pseudo-inverse --------------------------------------------
x_dag = physics.A_dagger(y)
print(f"pseudo-inverse   PSNR {float(psnr(x_dag, x)[0]):5.2f}")

# 3b. variational: TV-regularized proximal gradient ---------------------
tv = optim_builder("PGD", data_fidelity=L2(), prior=TVPrior(),
                   params_algo={"stepsize": 1.0, "lambda": 0.02},
                   max_iter=50)
x_tv = jax.jit(lambda m, yv, p: m(yv, p))(tv, y, physics)
print(f"TV-PGD           PSNR {float(psnr(x_tv, x)[0]):5.2f}")

# 3c. plug-and-play: any denoiser as the prior (swap in DRUNet weights
#     for learned PnP) --------------------------------------------------
pnp = optim_builder("HQS", data_fidelity=L2(), prior=PnP(TVDenoiser(50)),
                    params_algo={"stepsize": 1.0, "g_param": 0.03},
                    max_iter=10)
x_pnp = jax.jit(lambda m, yv, p: m(yv, p))(pnp, y, physics)
print(f"PnP-HQS          PSNR {float(psnr(x_pnp, x)[0]):5.2f}")
