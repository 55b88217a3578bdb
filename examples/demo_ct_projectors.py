"""Compare the three tomography projectors and run PnP CT reconstruction.

- 'interp'  : bilinear grid-sampling (bit-comparable to the reference)
- 'fourier' : FFT three-shear rotation (exact sinc interpolation)
- 'slice'   : Fourier-slice NUFFT — one 2D FFT for ALL angles, scatter-free
              adjoint; the fastest on TPU by ~24x (see bench.py ct)

Run: python examples/demo_ct_projectors.py
"""

# make the repo root importable when run as `python examples/<demo>.py`
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import _util

_util.setup()  # CPU by default; DEEPINV_TPU_DEMO_PLATFORM overrides

import numpy as np
import jax
import jax.numpy as jnp

from deepinv_tpu.physics import Tomography, GaussianNoise
from deepinv_tpu.optim import optim_builder, L2, PnP
from deepinv_tpu.models import DnCNN
from deepinv_tpu.datasets import shepp_logan
from deepinv_tpu.loss.metric import PSNR

x = jnp.asarray(shepp_logan(128))[None, None]
psnr = PSNR()

for method in ("interp", "fourier", "slice"):
    # normalize=True scales the sinogram by 1/W, so the noise level is
    # specified relative to that scale
    physics = Tomography(img_width=128, angles=60, method=method,
                         normalize=True, noise_model=GaussianNoise(0.002))
    y = jax.jit(lambda p, v, k: p(v, key=k))(physics, x, jax.random.key(0))
    fbp = jax.jit(lambda p, v: p.A_dagger(v))(physics, y)

    # TV prior (swap in pretrained DnCNN/DRUNet weights for learned PnP)
    from deepinv_tpu.optim import TVPrior

    model = optim_builder(
        "PGD", data_fidelity=L2(), prior=TVPrior(),
        params_algo={"stepsize": 1.0, "lambda": 5e-4}, max_iter=30,
        custom_init=lambda yv, p: p.A_dagger(yv),  # FBP warm start
    )
    rec = jax.jit(lambda m, v, p: m(v, p))(model, y, physics)
    print(f"{method:8s}  FBP {float(psnr(fbp, x)[0]):5.2f} dB   "
          f"TV-PGD {float(psnr(rec, x)[0]):5.2f} dB")
