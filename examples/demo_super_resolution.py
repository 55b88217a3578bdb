"""Super-resolution tour (counterpart of reference
examples/models/demo_super_resolution.py).

``Downsampling`` = anti-aliasing filter + decimation. Because decimation
is polyphase-diagonal in Fourier space, the operator has a CLOSED-FORM
prox/pseudo-inverse (the reference's FFT polyphase trick, blur.py:15) —
so data-consistency steps cost two FFTs regardless of the filter. We
compare filters and reconstruction strategies at 4x magnification.
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

from deepinv_tpu.physics import Downsampling, GaussianNoise
from deepinv_tpu.ops import gaussian_blur
from deepinv_tpu.ops.conv import bicubic_filter
from deepinv_tpu.optim import optim_builder, L2, PnP
from deepinv_tpu.models import MedianFilter
from deepinv_tpu.loss import PSNR
from deepinv_tpu.datasets import random_circles


def main():
    x = jnp.asarray(random_circles(64, seed=2))[None]
    psnr = PSNR()
    factor = 4

    # ------------------------------------------------------------------
    # anti-aliasing filters: the filter choice changes the spectrum the
    # measurements keep, and the closed-form prox handles any of them
    # ------------------------------------------------------------------
    print(f"{'filter':>10s}  {'A_adjoint':>9s}  {'A_dagger':>8s}")
    for name, filt in [("gaussian", gaussian_blur(sigma=1.5)),
                       ("bicubic", bicubic_filter(factor)),
                       ("none", None)]:
        p = Downsampling(img_size=(1, 64, 64), factor=factor, filter=filt)
        y = p.A(x)
        # rescaled adjoint (plain zero-fill when there is no filter)
        up_adj = p.A_adjoint(y) * (factor**2 if filt is not None else 1)
        up_dag = p.A_dagger(y)               # closed-form pseudo-inverse
        print(f"{name:>10s}  {float(psnr(up_adj, x)[0]):8.2f}  "
              f"{float(psnr(up_dag, x)[0]):8.2f}")

    # ------------------------------------------------------------------
    # noisy SR: PnP-HQS where the f-step is the closed-form prox (exact,
    # two FFTs) — no inner solver needed
    # ------------------------------------------------------------------
    physics = Downsampling(img_size=(1, 64, 64), factor=factor,
                           filter=gaussian_blur(sigma=1.5),
                           noise_model=GaussianNoise(0.02))
    y = physics(x, key=jax.random.key(0))
    model = optim_builder(
        "HQS", data_fidelity=L2(), prior=PnP(MedianFilter(kernel_size=3)),
        params_algo={"stepsize": 4.0, "g_param": 0.05}, max_iter=20,
    )
    xhat = jax.jit(lambda m, yv, p: m(yv, p))(model, y, physics)
    print(f"\n4x SR, noise 0.02: dagger {float(psnr(physics.A_dagger(y), x)[0]):.2f} dB"
          f" -> PnP-HQS {float(psnr(xhat, x)[0]):.2f} dB")


if __name__ == "__main__":
    main()
