"""Single-pixel camera imaging — Hadamard measurement orderings and
reconstruction (counterpart of reference examples/physics/demo_spc.py).

The single-pixel camera measures inner products of the scene with Hadamard
patterns; with ``m`` patterns out of ``n`` pixels the operator is a row
subset of the (fast) Hadamard transform, so ``A`` and ``A_adjoint`` cost
O(n log n) with no stored matrix. The choice of *which* rows — the
ordering — controls how much low-frequency content is captured.
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

from deepinv_tpu.physics import SinglePixelCamera, GaussianNoise
from deepinv_tpu.optim import optim_builder, L2, PnP
from deepinv_tpu.models import WaveletDenoiser
from deepinv_tpu.loss import PSNR
from deepinv_tpu.datasets import random_circles


def main():
    x = jnp.asarray(random_circles(32, seed=3))[None]
    n = 32 * 32
    m = n // 4  # 4x undersampling
    psnr = PSNR()

    # ------------------------------------------------------------------
    # Orderings: cake-cutting and zigzag select smooth patterns first, so
    # the adjoint alone is already a decent low-pass reconstruction;
    # 'sequency' spreads measurements over all frequencies.
    # ------------------------------------------------------------------
    for ordering in ("cake_cutting", "zig_zag", "xy", "sequency"):
        cam = SinglePixelCamera(m=m, img_size=(1, 32, 32), ordering=ordering)
        y = cam.A(x)
        # DecomposablePhysics: A_dagger is closed-form (mask + inverse WHT)
        x_dag = cam.A_dagger(y)
        print(f"{ordering:>12s}: m={m} adjoint-recon PSNR "
              f"{float(psnr(x_dag, x)[0]):6.2f} dB")

    # ------------------------------------------------------------------
    # PnP reconstruction under noise recovers the missing high frequencies
    # ------------------------------------------------------------------
    cam = SinglePixelCamera(m=m, img_size=(1, 32, 32), ordering="cake_cutting",
                            noise_model=GaussianNoise(0.01))
    y = cam(x, key=jax.random.key(0))
    model = optim_builder(
        "HQS", data_fidelity=L2(),
        prior=PnP(WaveletDenoiser("db4", 3)),
        params_algo={"stepsize": 1.0, "g_param": 0.02}, max_iter=30,
    )
    xhat = model(y, cam)
    print(f"PnP-HQS (wavelet prior) PSNR: {float(psnr(xhat, x)[0]):.2f} dB "
          f"vs dagger {float(psnr(cam.A_dagger(y), x)[0]):.2f} dB")


if __name__ == "__main__":
    main()
