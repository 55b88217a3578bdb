"""CT: FBP + unfolded PGD (counterpart of reference CT examples)."""

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

from deepinv_tpu.physics import Tomography, LogPoissonNoise
from deepinv_tpu.unfolded import unfolded_builder
from deepinv_tpu.optim import L2, PnP
from deepinv_tpu.models import DnCNN, TVDenoiser
from deepinv_tpu.loss import PSNR
from deepinv_tpu.datasets import shepp_logan


def main(size=64, angles=60):
    x = jnp.asarray(shepp_logan(size))[None, None]
    physics = Tomography(angles=angles, img_width=size, normalize=True,
                         method="fourier")
    y = jax.jit(physics.A)(x)
    fbp = jax.jit(physics.A_dagger)(y)
    psnr = jax.jit(lambda a, b: jnp.mean(PSNR()(a, b)))
    print(f"FBP PSNR: {float(np.asarray(psnr(fbp, x))):.2f} dB")

    # unfolded PGD; swap the TV prox for a trainable DnCNN prior
    # (PnP(DnCNN(...))) and train with Trainer for the learned variant
    model = unfolded_builder(
        "PGD",
        data_fidelity=L2(),
        prior=PnP(lambda u, s: TVDenoiser(30)(u, 0.003)),
        params_algo={"stepsize": 0.9, "g_param": 0.05},
        max_iter=20,
        custom_init=lambda yv, p: p.A_dagger(yv),
    )
    xhat = jax.jit(lambda m, yv, p: m(yv, p))(model, y, physics)
    print(f"unfolded PGD-TV PSNR: {float(np.asarray(psnr(xhat, x))):.2f} dB")


if __name__ == "__main__":
    main()
