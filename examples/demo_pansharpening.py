"""Pansharpening: fuse a low-res multispectral image with a panchromatic
channel (counterpart of reference examples/remote-sensing/demo_pansharpen.py).

The stacked operator returns a TensorList measurement; reconstruction uses
the Brovey baseline and a variational TV solution.
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

from deepinv_tpu.physics import Pansharpen
from deepinv_tpu.optim import optim_builder, L2, PnP
from deepinv_tpu.models import TVDenoiser
from deepinv_tpu.datasets import shepp_logan
from deepinv_tpu.loss import PSNR


def main(size=64, factor=4):
    # synthetic 3-band scene
    base = np.asarray(shepp_logan(size))
    x = jnp.asarray(np.stack([base, np.roll(base, 3, 0), np.roll(base, -3, 1)]))[None]
    physics = Pansharpen((3, size, size), factor=factor)
    y = physics.A(x)  # TensorList: [low-res MS, panchromatic]

    brovey = jax.jit(lambda p, yy: p.brovey(yy))(physics, y)

    model = optim_builder(
        "PGD", data_fidelity=L2(),
        prior=PnP(lambda u, s: TVDenoiser(15)(u, 0.001)),
        params_algo={"stepsize": 0.9, "g_param": 0.05}, max_iter=30,
        custom_init=lambda yv, p: p.brovey(yv),
    )
    xhat = jax.jit(lambda m, yv, p: m(yv, p))(model, y, physics)

    psnr = jax.jit(lambda a, b: jnp.mean(PSNR()(a, b)))
    print(f"Brovey baseline: {float(np.asarray(psnr(brovey, x))):.2f} dB -> "
          f"PnP-TV: {float(np.asarray(psnr(xhat, x))):.2f} dB")


if __name__ == "__main__":
    main()
