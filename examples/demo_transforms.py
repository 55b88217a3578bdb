"""Group-action transforms and equivariant denoising
(counterpart of reference examples/transforms/)."""

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

from deepinv_tpu.transform import Rotate, Reflect, Shift
from deepinv_tpu.models import EquivariantDenoiser
from deepinv_tpu.datasets import shepp_logan
from deepinv_tpu.loss import PSNR


def main(size=64, sigma=0.1):
    x = jnp.asarray(shepp_logan(size))[None, None]

    # transforms compose (*) and stack (+); every transform exposes
    # params/inverse so it acts as a group element
    t = Rotate(multiples=90) * Reflect()
    tx = t(x, key=jax.random.key(0))
    print("transformed batch:", tx.shape)

    # invert a sampled transform exactly
    shift = Shift()
    params = shift.get_params(x, key=jax.random.key(1))
    assert float(jnp.abs(
        shift.inverse(shift.transform(x, **params), **params) - x).max()) < 1e-5
    print("shift round-trip exact")

    # symmetrize an ANISOTROPIC filter (horizontal-only smoother): averaging
    # it over the rotation group restores isotropy and improves denoising
    # (reference EquivariantDenoiser, models/equivariant.py)
    y = x + sigma * jax.random.normal(jax.random.key(2), x.shape)

    def base(u, s):
        k = jnp.ones((1, 1, 1, 7)) / 7.0  # 1x7 horizontal box kernel
        return jax.lax.conv_general_dilated(
            u, k, (1, 1), [(0, 0), (3, 3)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))

    equiv = EquivariantDenoiser(base, transform=Rotate(multiples=90) + Reflect())
    psnr = jax.jit(lambda a, b: jnp.mean(PSNR()(a, b)))
    out_aniso = jax.jit(base)(y, sigma)
    out_equiv = jax.jit(lambda d, u, s: d(u, s))(equiv, y, sigma)
    print(f"anisotropic     {float(np.asarray(psnr(out_aniso, x))):.2f} dB")
    print(f"equivariant     {float(np.asarray(psnr(out_equiv, x))):.2f} dB")


if __name__ == "__main__":
    main()
