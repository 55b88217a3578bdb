"""A tour of the physics zoo: one operator per family.

Mirrors the reference gallery's ``physics/demo_physics_tour.py``: build a
representative operator from each family, measure, check the adjoint
identity ``<Ax, y> = <x, A^T y>``, and reconstruct with the built-in
pseudo-inverse ``A_dagger``. Every operator is a pytree, so the same jitted
helper runs them all.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import _util

_util.setup()  # CPU by default; DEEPINV_TPU_DEMO_PLATFORM overrides

import jax
import jax.numpy as jnp
import numpy as np

from deepinv_tpu.datasets import random_circles
from deepinv_tpu.ops import gaussian_blur
from deepinv_tpu.physics import (
    Blur,
    BlurFFT,
    CompressedSensing,
    Demosaicing,
    Downsampling,
    Inpainting,
    MRI,
    SinglePixelCamera,
    Tomography,
)


def main():
    key = jax.random.key(0)
    H = W = 32
    x = jnp.asarray(np.stack([random_circles(H, seed=1)]))  # (1, 1, H, W)
    x3 = jnp.broadcast_to(x, (1, 3, H, W))

    ops = [
        ("Blur", Blur(filter=gaussian_blur(sigma=1.0), padding="circular"), x),
        ("BlurFFT", BlurFFT(img_size=(1, H, W), filter=gaussian_blur(sigma=1.0)), x),
        ("Downsampling x2", Downsampling(img_size=(1, H, W), factor=2,
                                         filter="gaussian"), x),
        ("Inpainting 70%", Inpainting(img_size=(1, H, W), mask=0.7, key=key), x),
        ("Demosaicing", Demosaicing(img_size=(3, H, W)), x3),
        ("MRI 2x", MRI(mask=(jnp.arange(W) % 2 == 0).astype(jnp.float32)
                       * jnp.ones((H, W)), img_size=(H, W)),
         jnp.concatenate([x, jnp.zeros_like(x)], 1)),
        ("CompressedSensing", CompressedSensing(m=256, img_size=(1, H, W),
                                                key=key), x),
        ("SinglePixelCamera", SinglePixelCamera(m=256, img_size=(1, H, W)), x),
        ("Tomography 45 views", Tomography(img_width=H, angles=45,
                                           normalize=True), x),
    ]

    for name, p, xi in ops:
        y = p.A(xi)
        # adjointness on random vectors
        key_u, key_v = jax.random.split(jax.random.fold_in(key, hash(name) % 997))
        u = jax.random.normal(key_u, xi.shape)
        v = jax.random.normal(key_v, y.shape)
        lhs = jnp.vdot(p.A(u), v)
        rhs = jnp.vdot(u, p.A_adjoint(v))
        adj = abs(float(lhs - rhs)) / max(abs(float(lhs)), 1e-9)
        xr = p.A_dagger(y)
        res = float(jnp.linalg.norm(p.A(xr) - y) / jnp.linalg.norm(y))
        print(f"{name:22s} y{tuple(y.shape)}  adjointness {adj:.2e}  "
              f"dagger residual {res:.3f}")
        assert adj < 1e-3, f"{name}: adjoint mismatch"
        assert res < 0.5, f"{name}: pseudo-inverse residual too large"

    print("physics tour OK")


if __name__ == "__main__":
    main()
