"""Nonlinear wave scattering: Born inversion of Lippmann-Schwinger data.

Mirrors the reference gallery's ``physics/demo_scattering.py``
(reference physics/scattering.py:519,782): sources illuminate a permittivity
contrast, receivers record the scattered field. ``Scattering`` solves the
Lippmann-Schwinger equation (full multiple scattering, fixed-point solve
under jit); ``BornOperator`` is its linearization. For a weak contrast the
Born approximation holds and a regularized linear inversion of the nonlinear
data recovers the contrast.
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
from deepinv_tpu.physics import BornOperator, Scattering


def main():
    H = W = 32
    # weak permittivity contrast so Born linearization is accurate
    x = 0.01 * jnp.asarray(random_circles(H, seed=9)).reshape(1, 1, H, W)

    # dense acquisition (32*48 = 1536 measurements >= 1024 unknowns) so the
    # linearized inversion is well posed
    kw = dict(img_size=(H, W), n_sources=32, n_receivers=48)
    born = BornOperator(**kw)
    full = Scattering(**kw, max_iter=60)

    y_born = born.A(x)
    y_full = full.A(x)  # nonlinear forward (Lippmann-Schwinger fixed point)
    born_err = float(jnp.linalg.norm(y_full - y_born) / jnp.linalg.norm(y_full))
    print(f"measurements {tuple(y_full.shape)}  Born vs full rel. diff "
          f"{born_err:.4f}")
    assert born_err < 0.1, "weak contrast: Born should approximate the full model"

    # linearized inversion of the *nonlinear* data: regularized least squares
    # on the Born operator. gamma is the data-fit weight of the prox form
    # min gamma/2 ||Ax-y||^2 + 1/2 ||x||^2, i.e. Tikhonov with eta = 1/gamma.
    x_hat = jnp.real(born.A_dagger(y_full, gamma=1e3, max_iter=300))
    rel = float(jnp.linalg.norm(x_hat - x) / jnp.linalg.norm(x))
    print(f"Born inversion relative error: {rel:.3f}")
    assert rel < 0.6

    # multiple scattering grows with contrast
    x_strong = 20.0 * x
    y_strong_full = full.A(x_strong)
    y_strong_born = born.A(x_strong)
    strong_err = float(jnp.linalg.norm(y_strong_full - y_strong_born)
                       / jnp.linalg.norm(y_strong_full))
    print(f"strong contrast: Born vs full rel. diff {strong_err:.3f} "
          f"(nonlinearity visible)")
    assert strong_err > born_err

    print("scattering demo OK")


if __name__ == "__main__":
    main()
