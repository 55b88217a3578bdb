"""Defining a new physics operator (counterpart of reference
examples/basics/demo_custom_physics.py): subclass LinearPhysics, get the
adjoint/dagger/prox machinery for free, verify the framework invariants."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import _util

_util.setup()  # CPU by default; DEEPINV_TPU_DEMO_PLATFORM overrides

import jax
import jax.numpy as jnp

from deepinv_tpu.physics import LinearPhysics, GaussianNoise


class RowSum(LinearPhysics):
    """Toy operator: y = column-wise mean of the image rows."""

    def __init__(self, img_size, **kwargs):
        # img_shape lets the base class derive the exact adjoint via
        # jax.linear_transpose
        super().__init__(img_shape=(1,) + tuple(img_size), **kwargs)
        self.img_size = tuple(img_size)

    def A(self, x, **params):
        return x.mean(axis=-2)


def main():
    physics = RowSum((1, 16, 16), noise_model=GaussianNoise(0.01))
    x = jax.random.uniform(jax.random.key(0), (2, 1, 16, 16))
    y = physics(x, key=jax.random.key(1))
    print("measurement shape:", y.shape)

    # the adjoint is derived automatically and passes the dot-product test
    u = jax.random.normal(jax.random.key(2), x.shape)
    v = jax.random.normal(jax.random.key(3), y.shape)
    lhs = jnp.vdot(physics.A(u), v)
    rhs = jnp.vdot(u, physics.A_adjoint(v))
    print(f"adjointness error: {abs(float(lhs - rhs)):.2e}")
    assert abs(float(lhs - rhs)) < 1e-4

    # pseudo-inverse (Krylov) and prox_l2 come for free as well
    xdag = physics.A_dagger(physics.A(x))
    print("A A_dagger A ~ A residual:",
          float(jnp.abs(physics.A(xdag) - physics.A(x)).max()))


if __name__ == "__main__":
    main()
