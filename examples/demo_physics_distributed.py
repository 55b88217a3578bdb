"""Operator-parallel stacked physics on a device mesh
(counterpart of reference examples/distributed/demo_physics_distributed.py).

A multi-operator acquisition (many blur kernels / many views) shards one
operator per device: ``A`` maps locally and keeps measurements sharded,
``A_adjoint`` is a ``psum`` over the operator axis (the reference's
all-reduce, distrib_framework.py:450), and ``A_dagger`` runs conjugate
gradients with every matvec distributed. Factory construction avoids
materializing all operators on every device.

Run with a virtual mesh:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 python examples/demo_physics_distributed.py
"""

# make the repo root importable when run as `python examples/<demo>.py`
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import _util

_util.setup()  # CPU by default; DEEPINV_TPU_DEMO_PLATFORM overrides

if "--xla_force_host_platform_device_count" not in _os.environ.get("XLA_FLAGS", ""):
    _os.environ["XLA_FLAGS"] = (
        _os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from deepinv_tpu.parallel import DistributedContext, distribute
from deepinv_tpu.physics import Blur
from deepinv_tpu.ops import gaussian_blur
from deepinv_tpu.datasets import random_circles


def main():
    n_dev = len(jax.devices())
    ctx = DistributedContext(axis_names=("op",))
    print(f"mesh: {n_dev} devices on axis 'op'")

    # factory form: operator i is built where it lives (reference
    # distribute.py:62 — avoids materializing the full stack everywhere)
    def factory(idx, device, params):
        return Blur(filter=gaussian_blur(sigma=0.5 + 0.25 * idx,
                                         psf_size=(7, 7)),
                    padding="circular")

    dphys = distribute(factory, ctx, num_operators=n_dev,
                       type_object="linear_physics")

    x = jnp.asarray(random_circles(64, seed=0))[None]
    y = dphys.A(x)                      # (n_dev, ...) sharded measurements
    print(f"stacked measurements: {tuple(y.shape)} (operator-major)")

    xt = dphys.A_adjoint(y)             # psum over the op axis
    print(f"adjoint gathers to image: {tuple(xt.shape)}")

    # adjointness across the whole distributed stack
    u = jax.random.normal(jax.random.key(1), x.shape)
    v = jax.random.normal(jax.random.key(2), y.shape)
    lhs = float(jnp.vdot(dphys.A(u), v))
    rhs = float(jnp.vdot(u, dphys.A_adjoint(v)))
    print(f"adjointness: {lhs:.4f} vs {rhs:.4f}")

    # distributed CG pseudo-inverse: every matvec crosses the mesh
    xd = dphys.A_dagger(y, max_iter=20)
    rel = float(jnp.linalg.norm(xd - x) / jnp.linalg.norm(x))
    print(f"A_dagger (distributed CG, 20 it): rel err {rel:.3f}")
    assert rel < 0.5


if __name__ == "__main__":
    main()
