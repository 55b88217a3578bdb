"""``distribute()`` dispatcher (reference deepinv/distributed/distribute.py:214).

One entry point that routes objects to their mesh-parallel wrappers:

- list/stack of linear physics → :class:`DistributedStackedLinearPhysics`
  (operator axis + psum adjoint);
- denoiser/callable → :class:`DistributedProcessing` (spatial tiling with
  halo exchange);
- data fidelity → :class:`DistributedDataFidelity` (summed gradients).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from ..core import Module
from ..optim.data_fidelity import DataFidelity
from ..physics.base import Physics, LinearPhysics, StackedPhysics
from .context import DistributedContext
from .physics import DistributedStackedLinearPhysics
from .processing import DistributedProcessing

__all__ = ["distribute", "DistributedDataFidelity"]


class DistributedDataFidelity(Module):
    """Distributed data fidelity over a sharded operator stack
    (reference distrib_framework.py:940)."""

    def __init__(self, data_fidelity: DataFidelity, ctx: DistributedContext):
        self.data_fidelity = data_fidelity
        self.ctx = ctx

    def fn(self, x, y, physics):
        if isinstance(physics, DistributedStackedLinearPhysics):
            Ax = physics.A(x)  # (n_ops, ...) sharded over op
            d = self.data_fidelity.d
            per_op = jax.vmap(lambda a, b: d.fn(a, b))(Ax, y)
            return jnp.sum(per_op, axis=0)
        return self.data_fidelity.fn(x, y, physics)

    def grad(self, x, y, physics):
        """sum_i A_i^T grad d(A_i x, y_i) — the psum rides inside
        ``physics.A_adjoint`` (reference all_reduce :1126)."""
        if isinstance(physics, DistributedStackedLinearPhysics):
            Ax = physics.A(x)
            d = self.data_fidelity.d
            gd = jax.vmap(lambda a, b: d.grad(a, b))(Ax, y)
            return physics.A_adjoint(gd)
        return self.data_fidelity.grad(x, y, physics)

    def __call__(self, x, y, physics):
        return self.fn(x, y, physics)


def distribute(obj, ctx: DistributedContext = None, overlap: int = 8, **kwargs):
    """Dispatch to the right mesh-parallel wrapper (distribute.py:214)."""
    if ctx is None:
        ctx = DistributedContext()
    if isinstance(obj, (list, tuple)) and all(
        isinstance(p, LinearPhysics) for p in obj
    ):
        return DistributedStackedLinearPhysics(list(obj), ctx, **kwargs)
    if isinstance(obj, StackedPhysics):
        return DistributedStackedLinearPhysics(obj.physics_list, ctx, **kwargs)
    if isinstance(obj, DataFidelity):
        return DistributedDataFidelity(obj, ctx)
    if callable(obj):
        return DistributedProcessing(obj, ctx, overlap=overlap, **kwargs)
    raise ValueError(f"cannot distribute object of type {type(obj)}")
