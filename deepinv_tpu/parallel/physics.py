"""Operator-parallel physics (reference deepinv/distributed/
distrib_framework.py:234 DistributedStackedPhysics, :387
DistributedStackedLinearPhysics).

TPU-native design: a stack of *structurally identical* operators (same
pytree treedef, e.g. k blurs with different PSFs, k inpainting masks, k MRI
coil masks) is **stacked into one batched physics** whose parameter leaves
carry a leading operator axis. ``shard_map`` over the mesh's ``op`` axis
then gives true operator parallelism:

- ``A``: x replicated, each device applies its local operators — the
  measurement TensorList becomes an array with a sharded leading axis;
- ``A_adjoint``: local adjoints + ``lax.psum`` over ``op`` — the reference's
  all-reduce (distrib_framework.py:450) becomes one ICI collective;
- ``compute_norm``: distributed power method for free (the reference
  reimplements it, :666).

Heterogeneous stacks fall back to sequential evaluation inside one jit —
XLA still overlaps independent operators.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

# vma (varying-manual-axes) tracking stays ON: device-local adjoints are
# derived with primals that inherit the cotangent's vma
# (core.linalg.transpose_primal), so no spurious psum is transposed in.
from jax import shard_map

from ..core import Module
from ..physics.base import LinearPhysics, StackedLinearPhysics
from .context import DistributedContext

__all__ = ["DistributedStackedLinearPhysics", "stack_homogeneous"]


def stack_homogeneous(physics_list: Sequence[LinearPhysics]):
    """Stack same-structure physics into one batched physics pytree
    (leading operator axis on every array leaf)."""
    treedefs = {jax.tree_util.tree_structure(p) for p in physics_list}
    if len(treedefs) != 1:
        raise ValueError(
            "operators are not structurally identical; use StackedLinearPhysics"
        )
    return jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *physics_list)


class DistributedStackedLinearPhysics(Module):
    """Mesh-sharded stack of homogeneous linear operators.

    :param physics_list: list of same-structure LinearPhysics (length must be
        divisible by the op-axis size).
    :param ctx: DistributedContext with an ``op`` axis.
    :param op_axis: mesh axis name.
    """

    def __init__(self, physics_list, ctx: DistributedContext, op_axis: str = "op"):
        self.batched = stack_homogeneous(physics_list)
        self.n_ops = len(physics_list)
        self.ctx = ctx
        self.op_axis = op_axis
        if self.n_ops % ctx.axis_size(op_axis) != 0:
            raise ValueError(
                f"{self.n_ops} operators not divisible by mesh axis size "
                f"{ctx.axis_size(op_axis)}"
            )

    # local helpers run under shard_map: physics leaves have a local leading
    # operator axis of size n_ops / axis_size
    def _local_A(self, batched_local, x):
        return jax.vmap(lambda p: p.A(x))(batched_local)

    def _local_At_sum(self, batched_local, y_local):
        outs = jax.vmap(lambda p, yi: p.A_adjoint(yi))(batched_local, y_local)
        return jnp.sum(outs, axis=0)

    def A(self, x):
        """Returns measurements of shape (n_ops, B, C, ...) sharded over op."""
        mesh = self.ctx.mesh
        f = shard_map(
            self._local_A,
            mesh=mesh,
            in_specs=(P(self.op_axis), P()),
            out_specs=P(self.op_axis),
        )
        return f(self.batched, x)

    def A_adjoint(self, y):
        """Sum of per-operator adjoints — psum over the op axis
        (reference all_reduce, distrib_framework.py:450)."""
        mesh = self.ctx.mesh

        def local(batched_local, y_local):
            s = self._local_At_sum(batched_local, y_local)
            return jax.lax.psum(s, self.op_axis)

        f = shard_map(
            local,
            mesh=mesh,
            in_specs=(P(self.op_axis), P(self.op_axis)),
            out_specs=P(),
        )
        return f(self.batched, y)

    def A_adjoint_A(self, x):
        return self.A_adjoint(self.A(x))

    def A_vjp(self, x, v):
        return self.A_adjoint(v)

    def compute_norm(self, x0, max_iter: int = 50, tol: float = 1e-6):
        """Distributed power method (reference compute_sqnorm :666)."""
        from ..core.linalg import power_method

        return power_method(self.A_adjoint_A, x0, max_iter=max_iter, tol=tol)

    def A_dagger(self, y, max_iter: int = 100, tol: float = 1e-6):
        """Distributed CG on the normal equations (reference :590)."""
        from ..optim.linear import conjugate_gradient

        Aty = self.A_adjoint(y)
        return conjugate_gradient(
            self.A_adjoint_A, Aty, max_iter=max_iter, tol=tol
        )

    def prox_l2(self, z, y, gamma, max_iter: int = 100, tol: float = 1e-6):
        from ..optim.linear import conjugate_gradient

        H = lambda v: gamma * self.A_adjoint_A(v) + v
        b = gamma * self.A_adjoint(y) + z
        return conjugate_gradient(H, b, init=z, max_iter=max_iter, tol=tol)
