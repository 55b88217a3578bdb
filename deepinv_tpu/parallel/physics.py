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
XLA still overlaps independent operators. The reference's
``gather_strategy`` knob ('naive'/'concatenated'/'broadcast',
distrib_framework.py:262) is accepted for API parity but is a no-op here:
gathering is an XLA sharding decision, not a user-level serialization
choice.

Operators can also be supplied lazily as a **factory callable**
``factory(index, device, factory_kwargs) -> Physics`` (reference
distribute.py:62), which avoids materializing every operator when building
large stacks.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

# vma (varying-manual-axes) tracking stays ON: device-local adjoints are
# derived with primals that inherit the cotangent's vma
# (core.linalg.transpose_primal), so no spurious psum is transposed in.
from jax import shard_map

from ..core import Module, TensorList
from ..core.rng import ensure_key
from ..physics.base import Physics, LinearPhysics
from .context import DistributedContext

__all__ = [
    "DistributedStackedPhysics",
    "DistributedStackedLinearPhysics",
    "stack_homogeneous",
]


def stack_homogeneous(physics_list: Sequence[Physics]):
    """Stack same-structure physics into one batched physics pytree
    (leading operator axis on every array leaf)."""
    treedefs = {jax.tree_util.tree_structure(p) for p in physics_list}
    if len(treedefs) != 1:
        raise ValueError(
            "operators are not structurally identical; use StackedPhysics"
        )
    return jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *physics_list)


def _materialize(physics, num_operators, factory_kwargs):
    """Resolve a list/factory spec into a list of physics objects."""
    if isinstance(physics, (list, tuple)):
        return list(physics)
    if callable(physics) and not isinstance(physics, Physics):
        if num_operators is None:
            raise ValueError(
                "when passing a factory callable, num_operators is required "
                "(reference distribute.py:77)"
            )
        # device=None: on TPU, placement is the mesh sharding's job
        return [physics(i, None, factory_kwargs) for i in range(num_operators)]
    raise ValueError(f"cannot build an operator stack from {type(physics)}")


class DistributedStackedPhysics(Physics):
    """Mesh-sharded stack of (possibly nonlinear) physics operators
    (reference distrib_framework.py:234).

    Subclasses :class:`deepinv_tpu.physics.Physics` like the reference, so
    the full generic surface (``noise``/``sensor``/``stack``/``clone``/
    ``update_parameters``/``set_noise_model``/``set_ls_solver``/``A_vjp``/
    ``compute_norm``) is inherited; the distributed A/forward/A_dagger
    below override the compute paths with shard_map versions.

    Homogeneous stacks (same pytree structure) run as one vmapped
    ``shard_map`` over the ``op`` mesh axis; heterogeneous stacks evaluate
    sequentially inside jit (XLA overlaps the independent operators) and
    return a :class:`deepinv_tpu.TensorList`.

    :param physics: list of Physics, or a factory
        ``f(index, device, factory_kwargs) -> Physics``.
    :param ctx: DistributedContext with an ``op`` axis.
    :param num_operators: stack size (required for factory input).
    :param op_axis: mesh axis name.
    :param gather_strategy: accepted for reference API parity
        (distrib_framework.py:262); gathering is handled by XLA sharding.
    :param factory_kwargs: shared dict passed to the factory.
    """

    def __init__(
        self,
        physics,
        ctx: DistributedContext,
        num_operators: Optional[int] = None,
        op_axis: str = "op",
        gather_strategy: str = "concatenated",
        factory_kwargs: Optional[dict] = None,
    ):
        if gather_strategy not in ("naive", "concatenated", "broadcast"):
            raise ValueError(
                f"gather_strategy must be naive/concatenated/broadcast, "
                f"got {gather_strategy!r}"
            )
        super().__init__()
        physics_list = _materialize(physics, num_operators, factory_kwargs)
        self.n_ops = len(physics_list)
        self.ctx = ctx
        self.op_axis = op_axis
        self.gather_strategy = gather_strategy
        try:
            self.batched = stack_homogeneous(physics_list)
            self.physics_list = None
        except ValueError:
            self.batched = None
            self.physics_list = physics_list
        # Non-divisible stacks (incl. fewer operators than devices — the
        # reference's "empty local set", test_distributed.py:855): pad the
        # operator axis to a mesh multiple by repeating the last operator.
        # A() slices the pads off; A_adjoint() feeds them zero measurements,
        # so their contribution to the psum is exactly zero (linearity).
        self.n_pad = 0
        if self.batched is not None:
            k = ctx.axis_size(op_axis)
            self.n_pad = (-self.n_ops) % k
            if self.n_pad:
                self.batched = jax.tree_util.tree_map(
                    lambda l: jnp.concatenate(
                        [l, jnp.repeat(l[-1:], self.n_pad, axis=0)]),
                    self.batched,
                )

    # -- map over the stack ----------------------------------------------
    def _sharded_map(self, fn, *args_specs):
        """shard_map a (batched_local, *args) -> stacked-out function."""
        mesh = self.ctx.mesh
        in_specs = (P(self.op_axis),) + tuple(s for _, s in args_specs)
        return shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=P(self.op_axis)
        )

    def A(self, x, **params):
        """Stacked measurements: ``(n_ops, B, C, ...)`` sharded over ``op``
        for homogeneous stacks, TensorList otherwise."""
        if self.batched is None:
            return TensorList([p.A(x, **params) for p in self.physics_list])

        def local(batched_local, xv):
            return jax.vmap(lambda p: p.A(xv, **params))(batched_local)

        f = self._sharded_map(local, (None, P()))
        out = f(self.batched, x)
        return out[: self.n_ops] if self.n_pad else out

    def forward(self, x, key=None, **params):
        """Full forward ``N(A(x))`` with per-operator noise keys."""
        key = ensure_key(key, 0)
        if self.batched is None:
            keys = jax.random.split(key, self.n_ops)
            return TensorList(
                [p(x, key=k, **params) for p, k in zip(self.physics_list, keys)]
            )
        keys = jax.random.split(key, self.n_ops + self.n_pad)

        def local(batched_local, keys_local, xv):
            return jax.vmap(lambda p, k: p(xv, key=k, **params))(
                batched_local, keys_local
            )

        mesh = self.ctx.mesh
        f = shard_map(
            local,
            mesh=mesh,
            in_specs=(P(self.op_axis), P(self.op_axis), P()),
            out_specs=P(self.op_axis),
        )
        out = f(self.batched, keys, x)
        return out[: self.n_ops] if self.n_pad else out

    def __call__(self, x, key=None, **params):
        return self.forward(x, key=key, **params)

    def A_dagger(self, y, x_init=None, max_iter: int = 50, lr: float = 1e-1):
        """Gradient-descent pseudo-inverse for the nonlinear stack
        (reference Physics.A_dagger semantics, forward.py:161-199):
        minimizes ``0.5 sum_i ||A_i(x) - y_i||^2`` by compiled GD."""
        if x_init is None:
            if self.batched is not None and hasattr(self.batched, "A_adjoint"):
                x_init = self.A_adjoint(y)
            else:
                raise ValueError("x_init required for nonlinear A_dagger")

        def loss(x):
            r = self.A(x)
            leaves_r = jax.tree_util.tree_leaves(
                jax.tree_util.tree_map(jnp.subtract, r, y)
            )
            return 0.5 * sum(jnp.vdot(l, l).real for l in leaves_r)

        g = jax.grad(loss)

        def body(_, x):
            return x - lr * g(x)

        return jax.lax.fori_loop(0, max_iter, body, x_init)


class DistributedStackedLinearPhysics(DistributedStackedPhysics, LinearPhysics):
    """Mesh-sharded stack of homogeneous linear operators
    (reference distrib_framework.py:387). Inherits the LinearPhysics
    spectral surface (``A_A_adjoint``/``adjointness_test``/
    ``condition_number``/``compute_sqnorm``) on top of the distributed
    compute paths.

    Adds the linear machinery: psum adjoint, distributed CG pseudo-inverse,
    distributed power method, prox_l2.
    """

    def __init__(self, physics, ctx: DistributedContext, **kwargs):
        super().__init__(physics, ctx, **kwargs)
        if self.batched is None:
            raise ValueError(
                "DistributedStackedLinearPhysics needs structurally identical "
                "operators; use StackedLinearPhysics for heterogeneous stacks"
            )

    # local helpers run under shard_map: physics leaves have a local leading
    # operator axis of size n_ops / axis_size
    def _local_At_sum(self, batched_local, y_local):
        outs = jax.vmap(lambda p, yi: p.A_adjoint(yi))(batched_local, y_local)
        return jnp.sum(outs, axis=0)

    def A_adjoint(self, y):
        """Sum of per-operator adjoints — psum over the op axis
        (reference all_reduce, distrib_framework.py:450).

        Accepts the stacked ``(n_ops, ...)`` array convention or a
        homogeneous :class:`TensorList` (what ``StackedPhysics.A``
        returns), so serial and distributed stacks interchange."""
        mesh = self.ctx.mesh
        if not isinstance(y, jax.Array):  # TensorList -> stacked array
            y = jnp.stack(list(y))
        if self.n_pad:
            # pad operators see zero measurements -> zero adjoint (linear)
            y = jnp.concatenate(
                [y, jnp.zeros((self.n_pad,) + tuple(y.shape[1:]), y.dtype)])

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
