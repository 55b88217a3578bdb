"""``distribute()`` dispatcher (reference deepinv/distributed/distribute.py:214).

One entry point that routes objects to their mesh-parallel wrappers:

- list/stack of physics, or a factory callable
  ``f(index, device, factory_kwargs) -> Physics`` →
  :class:`DistributedStackedLinearPhysics` (operator axis + psum adjoint)
  or the nonlinear :class:`DistributedStackedPhysics`;
- denoiser/callable → :class:`DistributedProcessing` (spatial tiling with
  halo exchange, basic/overlap strategies, micro-batching);
- data fidelity → :class:`DistributedDataFidelity` (summed gradients).

The reference's ``type_object`` ('auto'/'physics'/'linear_physics'/
'data_fidelity'/'denoiser'), ``num_operators`` (for factories),
``gather_strategy``, ``tiling_strategy``, ``tiling_dims``, ``patch_size``,
``overlap`` and ``max_batch_size`` kwargs (distribute.py:214-330) are all
supported.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from ..core import Module
from ..optim.data_fidelity import DataFidelity
from ..physics.base import Physics, LinearPhysics, StackedPhysics, StackedLinearPhysics
from .context import DistributedContext
from .physics import DistributedStackedPhysics, DistributedStackedLinearPhysics
from .processing import DistributedProcessing

__all__ = ["distribute", "DistributedDataFidelity"]


class DistributedDataFidelity(Module):
    """Distributed data fidelity over a sharded operator stack
    (reference distrib_framework.py:940).

    :param data_fidelity: one DataFidelity (used for every operator), a list
        of per-operator fidelities, or a factory
        ``f(index, device, factory_kwargs) -> DataFidelity``
        (reference distribute.py:150).
    """

    def __init__(self, data_fidelity, ctx: DistributedContext,
                 num_operators: Optional[int] = None,
                 factory_kwargs: Optional[dict] = None):
        if isinstance(data_fidelity, (list, tuple)):
            self.fidelity_list = list(data_fidelity)
            self.data_fidelity = self.fidelity_list[0]
        elif isinstance(data_fidelity, DataFidelity):
            self.fidelity_list = None
            self.data_fidelity = data_fidelity
        elif callable(data_fidelity):
            if num_operators is None:
                raise ValueError(
                    "factory data_fidelity needs num_operators "
                    "(reference distribute.py:195)"
                )
            self.fidelity_list = [
                data_fidelity(i, None, factory_kwargs)
                for i in range(num_operators)
            ]
            self.data_fidelity = self.fidelity_list[0]
        else:
            raise ValueError(f"cannot distribute {type(data_fidelity)}")
        self.ctx = ctx

    def _per_op(self, method, Ax, y):
        """Apply a Distance method per operator over stacked measurements."""
        if self.fidelity_list is not None:
            outs = [
                getattr(f.d, method)(Ax[i], y[i])
                for i, f in enumerate(self.fidelity_list)
            ]
            return jnp.stack(outs)
        d = self.data_fidelity.d
        return jax.vmap(lambda a, b: getattr(d, method)(a, b))(Ax, y)

    def fn(self, x, y, physics):
        if isinstance(physics, DistributedStackedLinearPhysics):
            Ax = physics.A(x)  # (n_ops, ...) sharded over op
            return jnp.sum(self._per_op("fn", Ax, y), axis=0)
        return self.data_fidelity.fn(x, y, physics)

    def grad(self, x, y, physics):
        """sum_i A_i^T grad d(A_i x, y_i) — the psum rides inside
        ``physics.A_adjoint`` (reference all_reduce :1126)."""
        if isinstance(physics, DistributedStackedLinearPhysics):
            Ax = physics.A(x)
            gd = self._per_op("grad", Ax, y)
            return physics.A_adjoint(gd)
        return self.data_fidelity.grad(x, y, physics)

    def __call__(self, x, y, physics):
        return self.fn(x, y, physics)


def _is_physics_spec(obj):
    if isinstance(obj, StackedPhysics):
        return True
    return (
        isinstance(obj, (list, tuple))
        and len(obj) > 0
        and all(isinstance(p, Physics) for p in obj)
    )


def _all_linear(obj):
    if isinstance(obj, StackedLinearPhysics):
        return True
    if isinstance(obj, StackedPhysics):
        return all(isinstance(p, LinearPhysics) for p in obj.physics_list)
    return all(isinstance(p, LinearPhysics) for p in obj)


def distribute(
    obj,
    ctx: DistributedContext = None,
    *,
    num_operators: Optional[int] = None,
    type_object: str = "auto",
    gather_strategy: str = "concatenated",
    tiling_strategy: str = "overlap_tiling",
    tiling_dims=None,
    patch_size: int = None,
    overlap: int = 8,
    max_batch_size: Optional[int] = None,
    factory_kwargs: Optional[dict] = None,
    **kwargs,
):
    """Dispatch to the right mesh-parallel wrapper (reference
    distribute.py:214).

    :param obj: list/stack of physics, a physics factory
        ``f(index, device, factory_kwargs)``, a DataFidelity (or list /
        factory thereof), or a denoiser callable.
    :param ctx: DistributedContext (defaults to all devices on one axis).
    :param num_operators: required when ``obj`` is a factory callable.
    :param type_object: 'auto' (default), 'physics', 'linear_physics',
        'data_fidelity' or 'denoiser' — disambiguates factory callables.
    :param gather_strategy: reference parity knob (no-op on TPU — gathering
        is an XLA sharding decision).
    :param tiling_strategy: 'overlap_tiling' or 'basic' (for denoisers).
    :param tiling_dims: spatial axis to shard (for denoisers).
    :param patch_size: reference parity knob (tile size is set by the mesh).
    :param overlap: halo rows (for denoisers).
    :param max_batch_size: micro-batch chunk size (for denoisers).
    :param factory_kwargs: shared dict passed to factory callables.
    """
    if ctx is None:
        ctx = DistributedContext()

    if type_object == "auto":
        if _is_physics_spec(obj):
            type_object = "linear_physics" if _all_linear(obj) else "physics"
        elif isinstance(obj, DataFidelity) or (
            isinstance(obj, (list, tuple))
            and len(obj) > 0
            and all(isinstance(f, DataFidelity) for f in obj)
        ):
            type_object = "data_fidelity"
        elif callable(obj):
            # bare callables default to denoisers; factories must pass
            # type_object explicitly (reference distribute.py:330)
            type_object = "denoiser"
        else:
            raise ValueError(f"cannot distribute object of type {type(obj)}")

    if isinstance(obj, StackedPhysics):
        obj = obj.physics_list

    if type_object == "linear_physics":
        return DistributedStackedLinearPhysics(
            obj, ctx, num_operators=num_operators,
            gather_strategy=gather_strategy, factory_kwargs=factory_kwargs,
            **kwargs,
        )
    if type_object == "physics":
        return DistributedStackedPhysics(
            obj, ctx, num_operators=num_operators,
            gather_strategy=gather_strategy, factory_kwargs=factory_kwargs,
            **kwargs,
        )
    if type_object == "data_fidelity":
        return DistributedDataFidelity(
            obj, ctx, num_operators=num_operators,
            factory_kwargs=factory_kwargs,
        )
    if type_object == "denoiser":
        return DistributedProcessing(
            obj, ctx, overlap=overlap, tiling_strategy=tiling_strategy,
            tiling_dims=tiling_dims, max_batch_size=max_batch_size,
            patch_size=patch_size, **kwargs,
        )
    raise ValueError(f"unknown type_object {type_object!r}")
