"""Distributed context: mesh lifecycle facade
(reference deepinv/distributed/distrib_framework.py:22 DistributedContext).

The reference manages torch.distributed process groups (NCCL/Gloo backend
selection, rank env vars, barriers). On TPU the JAX runtime owns process
bootstrap; this facade builds a ``jax.sharding.Mesh`` with named axes and
keeps the reference's API shape (``rank``, ``world_size``, ``local_indices``
round-robin sharding — distrib_framework.py:194) for porting user code.
Single-device degrades to local compute like the reference's
single_process_fallback (distributed_utils.py:94).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = ["DistributedContext"]


class DistributedContext:
    """Build a device mesh with named axes.

    :param axis_names: mesh axis names, e.g. ("op",) for operator
        parallelism, ("dp", "sp") for data x spatial.
    :param shape: devices per axis (defaults to all devices on one axis).
    :param devices: explicit device list.

    :Examples:

        Replaces the reference's process-group lifecycle
        (distrib_framework.py:22) with a single-controller mesh; the same
        facade works on 1 device or a pod slice:

        >>> from deepinv_tpu.parallel import DistributedContext
        >>> ctx = DistributedContext(axis_names=("op",))
        >>> ctx.world_size >= 1
        True
        >>> ctx.local_indices(4)[0][0]  # round-robin shard of 4 operators
        0
    """

    def __init__(self, axis_names: Sequence[str] = ("op",), shape: Optional[Sequence[int]] = None, devices=None):
        devices = list(devices if devices is not None else jax.devices())
        if shape is None:
            shape = (len(devices),) + (1,) * (len(axis_names) - 1)
        n = int(np.prod(shape))
        devices = devices[:n]
        self.mesh = Mesh(np.array(devices).reshape(shape), axis_names=tuple(axis_names))
        self.axis_names = tuple(axis_names)

    # -- reference-API compatibility --------------------------------------
    @property
    def world_size(self) -> int:
        return self.mesh.devices.size

    @property
    def rank(self) -> int:
        return 0  # single-controller SPMD: there is one logical program

    def local_indices(self, n: int, axis: str | None = None):
        """Round-robin index shards per device (distrib_framework.py:194)."""
        size = self.axis_size(axis)
        return [list(range(r, n, size)) for r in range(size)]

    def axis_size(self, axis: str | None = None) -> int:
        axis = axis or self.axis_names[0]
        return self.mesh.shape[axis]

    def sharding(self, *spec) -> NamedSharding:
        return NamedSharding(self.mesh, PartitionSpec(*spec))

    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, PartitionSpec())

    def __enter__(self):
        self._ctx = self.mesh
        self._ctx.__enter__()
        return self

    def __exit__(self, *exc):
        self._ctx.__exit__(*exc)
        return False
