"""Spatial/signal-parallel processing (reference deepinv/distributed/
distrib_framework.py:734 DistributedProcessing + strategies.py:292
OverlapTilingStrategy).

The image itself is sharded over a mesh axis (the imaging analogue of
context/sequence parallelism — SURVEY.md 2.9). ``shard_map`` over the ``sp``
axis shards rows; each device exchanges ``overlap`` halo rows with its
neighbors via ``lax.ppermute`` (ICI neighbor exchange), applies the local
denoiser on its padded tile, and trims the halo — the reference's
gather+reassemble with overlap trimming (strategies.py:292-459) without any
host gather.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

# vma (varying-manual-axes) tracking stays ON: device-local adjoints are
# derived with primals that inherit the cotangent's vma
# (core.linalg.transpose_primal), so no spurious psum is transposed in.
from jax import shard_map

from ..core import Module
from .context import DistributedContext

__all__ = ["DistributedProcessing"]


class DistributedProcessing(Module):
    """Sharded tiled processor for denoisers (distrib_framework.py:734).

    :param module: callable ``(x, sigma) -> x`` applied tile-wise.
    :param ctx: DistributedContext with an ``sp`` axis.
    :param overlap: halo rows exchanged with each neighbor.
    """

    def __init__(self, module, ctx: DistributedContext, overlap: int = 8, sp_axis: str = "sp"):
        self.module = module
        self.ctx = ctx
        self.overlap = overlap
        self.sp_axis = sp_axis

    def __call__(self, x, sigma=0.05):
        mesh = self.ctx.mesh
        n = self.ctx.axis_size(self.sp_axis)
        if n == 1:
            return self.module(x, sigma)
        ov = self.overlap
        axis = self.sp_axis

        def local(x_local):
            # neighbor halo exchange over the ring (lax.ppermute on ICI)
            up = jax.lax.ppermute(
                x_local[..., -ov:, :], axis,
                [(i, (i + 1) % n) for i in range(n)],
            )  # rows coming from the previous shard
            down = jax.lax.ppermute(
                x_local[..., :ov, :], axis,
                [(i, (i - 1) % n) for i in range(n)],
            )  # rows coming from the next shard
            idx = jax.lax.axis_index(axis)
            # non-periodic boundaries: 'reflect' (edge-excluded) padding at the
            # image ends, matching jnp.pad(mode="reflect") used by denoisers
            top_pad = jnp.where(
                idx == 0, x_local[..., 1 : ov + 1, :][..., ::-1, :], up
            )
            bot_pad = jnp.where(
                idx == n - 1, x_local[..., -ov - 1 : -1, :][..., ::-1, :], down
            )
            padded = jnp.concatenate([top_pad, x_local, bot_pad], axis=-2)
            out = self.module(padded, sigma)
            return out[..., ov:-ov, :]

        f = shard_map(
            local, mesh=mesh, in_specs=P(None, None, axis, None),
            out_specs=P(None, None, axis, None),
        )
        return f(x)
