"""Spatial/signal-parallel processing (reference deepinv/distributed/
distrib_framework.py:734 DistributedProcessing + strategies.py:184
BasicStrategy / :292 OverlapTilingStrategy).

The image itself is sharded over a mesh axis (the imaging analogue of
context/sequence parallelism — SURVEY.md 2.9). ``shard_map`` over the ``sp``
axis shards rows; each device exchanges ``overlap`` halo rows with its
neighbors via ``lax.ppermute`` (ICI neighbor exchange), applies the local
processor on its padded tile, and trims the halo — the reference's
gather+reassemble with overlap trimming (strategies.py:292-459) without any
host gather.

Reference option surface (distribute.py:214-330) and its TPU mapping:

- ``tiling_strategy='overlap_tiling'`` → halo exchange (default);
  ``'basic'`` → independent tiles, no halo (strategies.py:184).
- ``max_batch_size`` → the batch axis is processed in chunks of this size
  via ``lax.map`` (the reference's apply_batching, strategies.py:85-183).
- ``patch_size`` / ``tiling_dims`` are accepted for API parity; on a mesh
  the tile size is ``H / axis_size`` by construction and tiling runs over
  the row axis (-2). A ``tiling_dims`` of -1 / (-1,) tiles columns instead.
"""

from __future__ import annotations

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
    :param tiling_strategy: ``'overlap_tiling'`` (halo exchange, default) or
        ``'basic'`` (independent tiles, reference strategies.py:184).
    :param tiling_dims: spatial axis to shard: -2 (rows, default) or -1
        (columns); reference tiling_dims (distribute.py:234).
    :param max_batch_size: process the batch axis in chunks of this size
        (reference apply_batching / max_batch_size, strategies.py:85).
    :param patch_size: accepted for reference API parity; the per-device
        tile size is set by the mesh (``H / axis_size``).
    """

    def __init__(self, module, ctx: DistributedContext, overlap: int = 8,
                 sp_axis: str = "sp", tiling_strategy: str = "overlap_tiling",
                 tiling_dims=None, max_batch_size: int = None,
                 patch_size: int = None):
        if tiling_strategy not in ("overlap_tiling", "basic"):
            raise ValueError(
                "tiling_strategy must be 'overlap_tiling' or 'basic', got "
                f"{tiling_strategy!r}"
            )
        if tiling_dims is not None:
            td = (tiling_dims,) if isinstance(tiling_dims, int) else tuple(tiling_dims)
            if td not in ((-2,), (-1,), (2,), (3,)):
                raise ValueError(
                    "mesh tiling shards one spatial axis: tiling_dims must "
                    "be -2/-1 (or 2/3 for NCHW), got " f"{tiling_dims!r}"
                )
            self.tile_axis = -2 if td in ((-2,), (2,)) else -1
        else:
            self.tile_axis = -2
        self.module = module
        self.ctx = ctx
        self.overlap = overlap
        self.sp_axis = sp_axis
        self.tiling_strategy = tiling_strategy
        self.max_batch_size = max_batch_size
        self.patch_size = patch_size

    def _apply(self, x, sigma):
        """Apply the module, chunking the batch axis if requested."""
        mb = self.max_batch_size
        if mb is None or x.shape[0] <= mb:
            return self.module(x, sigma)
        B = x.shape[0]
        if B % mb:
            # pad the batch to a multiple so lax.map has static shape
            pad = mb - B % mb
            xp = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
        else:
            pad, xp = 0, x
        chunks = xp.reshape((xp.shape[0] // mb, mb) + x.shape[1:])
        out = jax.lax.map(lambda c: self.module(c, sigma), chunks)
        out = out.reshape((-1,) + out.shape[2:])
        return out[:B] if pad else out

    def __call__(self, x, sigma=0.05):
        mesh = self.ctx.mesh
        n = self.ctx.axis_size(self.sp_axis)
        if n == 1:
            return self._apply(x, sigma)
        ov = self.overlap
        axis = self.sp_axis
        ta = self.tile_axis
        if ta == -1:
            x = jnp.swapaxes(x, -1, -2)

        def local_basic(x_local):
            return self._apply(x_local, sigma)

        def local_overlap(x_local):
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
            # non-periodic boundaries: 'reflect' (edge-excluded) padding at
            # the image ends, matching jnp.pad(mode="reflect") used by
            # denoisers. Edge-excluded reflect only has S-1 rows available
            # on an S-row shard; when ov == S the farthest row falls back
            # to edge replication (caught by the overlap==shard-height
            # sweep in tests/test_parallel.py).
            S = x_local.shape[-2]
            ovr = min(ov, S - 1)

            def _reflect(block, flip_src):
                r = flip_src[..., ::-1, :]
                if ovr < ov:
                    edge = jnp.repeat(block, ov - ovr, axis=-2)
                    r = jnp.concatenate([edge, r], axis=-2)
                return r

            refl_top = _reflect(x_local[..., :1, :],
                                x_local[..., 1:ovr + 1, :])
            refl_bot = _reflect(x_local[..., -1:, :],
                                x_local[..., -ovr - 1:-1, :])
            if ovr < ov:
                # deficit edge rows sit farthest from the shard: ABOVE the
                # reflect at the top, BELOW it at the bottom
                refl_bot = jnp.concatenate(
                    [refl_bot[..., ov - ovr:, :],
                     refl_bot[..., :ov - ovr, :]], axis=-2)
            top_pad = jnp.where(idx == 0, refl_top, up)
            bot_pad = jnp.where(idx == n - 1, refl_bot, down)
            padded = jnp.concatenate([top_pad, x_local, bot_pad], axis=-2)
            out = self._apply(padded, sigma)
            return out[..., ov:-ov, :]

        # overlap == 0 degenerates to independent tiles (the reference's
        # OverlapTilingStrategy with overlap 0 trims nothing); routing it
        # through local_overlap would ppermute 0-row halos, which XLA
        # rejects at broadcast time.
        local = (local_basic if self.tiling_strategy == "basic" or ov == 0
                 else local_overlap)
        # the tile axis is -2 after the optional swap above; build the spec
        # by rank so volumetric (B, C, D, H, W) inputs shard H, not D
        spec = P(*([None] * (x.ndim - 2) + [axis, None]))
        f = shard_map(local, mesh=mesh, in_specs=spec, out_specs=spec)
        out = f(x)
        return jnp.swapaxes(out, -1, -2) if ta == -1 else out
