"""Mixins: temporal flattening and 2D tiled processing
(reference deepinv/utils/mixins.py:19 TimeMixin, :290 TiledMixin2d;
tiling core at utils/_tiling.py).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["TimeMixin", "TiledMixin2d", "tiled_apply"]


class TimeMixin:
    """Temporal helpers for (B, C, T, H, W) data (utils/mixins.py:19)."""

    @staticmethod
    def flatten(x):
        """(B, C, T, H, W) -> (B*T, C, H, W)."""
        B, C, T, H, W = x.shape
        return jnp.moveaxis(x, 2, 1).reshape(B * T, C, H, W)

    @staticmethod
    def unflatten(x, batch_size: int = 1):
        BT, C, H, W = x.shape
        T = BT // batch_size
        return jnp.moveaxis(x.reshape(batch_size, T, C, H, W), 1, 2)

    @staticmethod
    def flatten_C(x):
        """(B, C, T, H, W) -> (B, C*T, H, W)."""
        B, C, T, H, W = x.shape
        return x.reshape(B, C * T, H, W)

    @staticmethod
    def average(x, mask=None, axis: int = 2):
        if mask is None:
            return jnp.mean(x, axis=axis)
        num = jnp.sum(x * mask, axis=axis)
        den = jnp.clip(jnp.sum(mask, axis=axis), 1e-6, None)
        return num / den

    @staticmethod
    def repeat(x, target, axis: int = 2):
        return jnp.repeat(jnp.expand_dims(x, axis), target.shape[axis], axis=axis)


def tiled_apply(fn, x, patch_size: int = 256, overlap: int = 64):
    """Apply ``fn`` patch-wise with overlap blending (utils/_tiling.py:148).

    Patches are processed as ONE batched call (vmap-free stacking) and
    reassembled with linear cross-fade weights in the overlap bands.
    """
    B, C, H, W = x.shape
    p, ov = patch_size, overlap
    if H <= p and W <= p:
        return fn(x)
    stride = p - ov
    ys = list(range(0, max(H - p, 0) + 1, stride))
    xs = list(range(0, max(W - p, 0) + 1, stride))
    if ys[-1] + p < H:
        ys.append(H - p)
    if xs[-1] + p < W:
        xs.append(W - p)

    patches = jnp.stack(
        [x[:, :, i : i + p, j : j + p] for i in ys for j in xs], axis=0
    )  # (N, B, C, p, p)
    N = patches.shape[0]
    outs = fn(patches.reshape(N * B, C, p, p)).reshape(N, B, C, p, p)

    # cross-fade weight window
    ramp = np.minimum(np.arange(1, p + 1), ov) / ov if ov > 0 else np.ones(p)
    ramp = np.minimum(ramp, ramp[::-1])
    w = jnp.asarray(np.outer(ramp, ramp), x.dtype)

    acc = jnp.zeros_like(x)
    cnt = jnp.zeros((1, 1, H, W), x.dtype)
    idx = 0
    for i in ys:
        for j in xs:
            acc = acc.at[:, :, i : i + p, j : j + p].add(outs[idx] * w)
            cnt = cnt.at[:, :, i : i + p, j : j + p].add(w)
            idx += 1
    return acc / jnp.clip(cnt, 1e-8, None)


class TiledMixin2d:
    """Patch-tiled inference helpers (utils/mixins.py:290)."""

    patch_size: int = 256
    overlap: int = 64

    def apply_tiled(self, fn, x):
        return tiled_apply(fn, x, patch_size=self.patch_size, overlap=self.overlap)
