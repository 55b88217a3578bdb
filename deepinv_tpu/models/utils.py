"""Model helpers (reference deepinv/models/utils.py): tile-to-fit inference."""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["test_pad", "test_onesplit"]


def test_pad(model, x, modulo: int = 16):
    """Pad every spatial dim (all dims past channel — 2D or 3D input) to a
    multiple of ``modulo``, run, crop back (reference models/utils.py:49)."""
    spatial = x.shape[2:]
    pads = [(-s) % modulo for s in spatial]
    xp = jnp.pad(x, [(0, 0), (0, 0)] + [(0, p) for p in pads], mode="edge")
    out = model(xp)
    return out[(Ellipsis,) + tuple(slice(0, s) for s in spatial)]


def test_onesplit(model, x, refield: int = 64, sf: int = 1):
    """Split into 4 overlapping quadrants, run, reassemble
    (reference models/utils.py:64)."""
    H, W = x.shape[-2:]
    top = slice(0, (H // 2 // refield + 1) * refield)
    bottom = slice(H - top.stop, H)
    left = slice(0, (W // 2 // refield + 1) * refield)
    right = slice(W - left.stop, W)
    outs = [
        model(x[..., top, left]),
        model(x[..., top, right]),
        model(x[..., bottom, left]),
        model(x[..., bottom, right]),
    ]
    out = jnp.zeros(x.shape[:-2] + (H * sf, W * sf), outs[0].dtype)
    h, w = H // 2, W // 2
    out = out.at[..., : h * sf, : w * sf].set(outs[0][..., : h * sf, : w * sf])
    out = out.at[..., : h * sf, w * sf :].set(outs[1][..., :, (w - W + left.stop) * sf :])
    out = out.at[..., h * sf :, : w * sf].set(outs[2][..., (h - H + top.stop) * sf :, : w * sf])
    out = out.at[..., h * sf :, w * sf :].set(
        outs[3][..., (h - H + top.stop) * sf :, (w - W + left.stop) * sf :]
    )
    return out
