"""SwinIR denoiser (reference deepinv/models/swinir.py, 1157 LoC).

Shifted-window self-attention restoration transformer: residual Swin
transformer blocks (W-MSA / SW-MSA with relative position bias) inside
residual groups, plus shallow/deep feature convs. Windows are folded into
the batch dimension so every attention is one batched (win^2 x win^2)
matmul — small MXU tiles but fully batched.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from ..core import Module
from .base import Denoiser
from .layers import Conv2d, Linear
from .utils import test_pad

__all__ = ["SwinIR"]


class _LayerNorm(Module):
    def __init__(self, dim):
        self.weight = jnp.ones((dim,))
        self.bias = jnp.zeros((dim,))

    def __call__(self, x):  # (..., dim)
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        return (x - mu) / jnp.sqrt(var + 1e-5) * self.weight + self.bias


def _rel_pos_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


class _WindowAttention(Module):
    def __init__(self, dim, ws, heads, key):
        k1, k2 = jax.random.split(key)
        self.dim = dim
        self.ws = ws
        self.heads = heads
        self.qkv = Linear(dim, dim * 3, key=k1)
        self.proj = Linear(dim, dim, key=k2)
        self.rel_bias = jnp.zeros(((2 * ws - 1) ** 2, heads))

    @property
    def rel_index(self):
        # static (numpy) lookup table derived from ws — kept out of the
        # pytree so integer indices never reach jax.grad
        return _rel_pos_index(self.ws)

    def __call__(self, x, mask=None):
        # x: (nW*B, ws*ws, dim)
        B_, N, C = x.shape
        h = self.heads
        qkv = self.qkv(x).reshape(B_, N, 3, h, C // h)
        q, k, v = jnp.moveaxis(qkv, 2, 0)  # (B_, N, h, d)
        q = jnp.moveaxis(q, 1, 2)  # (B_, h, N, d)
        k = jnp.moveaxis(k, 1, 2)
        v = jnp.moveaxis(v, 1, 2)
        attn = (q @ jnp.moveaxis(k, -1, -2)) / math.sqrt(C // h)
        bias = self.rel_bias[self.rel_index.reshape(-1)].reshape(N, N, h)  # numpy index
        attn = attn + jnp.moveaxis(bias, -1, 0)[None]
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(B_ // nW, nW, h, N, N) + mask[None, :, None]
            attn = attn.reshape(B_, h, N, N)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.moveaxis(attn @ v, 1, 2).reshape(B_, N, C)
        return self.proj(out)


def _window_partition(x, ws):
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(-1, ws * ws, C)


def _window_reverse(wins, ws, H, W):
    B = wins.shape[0] // (H // ws * W // ws)
    x = wins.reshape(B, H // ws, W // ws, ws, ws, -1)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(B, H, W, -1)


class _SwinBlock(Module):
    def __init__(self, dim, heads, ws, shift, mlp_ratio, key):
        k1, k2, k3 = jax.random.split(key, 3)
        self.norm1 = _LayerNorm(dim)
        self.attn = _WindowAttention(dim, ws, heads, k1)
        self.norm2 = _LayerNorm(dim)
        hidden = int(dim * mlp_ratio)
        self.fc1 = Linear(dim, hidden, key=k2)
        self.fc2 = Linear(hidden, dim, key=k3)
        self.ws = ws
        self.shift = shift

    def _attn_mask(self, H, W):
        if self.shift == 0:
            return None
        ws, sh = self.ws, self.shift
        img_mask = np.zeros((1, H, W, 1))
        cnt = 0
        for hs in (slice(0, -ws), slice(-ws, -sh), slice(-sh, None)):
            for wsl in (slice(0, -ws), slice(-ws, -sh), slice(-sh, None)):
                img_mask[:, hs, wsl, :] = cnt
                cnt += 1
        mw = _window_partition(jnp.asarray(img_mask), ws)[..., 0]  # (nW, N)
        diff = mw[:, None, :] - mw[:, :, None]
        return jnp.where(diff != 0, -100.0, 0.0)

    def __call__(self, x, H, W):
        # x: (B, H*W, C)
        B, L, C = x.shape
        shortcut = x
        h = self.norm1(x).reshape(B, H, W, C)
        if self.shift > 0:
            h = jnp.roll(h, (-self.shift, -self.shift), axis=(1, 2))
        wins = _window_partition(h, self.ws)
        wins = self.attn(wins, self._attn_mask(H, W))
        h = _window_reverse(wins, self.ws, H, W)
        if self.shift > 0:
            h = jnp.roll(h, (self.shift, self.shift), axis=(1, 2))
        x = shortcut + h.reshape(B, L, C)
        x = x + self.fc2(jax.nn.gelu(self.fc1(self.norm2(x))))
        return x


class _RSTB(Module):
    """Residual Swin Transformer Block group."""

    def __init__(self, dim, depth, heads, ws, mlp_ratio, key):
        ks = jax.random.split(key, depth + 1)
        self.blocks = [
            _SwinBlock(dim, heads, ws, 0 if i % 2 == 0 else ws // 2, mlp_ratio, ks[i])
            for i in range(depth)
        ]
        self.conv = Conv2d(dim, dim, 3, 1, 1, key=ks[-1])

    def __call__(self, x, H, W):
        res = x
        for b in self.blocks:
            x = b(x, H, W)
        B, L, C = x.shape
        img = jnp.transpose(x.reshape(B, H, W, C), (0, 3, 1, 2))
        img = self.conv(img)
        x = jnp.transpose(img, (0, 2, 3, 1)).reshape(B, L, C)
        return x + res


class SwinIR(Denoiser):
    """SwinIR for denoising (reference swinir.py), compact configuration.

    :param embed_dim: feature dim (60 in the small SwinIR).
    :param depths: blocks per residual group.
    :param window_size: attention window (8 default).
    """

    def __init__(
        self,
        in_chans: int = 3,
        embed_dim: int = 60,
        depths=(4, 4, 4, 4),
        num_heads=(6, 6, 6, 6),
        window_size: int = 8,
        mlp_ratio: float = 2.0,
        key=None,
    ):
        key = key if key is not None else jax.random.key(0)
        ks = iter(jax.random.split(key, len(depths) + 4))
        self.window_size = window_size
        self.conv_first = Conv2d(in_chans, embed_dim, 3, 1, 1, key=next(ks))
        self.groups = [
            _RSTB(embed_dim, depths[i], num_heads[i], window_size, mlp_ratio, next(ks))
            for i in range(len(depths))
        ]
        self.norm = _LayerNorm(embed_dim)
        self.conv_body = Conv2d(embed_dim, embed_dim, 3, 1, 1, key=next(ks))
        self.conv_last = Conv2d(embed_dim, in_chans, 3, 1, 1, key=next(ks))

    def _forward(self, x):
        feat = self.conv_first(x)
        B, C, H, W = feat.shape
        h = jnp.transpose(feat, (0, 2, 3, 1)).reshape(B, H * W, C)
        for g in self.groups:
            h = g(h, H, W)
        h = self.norm(h)
        img = jnp.transpose(h.reshape(B, H, W, C), (0, 3, 1, 2))
        feat = feat + self.conv_body(img)
        return x + self.conv_last(feat)

    def __call__(self, x, sigma=None, **kwargs):
        ws = self.window_size
        H, W = x.shape[-2:]
        if H % ws or W % ws:
            return test_pad(self._forward, x, modulo=ws)
        return self._forward(x)
