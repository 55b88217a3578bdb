"""SwinIR restoration transformer (reference deepinv/models/swinir.py:795,
1157 LoC) — bit-faithful port.

Shifted-window self-attention: residual Swin transformer blocks (W-MSA /
SW-MSA with relative position bias) inside residual groups (RSTB), plus
shallow/deep feature convs and the denoising / SR reconstruction heads.
Same module tree as the reference, so the published SwinIR checkpoints
(JingyunLiang/SwinIR grayDN/colorDN releases) port leaf-for-leaf via
``convert.port_swinir`` (verified to float tolerance in
tests/test_weight_porting.py).

TPU notes: windows fold into the batch dimension so every attention is one
batched (ws² x ws²) matmul; the attention mask and relative-position index
are static numpy tables (functions of the traced shapes only), so the whole
forward is a single XLA program per input shape. Dropout/DropPath are
inference-mode identities (rates only matter in reference training).
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from ..core import Module
from .base import Denoiser
from .layers import Conv2d, Linear, PixelShuffle

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
    """Relative-position lookup table (reference swinir.py:117-130)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


def _window_partition(x, ws):
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(-1, ws * ws, C)


def _window_reverse(wins, ws, H, W):
    B = wins.shape[0] // (H // ws * W // ws)
    x = wins.reshape(B, H // ws, W // ws, ws, ws, -1)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(B, H, W, -1)


class _WindowAttention(Module):
    """W-MSA with relative position bias (reference swinir.py:80)."""

    def __init__(self, dim, ws, heads, qkv_bias=True, qk_scale=None, key=None):
        k1, k2 = jax.random.split(key if key is not None else jax.random.key(0))
        self.dim = dim
        self.ws = ws
        self.heads = heads
        self.scale = qk_scale or (dim // heads) ** -0.5
        self.qkv = Linear(dim, dim * 3, bias=qkv_bias, key=k1)
        self.proj = Linear(dim, dim, key=k2)
        self.relative_position_bias_table = jnp.zeros(((2 * ws - 1) ** 2, heads))

    @property
    def rel_index(self):
        # static (numpy) lookup table derived from ws — kept out of the
        # pytree so integer indices never reach jax.grad
        return _rel_pos_index(self.ws)

    def __call__(self, x, mask=None):
        # x: (nW*B, ws*ws, dim); faithful to reference swinir.py:144-192
        B_, N, C = x.shape
        h = self.heads
        qkv = self.qkv(x).reshape(B_, N, 3, h, C // h)
        q, k, v = jnp.moveaxis(qkv, 2, 0)  # (B_, N, h, d)
        q = jnp.moveaxis(q, 1, 2) * self.scale  # (B_, h, N, d)
        k = jnp.moveaxis(k, 1, 2)
        v = jnp.moveaxis(v, 1, 2)
        attn = q @ jnp.moveaxis(k, -1, -2)
        bias = self.relative_position_bias_table[self.rel_index.reshape(-1)]
        attn = attn + jnp.moveaxis(bias.reshape(N, N, h), -1, 0)[None]
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(B_ // nW, nW, h, N, N) + mask[None, :, None]
            attn = attn.reshape(B_, h, N, N)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.moveaxis(attn @ v, 1, 2).reshape(B_, N, C)
        return self.proj(out)


def _attn_mask(H, W, ws, shift):
    """SW-MSA attention mask (reference swinir.py:293-322); static numpy."""
    if shift == 0:
        return None
    img_mask = np.zeros((1, H, W, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img_mask[:, hs, wsl, :] = cnt
            cnt += 1
    m = img_mask.reshape(1, H // ws, ws, W // ws, ws, 1)
    m = m.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
    diff = m[:, None, :] - m[:, :, None]
    return jnp.asarray(np.where(diff != 0, -100.0, 0.0).astype(np.float32))


class _SwinBlock(Module):
    """Swin transformer block (reference swinir.py:211)."""

    def __init__(self, dim, input_resolution, heads, ws, shift, mlp_ratio,
                 qkv_bias=True, qk_scale=None, key=None):
        k1, k2, k3 = jax.random.split(key if key is not None else jax.random.key(0), 3)
        # reference disables windows larger than the trained resolution
        if min(input_resolution) <= ws:
            shift = 0
            ws = min(input_resolution)
        self.ws = ws
        self.shift = shift
        self.norm1 = _LayerNorm(dim)
        self.attn = _WindowAttention(dim, ws, heads, qkv_bias, qk_scale, k1)
        self.norm2 = _LayerNorm(dim)
        hidden = int(dim * mlp_ratio)
        self.fc1 = Linear(dim, hidden, key=k2)
        self.fc2 = Linear(hidden, dim, key=k3)

    def __call__(self, x, H, W):
        # x: (B, H*W, C)
        B, L, C = x.shape
        shortcut = x
        h = self.norm1(x).reshape(B, H, W, C)
        if self.shift > 0:
            h = jnp.roll(h, (-self.shift, -self.shift), axis=(1, 2))
        wins = _window_partition(h, self.ws)
        wins = self.attn(wins, _attn_mask(H, W, self.ws, self.shift))
        h = _window_reverse(wins, self.ws, H, W)
        if self.shift > 0:
            h = jnp.roll(h, (self.shift, self.shift), axis=(1, 2))
        x = shortcut + h.reshape(B, L, C)
        # torch nn.GELU is the exact erf gelu
        x = x + self.fc2(jax.nn.gelu(self.fc1(self.norm2(x)), approximate=False))
        return x


class _RSTB(Module):
    """Residual Swin Transformer Block group (reference swinir.py:544)."""

    def __init__(self, dim, input_resolution, depth, heads, ws, mlp_ratio,
                 qkv_bias=True, qk_scale=None, key=None):
        ks = jax.random.split(key if key is not None else jax.random.key(0), depth + 1)
        self.blocks = [
            _SwinBlock(dim, input_resolution, heads, ws,
                       0 if i % 2 == 0 else ws // 2, mlp_ratio,
                       qkv_bias, qk_scale, ks[i])
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
    """SwinIR (reference swinir.py:795). Default config matches the
    published DN checkpoints (embed_dim 180, 6x6 blocks, window 8).

    :param upsampler: '' (denoising) | 'pixelshuffle' | 'pixelshuffledirect'
        | 'nearest+conv' (SR heads, reference swinir.py:977-1005).
    :param pretrained: path to a reference ``.pth`` checkpoint
        (``params``/``params_ema`` wrapping handled).
    """

    def __init__(
        self,
        img_size=128,
        patch_size=1,
        in_chans: int = 3,
        embed_dim: int = 180,
        depths=(6, 6, 6, 6, 6, 6),
        num_heads=(6, 6, 6, 6, 6, 6),
        window_size: int = 8,
        mlp_ratio: float = 2.0,
        qkv_bias: bool = True,
        qk_scale=None,
        upscale: int = 1,
        img_range: float = 1.0,
        upsampler: str = "",
        pretrained=None,
        key=None,
    ):
        key = key if key is not None else jax.random.key(0)
        ks = iter(jax.random.split(key, len(depths) + 10))
        self.window_size = window_size
        self.upscale = upscale
        self.upsampler = upsampler
        self.img_range = img_range
        if in_chans == 3:
            self.mean = jnp.array([0.4488, 0.4371, 0.4040]).reshape(1, 3, 1, 1)
        else:
            self.mean = jnp.zeros((1, 1, 1, 1))

        num_feat = 64
        res = (img_size // patch_size, img_size // patch_size) \
            if isinstance(img_size, int) else tuple(s // patch_size for s in img_size)
        self.patches_resolution = res
        self.embed_dim = embed_dim
        self.depths = tuple(depths)
        self.num_heads_cfg = tuple(num_heads)
        self.mlp_ratio = mlp_ratio
        self.in_chans = in_chans

        self.conv_first = Conv2d(in_chans, embed_dim, 3, 1, 1, key=next(ks))
        self.patch_norm = _LayerNorm(embed_dim)  # patch_embed.norm (patch_norm=True)
        self.layers = [
            _RSTB(embed_dim, res, depths[i], num_heads[i], window_size,
                  mlp_ratio, qkv_bias, qk_scale, next(ks))
            for i in range(len(depths))
        ]
        self.norm = _LayerNorm(embed_dim)
        self.conv_after_body = Conv2d(embed_dim, embed_dim, 3, 1, 1, key=next(ks))

        if upsampler == "pixelshuffle":
            self.conv_before_upsample = Conv2d(embed_dim, num_feat, 3, 1, 1, key=next(ks))
            n_up = int(math.log2(upscale)) if upscale != 3 else 1
            fac = 2 if upscale != 3 else 3
            self.upsample = [
                Conv2d(num_feat, fac * fac * num_feat, 3, 1, 1, key=next(ks))
                for _ in range(n_up)
            ]
            self.shuffle = PixelShuffle(fac)
            self.conv_last = Conv2d(num_feat, in_chans, 3, 1, 1, key=next(ks))
        elif upsampler == "pixelshuffledirect":
            self.upsample = [Conv2d(embed_dim, upscale**2 * in_chans, 3, 1, 1, key=next(ks))]
            self.shuffle = PixelShuffle(upscale)
        elif upsampler == "nearest+conv":
            self.conv_before_upsample = Conv2d(embed_dim, num_feat, 3, 1, 1, key=next(ks))
            self.conv_up1 = Conv2d(num_feat, num_feat, 3, 1, 1, key=next(ks))
            if upscale == 4:
                self.conv_up2 = Conv2d(num_feat, num_feat, 3, 1, 1, key=next(ks))
            self.conv_hr = Conv2d(num_feat, num_feat, 3, 1, 1, key=next(ks))
            self.conv_last = Conv2d(num_feat, in_chans, 3, 1, 1, key=next(ks))
        else:
            self.conv_last = Conv2d(embed_dim, in_chans, 3, 1, 1, key=next(ks))

        if pretrained is not None:
            from .convert import load_torch_checkpoint, port_swinir

            ported = port_swinir(self, load_torch_checkpoint(pretrained))
            self.__dict__.update(ported.__dict__)

    def check_img_size(self, x):
        """Reflect-pad bottom/right so both sides are multiples of the
        window size (reference swinir.py:1073)."""
        H, W = x.shape[-2:]
        ws = self.window_size
        ph, pw = (-H) % ws, (-W) % ws
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, ph), (0, pw)), mode="reflect")
        return x

    def flops(self):
        """Analytic FLOP count of one forward at the construction-time patch
        resolution (reference swinir.py:1145 aggregates the per-module
        ``flops()`` helpers; this computes the same closed form)."""
        H, W = self.patches_resolution
        d = self.embed_dim
        ws = self.window_size
        total = H * W * self.in_chans * d * 9  # shallow conv_first
        total += H * W * 3 * d  # patch embed norm
        for depth, heads in zip(self.depths, self.num_heads_cfg):
            per_block = H * W * d  # norm1
            nW = H * W / ws / ws
            N = ws * ws
            attn = (N * d * 3 * d + heads * N * (d // heads) * N * 2
                    + N * d * d)
            per_block += nW * attn
            per_block += 2 * H * W * d * d * self.mlp_ratio  # MLP
            per_block += H * W * d  # norm2
            total += depth * per_block
            total += H * W * d * d * 9  # RSTB tail conv
        total += H * W * 3 * d  # final norm
        total += H * W * d * d * 9  # conv_after_body
        return int(total)

    def no_weight_decay(self):
        """Parameter names excluded from weight decay by the authors'
        training recipe (reference swinir.py:1062)."""
        return {"absolute_pos_embed"}

    def no_weight_decay_keywords(self):
        """Parameter-name keywords excluded from weight decay (reference
        swinir.py:1068)."""
        return {"relative_position_bias_table"}

    def forward_features(self, x):
        B, C, H, W = x.shape
        h = jnp.transpose(x, (0, 2, 3, 1)).reshape(B, H * W, C)
        h = self.patch_norm(h)
        for g in self.layers:
            h = g(h, H, W)
        h = self.norm(h)
        return jnp.transpose(h.reshape(B, H, W, C), (0, 3, 1, 2))

    def __call__(self, x, sigma=None, **kwargs):
        """Denoise/restore ``x``; ``sigma`` is unused (reference swinir.py:1095)."""
        ws = self.window_size
        H, W = x.shape[-2:]
        ph, pw = (-H) % ws, (-W) % ws
        if ph or pw:  # reflect-pad bottom/right (reference check_img_size)
            x = jnp.pad(x, ((0, 0), (0, 0), (0, ph), (0, pw)), mode="reflect")

        mean = self.mean.astype(x.dtype)
        x = (x - mean) * self.img_range

        if self.upsampler == "pixelshuffle":
            h = self.conv_first(x)
            h = self.conv_after_body(self.forward_features(h)) + h
            h = jax.nn.leaky_relu(self.conv_before_upsample(h), 0.01)
            for up in self.upsample:
                h = self.shuffle(up(h))
            out = self.conv_last(h)
        elif self.upsampler == "pixelshuffledirect":
            h = self.conv_first(x)
            h = self.conv_after_body(self.forward_features(h)) + h
            out = self.shuffle(self.upsample[0](h))
        elif self.upsampler == "nearest+conv":
            h = self.conv_first(x)
            h = self.conv_after_body(self.forward_features(h)) + h
            h = jax.nn.leaky_relu(self.conv_before_upsample(h), 0.01)
            up2 = jnp.repeat(jnp.repeat(h, 2, -2), 2, -1)
            h = jax.nn.leaky_relu(self.conv_up1(up2), 0.2)
            if self.upscale == 4:
                up2 = jnp.repeat(jnp.repeat(h, 2, -2), 2, -1)
                h = jax.nn.leaky_relu(self.conv_up2(up2), 0.2)
            out = self.conv_last(jax.nn.leaky_relu(self.conv_hr(h), 0.2))
        else:
            h = self.conv_first(x)
            res = self.conv_after_body(self.forward_features(h)) + h
            out = x + self.conv_last(res)

        out = out / self.img_range + mean
        return out[:, :, : H * self.upscale, : W * self.upscale]
