"""Diffusion UNet architectures (reference deepinv/models/{diffunet.py:980
DiffUNet, guided_diffusion.py:295 ADMUNet, precond.py:73 EDMPrecond}).

A compact ADM-style UNet: sinusoidal timestep embedding, GroupNorm
scale-shift residual blocks, self-attention at low resolutions. Attention is
one fused ``jax.nn.dot_product_attention``-style einsum — MXU work.
``EDMPrecond`` adds the Karras et al. preconditioning so any backbone acts
as a sigma-calibrated denoiser ``D(x, sigma)``.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..core import Module
from .base import Denoiser, handle_sigma
from .layers import Conv2d, Linear, UpsampleNearest, AvgPool2d

__all__ = ["DiffUNet", "EDMPrecond", "GroupNorm"]


class GroupNorm(Module):
    def __init__(self, channels: int, groups: int = 8, eps: float = 1e-5):
        self.weight = jnp.ones((channels,))
        self.bias = jnp.zeros((channels,))
        self.groups = min(groups, channels)
        self.eps = eps

    def __call__(self, x):
        B, C, H, W = x.shape
        g = self.groups
        v = x.reshape(B, g, C // g, H, W)
        mu = jnp.mean(v, axis=(2, 3, 4), keepdims=True)
        var = jnp.var(v, axis=(2, 3, 4), keepdims=True)
        v = (v - mu) / jnp.sqrt(var + self.eps)
        v = v.reshape(B, C, H, W)
        return v * self.weight[None, :, None, None] + self.bias[None, :, None, None]


def timestep_embedding(t, dim: int):
    """Sinusoidal embedding (guided-diffusion convention)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(10000.0) * jnp.arange(half) / half)
    args = t[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class _ResBlock(Module):
    def __init__(self, cin, cout, emb_dim, key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        self.norm1 = GroupNorm(cin)
        self.conv1 = Conv2d(cin, cout, 3, 1, 1, key=k1)
        self.emb = Linear(emb_dim, 2 * cout, key=k2)
        self.norm2 = GroupNorm(cout)
        self.conv2 = Conv2d(cout, cout, 3, 1, 1, key=k3)
        self.conv2 = self.conv2.replace(weight=self.conv2.weight * 0.0)
        self.skip = Conv2d(cin, cout, 1, 1, 0, key=k4) if cin != cout else None

    def __call__(self, x, emb):
        h = self.conv1(jax.nn.silu(self.norm1(x)))
        scale_shift = self.emb(jax.nn.silu(emb))[:, :, None, None]
        scale, shift = jnp.split(scale_shift, 2, axis=1)
        h = self.norm2(h) * (1 + scale) + shift
        h = self.conv2(jax.nn.silu(h))
        skip = self.skip(x) if self.skip is not None else x
        return skip + h


class _Attention(Module):
    def __init__(self, channels, key):
        k1, k2 = jax.random.split(key)
        self.norm = GroupNorm(channels)
        self.qkv = Conv2d(channels, 3 * channels, 1, 1, 0, key=k1)
        self.proj = Conv2d(channels, channels, 1, 1, 0, key=k2)
        self.proj = self.proj.replace(weight=self.proj.weight * 0.0)

    def __call__(self, x):
        B, C, H, W = x.shape
        qkv = self.qkv(self.norm(x)).reshape(B, 3, C, H * W)
        q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
        attn = jax.nn.softmax(jnp.einsum("bcn,bcm->bnm", q, k) / math.sqrt(C), axis=-1)
        out = jnp.einsum("bnm,bcm->bcn", attn, v).reshape(B, C, H, W)
        return x + self.proj(out)


class DiffUNet(Denoiser):
    """ADM-style diffusion UNet (reference diffunet.py:23).

    ``__call__(x, sigma)`` follows the Denoiser protocol: sigma is mapped to
    a timestep embedding, and the network predicts the clean image
    (residual epsilon-prediction converted internally).
    """

    def __init__(
        self,
        in_channels: int = 3,
        out_channels: int = 3,
        nc=(32, 64, 128),
        num_res_blocks: int = 2,
        attn_level: int = 2,
        key=None,
    ):
        key = key if key is not None else jax.random.key(0)
        ks = iter(jax.random.split(key, 128))
        nc = tuple(nc)
        emb_dim = nc[0] * 4
        self.emb1 = Linear(nc[0], emb_dim, key=next(ks))
        self.emb2 = Linear(emb_dim, emb_dim, key=next(ks))
        self.emb_dim_in = nc[0]

        self.head = Conv2d(in_channels, nc[0], 3, 1, 1, key=next(ks))
        self.down_blocks = []
        ch = nc[0]
        for lvl, c in enumerate(nc):
            blocks = []
            for _ in range(num_res_blocks):
                blocks.append(_ResBlock(ch, c, emb_dim, next(ks)))
                ch = c
                if lvl >= attn_level:
                    blocks.append(_Attention(c, next(ks)))
            self.down_blocks.append(blocks)
        self.downs = [Conv2d(nc[i], nc[i], 3, 2, 1, key=next(ks)) for i in range(len(nc) - 1)]

        self.mid1 = _ResBlock(nc[-1], nc[-1], emb_dim, next(ks))
        self.mid_attn = _Attention(nc[-1], next(ks))
        self.mid2 = _ResBlock(nc[-1], nc[-1], emb_dim, next(ks))

        self.up_blocks = []
        self.ups = []
        for lvl in reversed(range(len(nc))):
            c = nc[lvl]
            blocks = []
            for _ in range(num_res_blocks):
                blocks.append(_ResBlock(ch + c, c, emb_dim, next(ks)))
                ch = c
                if lvl >= attn_level:
                    blocks.append(_Attention(c, next(ks)))
            self.up_blocks.append(blocks)
            if lvl > 0:
                self.ups.append(Conv2d(c, nc[lvl - 1], 3, 1, 1, key=next(ks)))
                ch = nc[lvl - 1]
        self.out_norm = GroupNorm(nc[0])
        self.out_conv = Conv2d(nc[0], out_channels, 3, 1, 1, key=next(ks))
        self.upsample = UpsampleNearest(2)

    def _forward(self, x, t_emb):
        emb = self.emb2(jax.nn.silu(self.emb1(t_emb)))
        h = self.head(x)
        skips = []
        for lvl, blocks in enumerate(self.down_blocks):
            for b in blocks:
                h = b(h, emb) if isinstance(b, _ResBlock) else b(h)
            skips.append(h)
            if lvl < len(self.downs):
                h = self.downs[lvl](h)
        h = self.mid2(self.mid_attn(self.mid1(h, emb)), emb)
        for i, blocks in enumerate(self.up_blocks):
            skip = skips[len(skips) - 1 - i]
            if h.shape[-2:] != skip.shape[-2:]:
                h = self.upsample(h)[..., : skip.shape[-2], : skip.shape[-1]]
            h = jnp.concatenate([h, skip], axis=1)
            first = True
            for b in blocks:
                if isinstance(b, _ResBlock):
                    h = b(h, emb)
                    if first:
                        first = False
                else:
                    h = b(h)
            if i < len(self.ups):
                h = self.ups[i](h)
        return self.out_conv(jax.nn.silu(self.out_norm(h)))

    def __call__(self, x, sigma=0.05, y=None, type_t: str = None, **kwargs):
        if type_t == "timestep":
            return self.forward_diffusion(x, jnp.asarray(sigma).reshape(-1), y=y)
        if type_t == "noise_level":
            return self.forward_denoise(x, sigma, y=y)
        s = jnp.asarray(sigma, x.dtype).reshape(-1)
        if s.shape[0] != x.shape[0]:
            s = jnp.broadcast_to(s, (x.shape[0],))
        t_emb = timestep_embedding(jnp.log(jnp.clip(s, 1e-5, None)), self.emb_dim_in)
        from .utils import test_pad

        mod = 2 ** len(self.downs)
        H, W = x.shape[-2:]
        if H % mod or W % mod:
            eps = test_pad(lambda u: self._forward(u, t_emb), x, modulo=mod)
        else:
            eps = self._forward(x, t_emb)
        # epsilon-prediction -> denoised estimate
        return x - s.reshape(-1, 1, 1, 1) * eps

    # -- reference protocol surface (diffunet.py:331-560) -----------------

    def forward_diffusion(self, x, timesteps, y=None):
        """Epsilon prediction from raw diffusion *timesteps* (reference
        diffunet.py:408 ``forward_diffusion``): embeds the integer timestep
        batch directly and returns the predicted noise map."""
        t = jnp.asarray(timesteps, jnp.float32).reshape(-1)
        if t.shape[0] != x.shape[0]:
            t = jnp.broadcast_to(t, (x.shape[0],))
        return self._forward(x, timestep_embedding(t, self.emb_dim_in))

    def get_alpha_prod(self, beta_start: float = 0.1 / 1000,
                       beta_end: float = 20 / 1000,
                       num_train_timesteps: int = 1000):
        """Cumulative-alpha schedule tables (reference diffunet.py:448):
        returns ``(reduced_alpha_cumprod, sqrt_recip_alphas_cumprod,
        sqrt_recipm1_alphas_cumprod, sqrt_1m_alphas_cumprod,
        sqrt_alphas_cumprod)``."""
        betas = jnp.linspace(beta_start, beta_end, num_train_timesteps,
                             dtype=jnp.float32)
        alphas_cumprod = jnp.cumprod(1.0 - betas)
        sqrt_ac = jnp.sqrt(alphas_cumprod)
        sqrt_1m_ac = jnp.sqrt(1.0 - alphas_cumprod)
        return (
            sqrt_1m_ac / sqrt_ac,
            jnp.sqrt(1.0 / alphas_cumprod),
            jnp.sqrt(1.0 / alphas_cumprod - 1.0),
            sqrt_1m_ac,
            sqrt_ac,
        )

    def find_nearest(self, array, value):
        """Index of the nearest table entry per value (reference
        diffunet.py:478)."""
        array = jnp.asarray(array)
        value = jnp.asarray(value).reshape(-1)
        return jnp.argmin(jnp.abs(array[:, None] - value[None, :]), axis=0)

    def forward_denoise(self, x, sigma, y=None):
        """Denoise via the diffusion convention (reference diffunet.py:485):
        rescale x to the [-1, 1] sqrt-alpha parametrization, look up the
        nearest trained timestep for ``sigma``, predict epsilon, and convert
        back to a [0, 1] denoised estimate."""
        s = jnp.asarray(sigma, jnp.float32).reshape(-1)
        if s.shape[0] != x.shape[0]:
            s = jnp.broadcast_to(s, (x.shape[0],))
        alpha = 1.0 / (1.0 + 4.0 * s**2)
        xs = jnp.sqrt(alpha)[:, None, None, None] * (2.0 * x - 1.0)
        s_eff = s * jnp.sqrt(alpha)
        (_, sqrt_recip_ac, sqrt_recipm1_ac, sqrt_1m_ac, _) = self.get_alpha_prod()
        t_idx = self.find_nearest(sqrt_1m_ac, s_eff * 2.0)
        eps = self.forward_diffusion(xs, t_idx.astype(jnp.float32), y=y)
        if eps.shape[1] == 2 * x.shape[1]:  # learned-variance heads
            eps = eps[:, : x.shape[1]]
        x0 = (sqrt_recip_ac[t_idx][:, None, None, None] * xs
              - sqrt_recipm1_ac[t_idx][:, None, None, None] * eps)
        return (x0 + 1.0) / 2.0

    def patch_forward(self, x, t, y=None, type_t: str = "noise_level",
                      patch_size: int = 512):
        """Apply the model over non-overlapping ``patch_size`` tiles
        (reference diffunet.py:331): circularly pad to a multiple of the
        patch size, run each tile, and reassemble. Static shapes — the tile
        grid is a reshape, so this stays one XLA program."""
        B, C, H, W = x.shape
        ph = (-H) % patch_size
        pw = (-W) % patch_size
        xp = jnp.pad(x, ((0, 0), (0, 0), (ph, 0), (pw, 0)), mode="wrap")
        Hp, Wp = xp.shape[-2:]
        nh, nw = Hp // patch_size, Wp // patch_size
        tiles = xp.reshape(B, C, nh, patch_size, nw, patch_size)
        tiles = tiles.transpose(2, 4, 0, 1, 3, 5).reshape(
            nh * nw, B, C, patch_size, patch_size)
        out = jax.lax.map(lambda p: self(p, t, y=y, type_t=type_t), tiles)
        out = out.reshape(nh, nw, B, C, patch_size, patch_size)
        out = out.transpose(2, 3, 0, 4, 1, 5).reshape(B, C, Hp, Wp)
        return out[..., ph:, pw:]

    def convert_to_fp16(self):
        """Return a copy with float parameters stored in bfloat16 — the TPU
        analogue of the reference's fp16 module conversion
        (diffunet.py:392). TPUs have no fp16 MXU path; bf16 is the native
        half-width format."""
        return jax.tree_util.tree_map(
            lambda v: v.astype(jnp.bfloat16)
            if hasattr(v, "dtype") and v.dtype == jnp.float32 else v, self)

    def convert_to_fp32(self):
        """Return a copy with float parameters stored in float32 (reference
        diffunet.py:400)."""
        return jax.tree_util.tree_map(
            lambda v: v.astype(jnp.float32)
            if hasattr(v, "dtype") and v.dtype == jnp.bfloat16 else v, self)


# The faithful guided-diffusion architecture (reference DiffUNet /
# ADMUNet, loads published checkpoints bit-exactly) lives in models/adm.py


class EDMPrecond(Denoiser):
    r"""Karras EDM preconditioning wrapper (reference precond.py:73):
    ``D(x, sigma) = c_skip x + c_out F(c_in x, c_noise)``."""

    def __init__(self, model, sigma_data: float = 0.5):
        self.model = model
        self.sigma_data = sigma_data

    def __call__(self, x, sigma=0.05, **kwargs):
        s = jnp.asarray(sigma, x.dtype).reshape(-1, 1, 1, 1)
        sd2 = self.sigma_data**2
        c_skip = sd2 / (s**2 + sd2)
        c_out = s * self.sigma_data / jnp.sqrt(s**2 + sd2)
        c_in = 1.0 / jnp.sqrt(sd2 + s**2)
        c_noise = jnp.log(jnp.clip(s[:, 0, 0, 0], 1e-8, None)) / 4
        F = self.model(c_in * x, c_noise)
        return c_skip * x + c_out * F
