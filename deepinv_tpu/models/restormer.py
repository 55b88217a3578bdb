"""Restormer denoiser (reference deepinv/models/restormer.py:751) —
bit-faithful port.

Channel-wise multi-head transposed attention (MDTA) + gated depthwise-conv
FFN (GDFN) in a 4-level encoder-decoder. Attention contracts over the
*spatial* dimension (C x C attention matrices) — linear in pixels, and the
C x C matmuls map directly onto the MXU. Same module tree as the reference,
so the published deepinv/Restormer checkpoints
(gaussian_color_denoising_blind.pth, deraining.pth, ...) port leaf-for-leaf
via ``convert.port_restormer`` (tests/test_weight_porting.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import Module
from .base import Denoiser
from .layers import Conv2d, PixelShuffle
from .utils import test_pad

__all__ = ["Restormer"]


class _LayerNormC(Module):
    """Restormer LayerNorm over the channel dim (reference restormer.py:556).

    ``BiasFree`` divides by the (mean-removed) std WITHOUT centering x —
    faithful to the reference, which published weights depend on.
    """

    def __init__(self, channels, ln_type: str = "BiasFree"):
        self.weight = jnp.ones((channels,))
        self.ln_type = ln_type
        if ln_type != "BiasFree":
            self.bias = jnp.zeros((channels,))

    def __call__(self, x):
        var = jnp.var(x, axis=1, keepdims=True)
        w = self.weight[None, :, None, None]
        if self.ln_type == "BiasFree":
            return x / jnp.sqrt(var + 1e-5) * w
        mu = jnp.mean(x, axis=1, keepdims=True)
        return (x - mu) / jnp.sqrt(var + 1e-5) * w + self.bias[None, :, None, None]


class _MDTA(Module):
    """Multi-dconv-head transposed attention (reference restormer.py:643)."""

    def __init__(self, channels, num_heads, bias=False, key=None):
        k1, k2, k3 = jax.random.split(key if key is not None else jax.random.key(0), 3)
        self.num_heads = num_heads
        self.temperature = jnp.ones((num_heads, 1, 1))
        self.qkv = Conv2d(channels, channels * 3, 1, 1, 0, bias=bias, key=k1)
        self.qkv_dw = Conv2d(channels * 3, channels * 3, 3, 1, 1, bias=bias,
                             groups=channels * 3, key=k2)
        self.proj = Conv2d(channels, channels, 1, 1, 0, bias=bias, key=k3)

    def __call__(self, x):
        B, C, H, W = x.shape
        h = self.num_heads
        qkv = self.qkv_dw(self.qkv(x))
        q, k, v = jnp.split(qkv, 3, axis=1)

        def heads(v_):
            return v_.reshape(B, h, C // h, H * W)

        q, k, v = heads(q), heads(k), heads(v)
        # torch F.normalize: x / max(||x||, 1e-12)
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
        k = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12)
        attn = jax.nn.softmax(
            jnp.einsum("bhcn,bhdn->bhcd", q, k) * self.temperature[None], axis=-1
        )
        out = jnp.einsum("bhcd,bhdn->bhcn", attn, v).reshape(B, C, H, W)
        return self.proj(out)


class _GDFN(Module):
    """Gated depthwise-conv feed-forward network (reference restormer.py:613)."""

    def __init__(self, channels, expansion, bias=False, key=None):
        k1, k2, k3 = jax.random.split(key if key is not None else jax.random.key(0), 3)
        hidden = int(channels * expansion)
        self.inp = Conv2d(channels, hidden * 2, 1, 1, 0, bias=bias, key=k1)
        self.dw = Conv2d(hidden * 2, hidden * 2, 3, 1, 1, bias=bias,
                         groups=hidden * 2, key=k2)
        self.out = Conv2d(hidden, channels, 1, 1, 0, bias=bias, key=k3)

    def __call__(self, x):
        a, b = jnp.split(self.dw(self.inp(x)), 2, axis=1)
        return self.out(jax.nn.gelu(a, approximate=False) * b)


class _TransformerBlock(Module):
    def __init__(self, channels, num_heads, expansion, key, bias=False,
                 ln_type="BiasFree"):
        k1, k2 = jax.random.split(key)
        self.norm1 = _LayerNormC(channels, ln_type)
        self.attn = _MDTA(channels, num_heads, bias, k1)
        self.norm2 = _LayerNormC(channels, ln_type)
        self.ffn = _GDFN(channels, expansion, bias, k2)

    def __call__(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.ffn(self.norm2(x))


class _Down(Module):
    def __init__(self, channels, key):
        self.conv = Conv2d(channels, channels // 2, 3, 1, 1, bias=False, key=key)

    def __call__(self, x):
        # conv then pixel-unshuffle: C/2 * 4 = 2C channels at half res
        h = self.conv(x)
        B, C, H, W = h.shape
        h = h.reshape(B, C, H // 2, 2, W // 2, 2)
        return jnp.transpose(h, (0, 1, 3, 5, 2, 4)).reshape(B, C * 4, H // 2, W // 2)


class _Up(Module):
    def __init__(self, channels, key):
        self.conv = Conv2d(channels, channels * 2, 3, 1, 1, bias=False, key=key)
        self.shuffle = PixelShuffle(2)

    def __call__(self, x):
        return self.shuffle(self.conv(x))


class Restormer(Denoiser):
    """Restormer (reference restormer.py:14). Blind denoiser: ``sigma`` unused.

    Defaults match the published checkpoints (dim 48, blocks (4,6,6,8),
    4 refinement blocks, BiasFree LayerNorm).

    :param pretrained: path to a reference ``.pth`` checkpoint (the
        ``params`` wrapping is handled).
    """

    def __init__(
        self,
        in_channels: int = 3,
        out_channels: int = 3,
        dim: int = 48,
        num_blocks=(4, 6, 6, 8),
        num_refinement_blocks: int = 4,
        heads=(1, 2, 4, 8),
        expansion: float = 2.66,
        bias: bool = False,
        LayerNorm_type: str = "BiasFree",
        dual_pixel_task: bool = False,
        pretrained=None,
        key=None,
    ):
        key = key if key is not None else jax.random.key(0)
        ks = iter(jax.random.split(key, 256))

        def tb(c, h):
            return _TransformerBlock(c, h, expansion, next(ks), bias, LayerNorm_type)

        self.patch_embed = Conv2d(in_channels, dim, 3, 1, 1, bias=bias, key=next(ks))

        dims = [dim, dim * 2, dim * 4, dim * 8]
        self.enc = [
            [tb(dims[l], heads[l]) for _ in range(num_blocks[l])] for l in range(4)
        ]
        self.downs = [_Down(dims[l], next(ks)) for l in range(3)]
        self.ups = [_Up(dims[l + 1], next(ks)) for l in reversed(range(3))]
        # channel reducers after skip concat (levels 2 and 1; level 0 keeps 2*dim)
        self.reduce = [
            Conv2d(dims[2] * 2, dims[2], 1, 1, 0, bias=bias, key=next(ks)),
            Conv2d(dims[1] * 2, dims[1], 1, 1, 0, bias=bias, key=next(ks)),
        ]
        self.dec = [
            [tb(dims[2], heads[2]) for _ in range(num_blocks[2])],
            [tb(dims[1], heads[1]) for _ in range(num_blocks[1])],
            [tb(dims[0] * 2, heads[0]) for _ in range(num_blocks[0])],
        ]
        self.refine = [
            tb(dims[0] * 2, heads[0]) for _ in range(num_refinement_blocks)
        ]
        self.dual_pixel_task = dual_pixel_task
        if dual_pixel_task:
            self.skip_conv = Conv2d(dims[0], dims[0] * 2, 1, 1, 0, bias=bias, key=next(ks))
        self.out_conv = Conv2d(dims[0] * 2, out_channels, 3, 1, 1, bias=bias, key=next(ks))

        if pretrained is not None:
            from .convert import load_torch_checkpoint, port_restormer

            ported = port_restormer(self, load_torch_checkpoint(pretrained))
            self.__dict__.update(ported.__dict__)

    def _forward(self, x):
        emb = self.patch_embed(x)
        h = emb
        skips = []
        for l in range(3):
            for b in self.enc[l]:
                h = b(h)
            skips.append(h)
            h = self.downs[l](h)
        for b in self.enc[3]:
            h = b(h)
        # decoder
        h = self.ups[0](h)
        h = self.reduce[0](jnp.concatenate([h, skips[2]], axis=1))
        for b in self.dec[0]:
            h = b(h)
        h = self.ups[1](h)
        h = self.reduce[1](jnp.concatenate([h, skips[1]], axis=1))
        for b in self.dec[1]:
            h = b(h)
        h = self.ups[2](h)
        h = jnp.concatenate([h, skips[0]], axis=1)
        for b in self.dec[2]:
            h = b(h)
        for b in self.refine:
            h = b(h)
        if self.dual_pixel_task:
            h = h + self.skip_conv(emb)
            return self.out_conv(h)
        return self.out_conv(h) + x

    def __call__(self, x, sigma=None, **kwargs):
        H, W = x.shape[-2:]
        if H % 8 or W % 8:
            return test_pad(self._forward, x, modulo=8)
        return self._forward(x)

    def forward_restormer(self, x):
        """Raw Restormer forward — input sides must be divisible by 8
        (reference restormer.py:347)."""
        if x.shape[-2] % 8 or x.shape[-1] % 8:
            raise ValueError(
                "Image spatial dim is not divisible by 8. Spatial dim : "
                f"({x.shape[-2]},{x.shape[-1]})")
        return self._forward(x)

    # -- pretrained-config validators (reference restormer.py:411-539) ----

    @staticmethod
    def _is_standard_network(dim, num_blocks, num_refinement_blocks, heads,
                             ffn_expansion_factor, bias):
        if dim != 48:
            raise ValueError(f"EXPECTED dim == 48, INSTEAD of {dim}")
        if list(num_blocks) != [4, 6, 6, 8]:
            raise ValueError(
                f"EXPECTED num_blocks == [4, 6, 6, 8], INSTEAD of {list(num_blocks)}")
        if num_refinement_blocks != 4:
            raise ValueError(
                f"EXPECTED num_refinement_blocks == 4, INSTEAD of {num_refinement_blocks}")
        if list(heads) != [1, 2, 4, 8]:
            raise ValueError(f"EXPECTED heads == [1, 2, 4, 8], INSTEAD of {list(heads)}")
        if abs(ffn_expansion_factor - 2.66) > 1e-9:
            raise ValueError(
                f"EXPECTED ffn_expansion_factor == 2.66, INSTEAD of {ffn_expansion_factor}")
        if bias:
            raise ValueError(f"EXPECTED bias == False, INSTEAD of {bias}")

    def is_standard_denoising_network(self, in_channels, out_channels, dim,
                                      num_blocks, num_refinement_blocks, heads,
                                      ffn_expansion_factor, bias,
                                      LayerNorm_type, dual_pixel_task):
        """Validate params against the published denoising checkpoints
        (reference restormer.py:411)."""
        if in_channels not in (1, 3):
            raise ValueError(
                f"Standard denoising / EXPECTED in_channels == 1 or 3, INSTEAD of {in_channels}")
        if out_channels != in_channels:
            raise ValueError(
                f"Standard denoising / EXPECTED out_channels == in_channels, INSTEAD of {out_channels}")
        self._is_standard_network(dim, num_blocks, num_refinement_blocks,
                                  heads, ffn_expansion_factor, bias)
        if LayerNorm_type != "BiasFree":
            raise ValueError(
                f"Standard denoising / EXPECTED LayerNorm_type == 'BiasFree', INSTEAD of {LayerNorm_type}")
        if dual_pixel_task:
            raise ValueError(
                f"Standard denoising / EXPECTED dual_pixel_task == False, INSTEAD of {dual_pixel_task}")

    def is_standard_deraining_network(self, in_channels, out_channels, dim,
                                      num_blocks, num_refinement_blocks, heads,
                                      ffn_expansion_factor, bias,
                                      LayerNorm_type, dual_pixel_task):
        """Validate params against the published deraining checkpoint
        (reference restormer.py:445)."""
        if in_channels != 3:
            raise ValueError(
                f"Standard deraining / EXPECTED in_channels == 3, INSTEAD of {in_channels}")
        if out_channels != 3:
            raise ValueError(
                f"Standard deraining / EXPECTED out_channels == 3, INSTEAD of {out_channels}")
        self._is_standard_network(dim, num_blocks, num_refinement_blocks,
                                  heads, ffn_expansion_factor, bias)
        if LayerNorm_type != "WithBias":
            raise ValueError(
                f"Standard deraining / EXPECTED LayerNorm_type == 'WithBias', INSTEAD of {LayerNorm_type}")
        if dual_pixel_task:
            raise ValueError(
                f"Standard deraining / EXPECTED dual_pixel_task == False, INSTEAD of {dual_pixel_task}")

    def is_standard_deblurring_network(self, in_channels, out_channels, dim,
                                       num_blocks, num_refinement_blocks, heads,
                                       ffn_expansion_factor, bias,
                                       LayerNorm_type, dual_pixel_task):
        """Validate params against the published motion/defocus-deblurring
        checkpoints (reference restormer.py:479)."""
        if in_channels not in (3, 6):
            raise ValueError(
                f"Standard deblurring / EXPECTED in_channels == 3 or 6, INSTEAD of {in_channels}")
        if out_channels != 3:
            raise ValueError(
                f"Standard deblurring / EXPECTED out_channels == 3, INSTEAD of {out_channels}")
        self._is_standard_network(dim, num_blocks, num_refinement_blocks,
                                  heads, ffn_expansion_factor, bias)
        if LayerNorm_type != "WithBias":
            raise ValueError(
                f"Standard deblurring / EXPECTED LayerNorm_type == 'WithBias', INSTEAD of {LayerNorm_type}")
