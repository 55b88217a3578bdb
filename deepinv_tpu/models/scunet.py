"""SCUNet — Swin-Conv UNet denoiser (reference deepinv/models/scunet.py:284,
491 LoC; upstream cszn/SCUNet) — bit-faithful port.

Each stage mixes a residual conv branch with a (shifted-)window attention
branch behind 1x1 mixing convs (ConvTransBlock). Same module tree as the
reference, so the published ``scunet_color_real_psnr.pth`` checkpoint ports
leaf-for-leaf via ``convert.port_scunet`` (verified in
tests/test_weight_porting.py).

TPU notes: windows fold into the batch dimension (batched p² x p² matmuls on
the MXU); the SW-MSA mask is a static numpy table, so each input shape traces
to one XLA program. DropPath is an inference-mode identity.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core import Module
from .base import Denoiser
from .layers import Conv2d, ConvTranspose2d, Linear

__all__ = ["SCUNet"]


class _LayerNorm(Module):
    def __init__(self, dim):
        self.weight = jnp.ones((dim,))
        self.bias = jnp.zeros((dim,))

    def __call__(self, x):
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        return (x - mu) / jnp.sqrt(var + 1e-5) * self.weight + self.bias


def _sw_mask(h_windows, w_windows, p, shift):
    """SW-MSA boolean mask (reference scunet.py:42): True = masked. Only the
    last window row/col contains wrapped pixels after the cyclic shift."""
    m = np.zeros((h_windows, w_windows, p, p, p, p), dtype=bool)
    s = p - shift
    m[-1, :, :s, :, s:, :] = True
    m[-1, :, s:, :, :s, :] = True
    m[:, -1, :, :s, :, s:] = True
    m[:, -1, :, s:, :, :s] = True
    return jnp.asarray(
        m.reshape(h_windows * w_windows, p * p, p * p))  # (nw, p², p²)


class _WMSA(Module):
    """Window multi-head self-attention (reference scunet.py:10)."""

    def __init__(self, input_dim, output_dim, head_dim, window_size, type, key=None):
        k1, k2 = jax.random.split(key if key is not None else jax.random.key(0))
        self.input_dim = input_dim
        self.head_dim = head_dim
        self.n_heads = input_dim // head_dim
        self.window_size = window_size
        self.type = type
        self.embedding_layer = Linear(input_dim, 3 * input_dim, key=k1)
        self.linear = Linear(input_dim, output_dim, key=k2)
        w = window_size
        # stored as (n_heads, 2w-1, 2w-1) like the reference post-transpose
        self.relative_position_params = jnp.zeros((self.n_heads, 2 * w - 1, 2 * w - 1))

    @property
    def _relation(self):
        w = self.window_size
        cord = np.array([[i, j] for i in range(w) for j in range(w)])
        return cord[:, None, :] - cord[None, :, :] + w - 1  # (p², p², 2)

    def __call__(self, x):
        # x: (B, H, W, C)
        w = self.window_size
        if self.type != "W":
            x = jnp.roll(x, (-(w // 2), -(w // 2)), axis=(1, 2))
        B, H, W, C = x.shape
        h_windows, w_windows = H // w, W // w
        x = x.reshape(B, h_windows, w, w_windows, w, C)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(
            B, h_windows * w_windows, w * w, C)

        qkv = self.embedding_layer(x)  # (B, nw, p², 3*C)
        hd, nh = self.head_dim, self.n_heads
        # einops "(threeh c)" split: head-major over 3h groups of head_dim
        qkv = qkv.reshape(B, qkv.shape[1], w * w, 3 * nh, hd)
        qkv = jnp.moveaxis(qkv, 3, 0)  # (3h, B, nw, p², hd)
        q, k, v = qkv[:nh], qkv[nh:2 * nh], qkv[2 * nh:]

        rel = self._relation
        bias = self.relative_position_params[:, rel[..., 0], rel[..., 1]]  # (h, p², p²)
        attn = (q @ jnp.moveaxis(k, -1, -2)) * (hd ** -0.5)
        attn = attn + bias[:, None, None]
        if self.type != "W":
            mask = _sw_mask(h_windows, w_windows, w, w // 2)
            attn = jnp.where(mask[None, None], -jnp.inf, attn)
        attn = jax.nn.softmax(attn, axis=-1)
        out = attn @ v  # (h, B, nw, p², hd)
        out = jnp.moveaxis(out, 0, -2).reshape(
            B, h_windows * w_windows, w * w, nh * hd)
        out = self.linear(out)

        out = out.reshape(B, h_windows, w_windows, w, w, -1)
        out = jnp.transpose(out, (0, 1, 3, 2, 4, 5)).reshape(B, H, W, -1)
        if self.type != "W":
            out = jnp.roll(out, (w // 2, w // 2), axis=(1, 2))
        return out


class _Block(Module):
    """Swin block: LN-WMSA and LN-MLP residuals (reference scunet.py:171)."""

    def __init__(self, input_dim, output_dim, head_dim, window_size, type,
                 input_resolution=None, key=None):
        k1, k2, k3 = jax.random.split(key if key is not None else jax.random.key(0), 3)
        if input_resolution <= window_size:
            type = "W"
        self.ln1 = _LayerNorm(input_dim)
        self.msa = _WMSA(input_dim, input_dim, head_dim, window_size, type, k1)
        self.ln2 = _LayerNorm(input_dim)
        self.mlp_fc1 = Linear(input_dim, 4 * input_dim, key=k2)
        self.mlp_fc2 = Linear(4 * input_dim, output_dim, key=k3)

    def __call__(self, x):
        x = x + self.msa(self.ln1(x))
        h = jax.nn.gelu(self.mlp_fc1(self.ln2(x)), approximate=False)
        return x + self.mlp_fc2(h)


class _ConvTransBlock(Module):
    """Parallel conv + transformer branches behind 1x1 mixers
    (reference scunet.py:210)."""

    def __init__(self, conv_dim, trans_dim, head_dim, window_size, type,
                 input_resolution=None, key=None):
        ks = jax.random.split(key if key is not None else jax.random.key(0), 5)
        self.conv_dim = conv_dim
        self.trans_dim = trans_dim
        if input_resolution <= window_size:
            type = "W"
        self.trans_block = _Block(trans_dim, trans_dim, head_dim, window_size,
                                  type, input_resolution, ks[0])
        d = conv_dim + trans_dim
        self.conv1_1 = Conv2d(d, d, 1, 1, 0, bias=True, key=ks[1])
        self.conv1_2 = Conv2d(d, d, 1, 1, 0, bias=True, key=ks[2])
        self.conv_a = Conv2d(conv_dim, conv_dim, 3, 1, 1, bias=False, key=ks[3])
        self.conv_b = Conv2d(conv_dim, conv_dim, 3, 1, 1, bias=False, key=ks[4])

    def __call__(self, x):
        h = self.conv1_1(x)
        conv_x, trans_x = h[:, : self.conv_dim], h[:, self.conv_dim:]
        conv_x = self.conv_b(jax.nn.relu(self.conv_a(conv_x))) + conv_x
        t = jnp.transpose(trans_x, (0, 2, 3, 1))
        t = self.trans_block(t)
        trans_x = jnp.transpose(t, (0, 3, 1, 2))
        res = self.conv1_2(jnp.concatenate([conv_x, trans_x], axis=1))
        return x + res


class SCUNet(Denoiser):
    """SCUNet (reference scunet.py:284). Blind denoiser: ``sigma`` unused.

    :param in_nc: input channels.
    :param config: ConvTransBlocks per stage (7 stages).
    :param dim: base width.
    :param input_resolution: training resolution (disables shifts on small
        stages exactly like the reference).
    :param pretrained: path to a reference ``.pth`` checkpoint.
    """

    def __init__(self, in_nc: int = 3, config=(4, 4, 4, 4, 4, 4, 4),
                 dim: int = 64, input_resolution: int = 256,
                 head_dim: int = 32, window_size: int = 8,
                 pretrained=None, key=None):
        key = key if key is not None else jax.random.key(0)
        ks = iter(jax.random.split(key, sum(config) + 16))
        self.config = tuple(config)
        self.dim = dim
        head_dim, wsz = head_dim, window_size  # reference hardcodes 32, 8

        def blocks(n, cdim, res):
            return [
                _ConvTransBlock(cdim, cdim, head_dim, wsz,
                                "W" if not i % 2 else "SW", res, next(ks))
                for i in range(n)
            ]

        r = input_resolution
        self.m_head = Conv2d(in_nc, dim, 3, 1, 1, bias=False, key=next(ks))
        self.m_down1 = blocks(config[0], dim // 2, r) + [
            Conv2d(dim, 2 * dim, 2, 2, 0, bias=False, key=next(ks))]
        self.m_down2 = blocks(config[1], dim, r // 2) + [
            Conv2d(2 * dim, 4 * dim, 2, 2, 0, bias=False, key=next(ks))]
        self.m_down3 = blocks(config[2], 2 * dim, r // 4) + [
            Conv2d(4 * dim, 8 * dim, 2, 2, 0, bias=False, key=next(ks))]
        self.m_body = blocks(config[3], 4 * dim, r // 8)
        self.m_up3 = [ConvTranspose2d(8 * dim, 4 * dim, 2, 2, 0, bias=False, key=next(ks))
                      ] + blocks(config[4], 2 * dim, r // 4)
        self.m_up2 = [ConvTranspose2d(4 * dim, 2 * dim, 2, 2, 0, bias=False, key=next(ks))
                      ] + blocks(config[5], dim, r // 2)
        self.m_up1 = [ConvTranspose2d(2 * dim, dim, 2, 2, 0, bias=False, key=next(ks))
                      ] + blocks(config[6], dim // 2, r)
        self.m_tail = Conv2d(dim, in_nc, 3, 1, 1, bias=False, key=next(ks))

        if pretrained is not None:
            from .convert import load_torch_checkpoint, port_scunet

            ported = port_scunet(self, load_torch_checkpoint(pretrained))
            self.__dict__.update(ported.__dict__)

    @staticmethod
    def _seq(mods, x):
        for m in mods:
            x = m(x)
        return x

    def forward_scunet(self, x0):
        """Padded 7-stage forward (reference scunet.py:456): replicate-pad
        bottom/right to a multiple of 64, run head/downs/body/ups/tail with
        the UNet skip sums, and crop back."""
        return self(x0)

    def __call__(self, x, sigma=None, **kwargs):
        h, w = x.shape[-2:]
        pb, pr = (-h) % 64, (-w) % 64
        if pb or pr:  # replicate-pad bottom/right (reference scunet.py:458)
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pb), (0, pr)), mode="edge")
        x1 = self.m_head(x)
        x2 = self._seq(self.m_down1, x1)
        x3 = self._seq(self.m_down2, x2)
        x4 = self._seq(self.m_down3, x3)
        z = self._seq(self.m_body, x4)
        z = self._seq(self.m_up3, z + x4)
        z = self._seq(self.m_up2, z + x3)
        z = self._seq(self.m_up1, z + x2)
        z = self.m_tail(z + x1)
        return z[..., :h, :w]
