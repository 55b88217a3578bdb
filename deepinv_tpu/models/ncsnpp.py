"""NCSN++ / DDPM++ score UNet with EDM preconditioning (reference
deepinv/models/ncsnpp.py:18 + models/utils.py:165-448; upstream
NVlabs/edm SongUNet) — bit-faithful port.

Same module tree as the reference, so the published EDM checkpoints
(edm-ffhq-64x64-uncond-ve.pt, edm-cifar10-32x32-uncond-vp.pt, ...) port
leaf-for-leaf via ``convert.port_ncsnpp``
(tests/test_weight_porting.py).

TPU notes: the resample filters are tiny depthwise (transposed) convs that
XLA fuses with the adjacent 3x3 convs; attention is one batched
(HW x HW) matmul per resolution in the attn list. Dropout is an
inference-mode identity.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..core import Module
from .base import Denoiser, handle_sigma

__all__ = ["NCSNpp"]


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _xavier_uniform(key, shape, fan_in, fan_out, gain=1.0):
    lim = math.sqrt(6.0 / (fan_in + fan_out))
    return gain * jax.random.uniform(key, shape, minval=-lim, maxval=lim)


class _GroupNorm(Module):
    def __init__(self, num_channels, num_groups=32, eps=1e-5):
        self.weight = jnp.ones((num_channels,))
        self.bias = jnp.zeros((num_channels,))
        self.num_groups = min(num_groups, num_channels)
        self.eps = eps

    def __call__(self, x):
        B, C, H, W = x.shape
        g = self.num_groups
        h = x.reshape(B, g, C // g, H, W)
        mu = jnp.mean(h, axis=(2, 3, 4), keepdims=True)
        var = jnp.var(h, axis=(2, 3, 4), keepdims=True)
        h = (h - mu) / jnp.sqrt(var + self.eps)
        h = h.reshape(B, C, H, W)
        return h * self.weight[None, :, None, None] + self.bias[None, :, None, None]


def _conv(x, w, pad):
    return lax.conv_general_dilated(
        x, w, (1, 1), [(pad, pad)] * 2,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def _depthwise_down(x, f, pad):
    C = x.shape[1]
    w = jnp.broadcast_to(f, (C, 1) + f.shape[-2:])
    return lax.conv_general_dilated(
        x, w, (2, 2), [(pad, pad)] * 2, feature_group_count=C,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def _depthwise_up(x, f4, pad):
    """torch conv_transpose2d(x, f4 per-channel, stride=2, padding=pad)."""
    C = x.shape[1]
    k = f4.shape[-1]
    w = jnp.broadcast_to(f4[..., ::-1, ::-1], (C, 1) + f4.shape[-2:])
    return lax.conv_general_dilated(
        x, w, (1, 1), [(k - 1 - pad, k - 1 - pad)] * 2,
        lhs_dilation=(2, 2), feature_group_count=C,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


class UpDownConv2d(Module):
    """Conv with optional (fused) 2x up/downsampling (reference
    models/utils.py:181, EDM Conv2d)."""

    def __init__(self, in_channels, out_channels, kernel, bias=True, up=False,
                 down=False, resample_filter=(1, 1), fused_resample=False,
                 init_weight=1.0, key=None):
        key = key if key is not None else jax.random.key(0)
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.up = up
        self.down = down
        self.fused_resample = fused_resample
        fan_in = in_channels * kernel * kernel
        fan_out = out_channels * kernel * kernel
        self.weight = (
            _xavier_uniform(key, (out_channels, in_channels, kernel, kernel),
                            fan_in, fan_out, init_weight)
            if kernel else None
        )
        self.bias = jnp.zeros((out_channels,)) if kernel and bias else None
        f = np.asarray(resample_filter, np.float32)
        f = np.outer(f, f)[None, None] / f.sum() ** 2
        self.resample_filter = jnp.asarray(f) if up or down else None

    def __call__(self, x):
        w = self.weight.astype(x.dtype) if self.weight is not None else None
        f = (self.resample_filter.astype(x.dtype)
             if self.resample_filter is not None else None)
        w_pad = w.shape[-1] // 2 if w is not None else 0
        f_pad = (f.shape[-1] - 1) // 2 if f is not None else 0

        if self.fused_resample and self.up and w is not None:
            x = _depthwise_up(x, f * 4, max(f_pad - w_pad, 0))
            x = _conv(x, w, max(w_pad - f_pad, 0))
        elif self.fused_resample and self.down and w is not None:
            x = _conv(x, w, w_pad + f_pad)
            x = _depthwise_down(x, f, 0)
        else:
            if self.up:
                x = _depthwise_up(x, f * 4, f_pad)
            if self.down:
                x = _depthwise_down(x, f, f_pad)
            if w is not None:
                x = _conv(x, w, w_pad)
        if self.bias is not None:
            x = x + self.bias.astype(x.dtype)[None, :, None, None]
        return x


class UNetBlock(Module):
    """DDPM++/NCSN++/ADM unified residual block (reference utils.py:284)."""

    def __init__(self, in_channels, out_channels, emb_channels, up=False,
                 down=False, attention=False, num_heads=None,
                 channels_per_head=64, skip_scale=1.0, eps=1e-5,
                 resample_filter=(1, 1), resample_proj=False,
                 adaptive_scale=True, attn_gain=1.0, key=None):
        ks = iter(jax.random.split(key if key is not None else jax.random.key(0), 8))
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.num_heads = (
            0 if not attention
            else (num_heads if num_heads is not None
                  else out_channels // channels_per_head))
        self.skip_scale = skip_scale
        self.adaptive_scale = adaptive_scale

        self.norm0 = _GroupNorm(in_channels, eps=eps)
        self.conv0 = UpDownConv2d(in_channels, out_channels, 3, up=up, down=down,
                                  resample_filter=resample_filter, key=next(ks))
        aff_out = out_channels * (2 if adaptive_scale else 1)
        self.affine_w = _xavier_uniform(next(ks), (aff_out, emb_channels),
                                        emb_channels, aff_out)
        self.affine_b = jnp.zeros((aff_out,))
        self.norm1 = _GroupNorm(out_channels, eps=eps)
        self.conv1 = UpDownConv2d(out_channels, out_channels, 3,
                                  init_weight=1e-5, key=next(ks))
        self.skip = None
        if out_channels != in_channels or up or down:
            kernel = 1 if resample_proj or out_channels != in_channels else 0
            self.skip = UpDownConv2d(in_channels, out_channels, kernel, up=up,
                                     down=down, resample_filter=resample_filter,
                                     key=next(ks))
        if self.num_heads:
            self.norm2 = _GroupNorm(out_channels, eps=eps)
            self.qkv = UpDownConv2d(out_channels, out_channels * 3, 1,
                                    init_weight=attn_gain, key=next(ks))
            self.proj = UpDownConv2d(out_channels, out_channels, 1,
                                     init_weight=1e-5, key=next(ks))

    def __call__(self, x, emb):
        orig = x
        x = self.conv0(_silu(self.norm0(x)))

        params = (emb @ self.affine_w.T + self.affine_b)[..., None, None].astype(x.dtype)
        if self.adaptive_scale:
            scale, shift = jnp.split(params, 2, axis=1)
            x = _silu(shift + self.norm1(x) * (scale + 1))
        else:
            x = _silu(self.norm1(x + params))

        x = self.conv1(x)
        x = x + (self.skip(orig) if self.skip is not None else orig)
        x = x * self.skip_scale

        if self.num_heads:
            B, C, H, W = x.shape
            n = B * self.num_heads
            d = C // self.num_heads
            q, k, v = jnp.moveaxis(
                self.qkv(self.norm2(x)).reshape(n, d, 3, H * W), 2, 0)
            attn = jax.nn.softmax(
                jnp.einsum("ncq,nck->nqk", q, k) / math.sqrt(d), axis=-1)
            a = jnp.einsum("nqk,nck->ncq", attn, v)
            x = self.proj(a.reshape(B, C, H, W)) + x
            x = x * self.skip_scale
        return x


class _PositionalEmbedding(Module):
    def __init__(self, num_channels, max_positions=10000, endpoint=False):
        self.num_channels = num_channels
        self.max_positions = max_positions
        self.endpoint = endpoint

    def __call__(self, x):
        n = self.num_channels // 2
        freqs = jnp.arange(n, dtype=jnp.float32)
        freqs = freqs / (n - (1 if self.endpoint else 0))
        freqs = (1 / self.max_positions) ** freqs
        x = jnp.outer(x, freqs)
        return jnp.concatenate([jnp.cos(x), jnp.sin(x)], axis=1)


class _FourierEmbedding(Module):
    def __init__(self, num_channels, scale=16, key=None):
        key = key if key is not None else jax.random.key(0)
        self.freqs = jax.random.normal(key, (num_channels // 2,)) * scale

    def __call__(self, x):
        x = jnp.outer(x, 2 * jnp.pi * self.freqs)
        return jnp.concatenate([jnp.cos(x), jnp.sin(x)], axis=1)


class NCSNpp(Denoiser):
    """NCSN++ ('ncsn') / DDPM++ ('ddpm') UNet with EDM preconditioning
    (reference ncsnpp.py:18).

    :param pretrained: path to a reference ``.pt`` checkpoint
        (EDM FFHQ/CIFAR releases re-hosted by deepinv). Loading sets
        ``pixel_std=0.5`` and the [-1,1] convention like the reference.
    """

    def __init__(self, model_type="ncsn", precondition_type="edm",
                 img_resolution=64, in_channels=3, out_channels=3,
                 label_dim=0, augment_dim=9, model_channels=128,
                 channel_mult=(1, 2, 2, 2), channel_mult_emb=4, num_blocks=4,
                 attn_resolutions=(16,), pretrained=None,
                 _was_trained_on_minus_one_one=False, pixel_std=0.75,
                 key=None, **kwargs):
        key = key if key is not None else jax.random.key(0)
        ks = iter(jax.random.split(key, 512))
        model_type = model_type.lower()
        if model_type == "ncsn":
            embedding_type, channel_mult_noise = "fourier", 2
            encoder_type, resample_filter = "residual", (1, 3, 3, 1)
        elif model_type == "ddpm":
            embedding_type, channel_mult_noise = "positional", 1
            encoder_type, resample_filter = "standard", (1, 1)
        else:
            raise ValueError(f"model_type must be 'ncsn' or 'ddpm', got {model_type}")
        self.precondition_type = precondition_type.lower()
        self.pixel_std = pixel_std
        self._was_trained_on_minus_one_one = _was_trained_on_minus_one_one

        emb_channels = model_channels * channel_mult_emb
        noise_channels = model_channels * channel_mult_noise
        block_kwargs = dict(emb_channels=emb_channels, num_heads=1,
                            skip_scale=math.sqrt(0.5), eps=1e-6,
                            resample_filter=resample_filter, resample_proj=True,
                            adaptive_scale=False, attn_gain=math.sqrt(0.2))

        self.map_noise = (
            _PositionalEmbedding(noise_channels, endpoint=True)
            if embedding_type == "positional"
            else _FourierEmbedding(noise_channels, key=next(ks)))
        self.map_label = None  # label_dim=0 in all published configs
        if label_dim:
            self.map_label_w = _xavier_uniform(
                next(ks), (noise_channels, label_dim), label_dim, noise_channels)
            self.map_label_b = jnp.zeros((noise_channels,))
            self.map_label = True
        self.label_dim = label_dim
        self.map_augment_w = (
            _xavier_uniform(next(ks), (noise_channels, augment_dim),
                            augment_dim, noise_channels)
            if augment_dim else None)
        self.map_layer0_w = _xavier_uniform(next(ks), (emb_channels, noise_channels),
                                            noise_channels, emb_channels)
        self.map_layer0_b = jnp.zeros((emb_channels,))
        self.map_layer1_w = _xavier_uniform(next(ks), (emb_channels, emb_channels),
                                            emb_channels, emb_channels)
        self.map_layer1_b = jnp.zeros((emb_channels,))

        # Encoder (ordered name list mirrors the reference ModuleDict).
        enc_names, enc_blocks = [], []
        cout = in_channels
        caux = in_channels
        for level, mult in enumerate(channel_mult):
            res = img_resolution >> level
            if level == 0:
                cin, cout = cout, model_channels
                enc_names.append(f"{res}x{res}_conv")
                enc_blocks.append(UpDownConv2d(cin, cout, 3, key=next(ks)))
            else:
                enc_names.append(f"{res}x{res}_down")
                enc_blocks.append(UNetBlock(cout, cout, down=True,
                                            key=next(ks), **block_kwargs))
                if encoder_type == "residual":
                    enc_names.append(f"{res}x{res}_aux_residual")
                    enc_blocks.append(UpDownConv2d(
                        caux, cout, 3, down=True, resample_filter=resample_filter,
                        fused_resample=True, key=next(ks)))
                    caux = cout
            for idx in range(num_blocks):
                cin, cout = cout, model_channels * mult
                enc_names.append(f"{res}x{res}_block{idx}")
                enc_blocks.append(UNetBlock(cin, cout,
                                            attention=(res in attn_resolutions),
                                            key=next(ks), **block_kwargs))
        self.enc_names = enc_names
        self.enc_blocks = enc_blocks
        skips = [b.out_channels for n, b in zip(enc_names, enc_blocks)
                 if "aux" not in n]

        dec_names, dec_blocks = [], []
        for level, mult in reversed(list(enumerate(channel_mult))):
            res = img_resolution >> level
            if level == len(channel_mult) - 1:
                dec_names.append(f"{res}x{res}_in0")
                dec_blocks.append(UNetBlock(cout, cout, attention=True,
                                            key=next(ks), **block_kwargs))
                dec_names.append(f"{res}x{res}_in1")
                dec_blocks.append(UNetBlock(cout, cout, key=next(ks), **block_kwargs))
            else:
                dec_names.append(f"{res}x{res}_up")
                dec_blocks.append(UNetBlock(cout, cout, up=True,
                                            key=next(ks), **block_kwargs))
            for idx in range(num_blocks + 1):
                cin = cout + skips.pop()
                cout = model_channels * mult
                attn = idx == num_blocks and res in attn_resolutions
                dec_names.append(f"{res}x{res}_block{idx}")
                dec_blocks.append(UNetBlock(cin, cout, attention=attn,
                                            key=next(ks), **block_kwargs))
            if level == 0:
                dec_names.append(f"{res}x{res}_aux_norm")
                dec_blocks.append(_GroupNorm(cout, eps=1e-6))
                dec_names.append(f"{res}x{res}_aux_conv")
                dec_blocks.append(UpDownConv2d(cout, out_channels, 3,
                                               init_weight=1e-5, key=next(ks)))
        self.dec_names = dec_names
        self.dec_blocks = dec_blocks

        if pretrained is not None:
            from .convert import load_torch_checkpoint, port_ncsnpp

            ported = port_ncsnpp(self, load_torch_checkpoint(pretrained))
            self.__dict__.update(ported.__dict__)
            # published EDM checkpoints are [-1,1] models with pixel_std 0.5
            self.pixel_std = 0.5
            self._was_trained_on_minus_one_one = True

    def forward_unet(self, x, sigma, class_labels=None, augment_labels=None):
        emb = self.map_noise(sigma)
        B = emb.shape[0]
        emb = emb.reshape(B, 2, -1)[:, ::-1, :].reshape(B, -1)  # swap sin/cos
        if self.map_label is not None and class_labels is not None:
            emb = emb + (class_labels * math.sqrt(self.label_dim)) @ self.map_label_w.T \
                + self.map_label_b
        if self.map_augment_w is not None and augment_labels is not None:
            emb = emb + augment_labels @ self.map_augment_w.T
        emb = _silu(emb @ self.map_layer0_w.T + self.map_layer0_b)
        emb = _silu(emb @ self.map_layer1_w.T + self.map_layer1_b)

        skips = []
        aux = x
        for name, block in zip(self.enc_names, self.enc_blocks):
            if "aux_residual" in name:
                x = aux = (x + block(aux)) / math.sqrt(2)
                skips[-1] = x
            else:
                x = block(x, emb) if isinstance(block, UNetBlock) else block(x)
                skips.append(x)

        aux = None
        tmp = None
        for name, block in zip(self.dec_names, self.dec_blocks):
            if "aux_norm" in name:
                tmp = block(x)
            elif "aux_conv" in name:
                tmp = block(_silu(tmp))
                aux = tmp if aux is None else tmp + aux
            else:
                if x.shape[1] != block.in_channels:
                    x = jnp.concatenate([x, skips.pop()], axis=1)
                x = block(x, emb)
        return aux

    def __call__(self, x, sigma, class_labels=None, augment_labels=None,
                 input_in_minus_one_one=False, **kwargs):
        sigma = handle_sigma(sigma, x)[:, :, :1, :1]  # (B,1,1,1)
        if self._was_trained_on_minus_one_one and not input_in_minus_one_one:
            x = (x - 0.5) * 2.0
            sigma = sigma * 2.0
        if self.precondition_type == "edm":
            s2 = sigma**2
            c_skip = self.pixel_std**2 / (s2 + self.pixel_std**2)
            c_out = sigma * self.pixel_std / jnp.sqrt(s2 + self.pixel_std**2)
            c_in = 1 / jnp.sqrt(self.pixel_std**2 + s2)
            c_noise = jnp.log(sigma) / 4
        elif self.precondition_type in ("ve-baseline", "baseline_ve"):
            c_skip, c_out, c_in = 1.0, sigma, 1.0
            c_noise = jnp.log(sigma / 2)
        else:
            raise NotImplementedError(self.precondition_type)
        F_x = self.forward_unet(c_in * x, c_noise.reshape(-1),
                                class_labels=class_labels,
                                augment_labels=augment_labels)
        D_x = c_skip * x + c_out * F_x
        if self._was_trained_on_minus_one_one and not input_in_minus_one_one:
            return (D_x + 1.0) / 2.0
        return D_x
