"""CNN denoisers: FFDNet, SRResNet, AutoEncoder, DScCP
(reference deepinv/models/{ffdnet.py,srresnet.py,ae.py,dsccp.py}).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..core import Module
from .base import Denoiser, Reconstructor, handle_sigma
from .layers import (Conv2d, ConvTranspose2d, Sequential, PixelShuffle,
                     BatchNorm2d, he_init)

__all__ = ["FFDNet", "SRResNet", "AutoEncoder", "DScCP"]


class FFDNet(Denoiser):
    """FFDNet (reference ffdnet.py:128): pixel-unshuffle by 2, concat noise
    map, 15 conv layers, pixel-shuffle back."""

    def __init__(self, in_channels: int = 3, out_channels: int = 3, nf: int = 64, depth: int = 15, key=None):
        key = key if key is not None else jax.random.key(0)
        ks = iter(jax.random.split(key, depth + 2))
        cin = in_channels * 4 + 1
        layers = [Conv2d(cin, nf, 3, 1, 1, key=next(ks))]
        for _ in range(depth - 2):
            layers.append(Conv2d(nf, nf, 3, 1, 1, key=next(ks)))
        layers.append(Conv2d(nf, out_channels * 4, 3, 1, 1, key=next(ks)))
        self.layers = layers

    @staticmethod
    def _unshuffle(x):
        B, C, H, W = x.shape
        x = x.reshape(B, C, H // 2, 2, W // 2, 2)
        return jnp.transpose(x, (0, 1, 3, 5, 2, 4)).reshape(B, C * 4, H // 2, W // 2)

    @staticmethod
    def _shuffle(x):
        B, C4, H, W = x.shape
        C = C4 // 4
        x = x.reshape(B, C, 2, 2, H, W)
        return jnp.transpose(x, (0, 1, 4, 2, 5, 3)).reshape(B, C, H * 2, W * 2)

    def __call__(self, x, sigma=0.05, **kwargs):
        H, W = x.shape[-2:]
        ph, pw = H % 2, W % 2
        xp = jnp.pad(x, [(0, 0), (0, 0), (0, ph), (0, pw)], mode="edge")
        u = self._unshuffle(xp)
        sig = handle_sigma(sigma, u)[:, :1]
        h = jnp.concatenate([u, sig], axis=1)
        for i, l in enumerate(self.layers):
            h = l(h)
            if i < len(self.layers) - 1:
                h = jax.nn.relu(h)
        out = self._shuffle(h)
        return out[..., :H, :W]


class PReLU(Module):
    """torch nn.PReLU: max(0,x) + w*min(0,x), one shared weight by default."""

    def __init__(self, num_parameters: int = 1, init: float = 0.25):
        self.weight = jnp.full((num_parameters,), init)

    def __call__(self, x):
        w = self.weight
        if w.shape[0] > 1:
            w = w[None, :, None, None]
        return jnp.maximum(x, 0) + w * jnp.minimum(x, 0)


class _InstanceNorm2d(Module):
    """torch nn.InstanceNorm2d defaults: no affine, per-instance stats."""

    def __init__(self, num_features: int, eps: float = 1e-5):
        self.eps = eps

    def __call__(self, x):
        mu = jnp.mean(x, axis=(2, 3), keepdims=True)
        var = jnp.var(x, axis=(2, 3), keepdims=True)
        return (x - mu) / jnp.sqrt(var + self.eps)


class _LayerNorm2d(Module):
    """Channel layernorm (reference srresnet.py:172)."""

    def __init__(self, num_channels: int, eps: float = 1e-6):
        self.weight = jnp.ones((num_channels,))
        self.bias = jnp.zeros((num_channels,))
        self.eps = eps

    def __call__(self, x):
        mu = jnp.mean(x, axis=1, keepdims=True)
        var = jnp.mean((x - mu) ** 2, axis=1, keepdims=True)
        x = (x - mu) / jnp.sqrt(var + self.eps)
        return self.weight[None, :, None, None] * x + self.bias[None, :, None, None]


class _Identity(Module):
    def __init__(self, num_features: int = 0):
        pass

    def __call__(self, x):
        return x


_SR_NORMS = {"batch_norm": BatchNorm2d, "instance_norm": _InstanceNorm2d,
             "layer_norm": _LayerNorm2d, None: _Identity}


class _SRBlock(Module):
    """Conv-Norm-Act-Conv-Norm residual block (reference srresnet.py:156)."""

    def __init__(self, feats, norm, key):
        k1, k2 = jax.random.split(key)
        self.conv1 = Conv2d(feats, feats, 3, 1, 1, key=k1)
        self.n1 = _SR_NORMS[norm](feats)
        self.act = PReLU()
        self.conv2 = Conv2d(feats, feats, 3, 1, 1, key=k2)
        self.n2 = _SR_NORMS[norm](feats)

    def __call__(self, x):
        return x + self.n2(self.conv2(self.act(self.n1(self.conv1(x)))))


class SRResNet(Reconstructor):
    """SRResNet super-resolution network (reference srresnet.py:20) —
    bit-faithful: the published srresnet_ckpt.pth.tar (RGB 4x, DIV2K,
    final_relu=True) ports via ``convert.port_srresnet``.

    :param norm: 'batch_norm' | 'instance_norm' | 'layer_norm' | None.
    :param final_relu: clamp output to be non-negative (required by the
        published weights).
    """

    def __init__(self, num_blocks: int = 16, im_c: int = 3, feats: int = 64,
                 upscale: int = 4, norm: str | None = "batch_norm",
                 final_kernel_size: int = 9, final_relu: bool = False,
                 pretrained=None, key=None):
        import math as _math

        if upscale < 1 or (upscale & (upscale - 1)) != 0:
            raise ValueError(f"upscale must be a power of two, got {upscale}")
        if final_kernel_size % 2 == 0:
            raise ValueError(f"final_kernel_size must be odd, got {final_kernel_size}")
        key = key if key is not None else jax.random.key(0)
        ks = iter(jax.random.split(key, 2 * num_blocks + 8))
        self.fe_conv = Conv2d(im_c, feats, 9, 1, 4, key=next(ks))
        self.fe_act = PReLU()
        self.blocks = [_SRBlock(feats, norm, next(ks)) for _ in range(num_blocks)]
        self.block_conv = Conv2d(feats, feats, 3, 1, 1, key=next(ks))
        self.block_norm = _SR_NORMS[norm](feats)
        n_up = int(_math.log2(upscale))
        self.up_convs = [Conv2d(feats, feats * 4, 3, 1, 1, key=next(ks))
                         for _ in range(n_up)]
        self.up_acts = [PReLU() for _ in range(n_up)]
        self.shuffle = PixelShuffle(2)
        p = (final_kernel_size - 1) // 2
        self.final_conv = Conv2d(feats, im_c, final_kernel_size, 1, p, key=next(ks))
        self.final_relu = final_relu

        if pretrained is not None:
            from .convert import load_torch_checkpoint, port_srresnet

            ported = port_srresnet(self, load_torch_checkpoint(pretrained))
            self.__dict__.update(ported.__dict__)

    def __call__(self, y, physics=None, **kwargs):
        lf = self.fe_act(self.fe_conv(y))
        x = lf
        for b in self.blocks:
            x = b(x)
        x = lf + self.block_norm(self.block_conv(x))
        for conv, act in zip(self.up_convs, self.up_acts):
            x = act(self.shuffle(conv(x)))
        x = self.final_conv(x)
        return jax.nn.relu(x) if self.final_relu else x


class AutoEncoder(Denoiser):
    """Fully-connected autoencoder (reference ae.py:52)."""

    def __init__(self, dim_input: int, dim_hid: int = 512, dim_mid: int = 128, residual: bool = True, key=None):
        from .layers import Linear

        key = key if key is not None else jax.random.key(0)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        self.enc1 = Linear(dim_input, dim_hid, key=k1)
        self.enc2 = Linear(dim_hid, dim_mid, key=k2)
        self.dec1 = Linear(dim_mid, dim_hid, key=k3)
        self.dec2 = Linear(dim_hid, dim_input, key=k4)
        self.residual = residual

    def __call__(self, x, sigma=None, **kwargs):
        shape = x.shape
        v = x.reshape(shape[0], -1)
        h = jax.nn.relu(self.enc1(v))
        z = jax.nn.relu(self.enc2(h))
        h = jax.nn.relu(self.dec1(z))
        out = self.dec2(h)
        if self.residual:
            out = out + v
        return out.reshape(shape)


class DScCP(Denoiser):
    """Deep strongly-convex Chambolle-Pock denoiser (reference dsccp.py:15)
    — bit-faithful: unrolled accelerated CP with *tied* analysis/synthesis
    convolutions (the transpose conv shares the conv kernel), per-layer
    ``mu`` and power-method stepsizes; ckpt_dsccp.pth.tar ports via
    ``convert.port_dsccp``.

    The per-layer operator norm is a fixed-50-iteration power method (the
    reference iterates to 1e-4 from a random start); statically unrolled by
    ``lax.fori_loop`` so the forward stays one XLA program.
    """

    def __init__(self, depth: int = 20, n_channels_per_layer: int = 64,
                 in_channels: int = 3, pretrained=None, key=None):
        key = key if key is not None else jax.random.key(0)
        ks = iter(jax.random.split(key, depth + 1))
        nf = n_channels_per_layer
        # tied weights: conv[2k] OIHW (nf, C, 3, 3); conv[2k+1] is its adjoint
        self.weights = [
            he_init(next(ks), (nf, in_channels, 3, 3), in_channels * 9)
            for _ in range(depth)
        ]
        self.depth = depth
        self.mu = jnp.ones((depth,))
        self.power_iters = 50
        if pretrained is not None:
            from .convert import load_torch_checkpoint, port_dsccp

            ported = port_dsccp(self, load_torch_checkpoint(pretrained))
            self.__dict__.update(ported.__dict__)

    @staticmethod
    def _analysis(w, x):
        return lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1)] * 2,
            dimension_numbers=("NCHW", "OIHW", "NCHW"))

    @staticmethod
    def _synthesis(w, u):
        # torch ConvTranspose2d(u, w, padding=1) == conv with the swapped,
        # spatially flipped kernel
        wt = jnp.transpose(w, (1, 0, 2, 3))[:, :, ::-1, ::-1]
        return lax.conv_general_dilated(
            u, wt, (1, 1), [(1, 1)] * 2,
            dimension_numbers=("NCHW", "OIHW", "NCHW"))

    def _op_norm(self, w, shape, key):
        """||K^T K|| by fixed-iteration power method (reference dsccp.py:130)."""
        x0 = jax.random.normal(key, shape)
        x0 = x0 / jnp.linalg.norm(x0.reshape(-1))

        def body(_, carry):
            xt, _ = carry
            xt = self._synthesis(w, self._analysis(w, xt))
            val = jnp.linalg.norm(xt.reshape(-1))
            return xt / val, val

        _, val = lax.fori_loop(0, self.power_iters, body, (x0, jnp.array(1.0)))
        return val

    def __call__(self, x, sigma=0.03, key=None, **kwargs):
        from ..core.rng import ensure_key

        key = ensure_key(key, 0)
        sig = handle_sigma(sigma, x)[:, :, :1, :1]  # (B,1,1,1)
        x_prev = x
        x_curr = x
        u = self._analysis(self.weights[0], x)
        gamma = 1.0
        keys = jax.random.split(key, self.depth)
        for k in range(self.depth):
            tau = 0.99 / self._op_norm(self.weights[k], x.shape, keys[k])
            # reference detaches mu here (dsccp.py uses self.mu.data[k]), so
            # no gradient flows to mu through the relaxation coefficient
            alphak = 1.0 / jnp.sqrt(
                1 + 2 * gamma * jax.lax.stop_gradient(self.mu[k])
            )
            u_ = u + tau / self.mu[k] * self._analysis(
                self.weights[k], (1 + alphak) * x_curr - alphak * x_prev)
            u = jnp.clip(u_, -(sig**2), sig**2)
            x_ = ((self.mu[k] / (self.mu[k] + 1)) * x
                  + (1 / (1 + self.mu[k])) * x_curr
                  - (self.mu[k] / (self.mu[k] + 1)) * self._synthesis(self.weights[k], u))
            x_next = jnp.clip(x_, 0.0, 1.0)
            x_prev = x_curr
            x_curr = x_next
        return x_curr
