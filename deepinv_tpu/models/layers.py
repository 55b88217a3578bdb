"""NN building blocks as pytree Modules.

Weight layout is torch-compatible (conv weights OIHW, linear (out, in)) so
pretrained reference checkpoints map leaf-for-leaf
(deepinv weights are hosted per-model on HuggingFace — models/utils.py:39).
XLA performs its own layout assignment on TPU, so keeping the logical OIHW
layout costs nothing while making weight porting a pure tree rename.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax import lax

from ..core import Module

__all__ = [
    "Conv2d",
    "ConvTranspose2d",
    "Linear",
    "Sequential",
    "ReLU",
    "LeakyReLU",
    "GELU",
    "Identity",
    "AvgPool2d",
    "MaxPool2d",
    "UpsampleNearest",
    "PixelShuffle",
    "BatchNorm2d",
    "he_init",
]


# Internal conv layout: "nchw" (logical, XLA picks layouts) or "nhwc"
# (explicit transpose sandwich). Microbenchmarks favor nhwc for deep
# uniform-width stacks; real encoder-decoders measured faster with nchw on
# the v5e bench, so nchw is the default.
CONV_LAYOUT = "nchw"

# Conv accumulation/output dtype policy. "f32": request f32 conv output then
# round to the activation dtype (safest). "native": emit the conv directly in
# the activation dtype — the MXU still accumulates partial products in f32
# internally, but the result is rounded once per conv instead of being
# materialized as an f32 tensor, halving HBM write traffic for bf16 nets.
CONV_ACCUM = "native"


def _conv_out_dtype(x):
    return jnp.float32 if CONV_ACCUM == "f32" else x.dtype


def he_init(key, shape, fan_in, dtype=jnp.float32):
    """Kaiming-normal initialization (fan-in)."""
    std = math.sqrt(2.0 / fan_in)
    return jax.random.normal(key, shape, dtype) * std


class Conv2d(Module):
    """2D convolution, NCHW / OIHW (torch-compatible weights)."""

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        kernel_size: int = 3,
        stride: int = 1,
        padding: int = 1,
        bias: bool = True,
        groups: int = 1,
        key=None,
    ):
        key = key if key is not None else jax.random.key(0)
        k = kernel_size
        fan_in = in_channels // groups * k * k
        self.weight = he_init(key, (out_channels, in_channels // groups, k, k), fan_in)
        self.bias = jnp.zeros((out_channels,)) if bias else None
        self.stride = stride
        self.padding = padding
        self.groups = groups

    def __call__(self, x):
        if CONV_LAYOUT == "nhwc":
            # NHWC internally: pure conv stacks run ~1.4x faster on TPU and
            # XLA cancels adjacent transpose pairs between layers
            xh = jnp.transpose(x, (0, 2, 3, 1))
            wh = jnp.transpose(self.weight.astype(x.dtype), (2, 3, 1, 0))
            out = lax.conv_general_dilated(
                xh,
                wh,
                window_strides=(self.stride, self.stride),
                padding=[(self.padding, self.padding)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.groups,
                preferred_element_type=_conv_out_dtype(x),
            ).astype(x.dtype)
            if self.bias is not None:
                out = out + self.bias.astype(x.dtype)
            return jnp.transpose(out, (0, 3, 1, 2))
        out = lax.conv_general_dilated(
            x,
            self.weight.astype(x.dtype),
            window_strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=self.groups,
            preferred_element_type=_conv_out_dtype(x),
        ).astype(x.dtype)
        if self.bias is not None:
            out = out + self.bias.astype(x.dtype)[None, :, None, None]
        return out


class ConvTranspose2d(Module):
    """2D transposed convolution matching torch semantics (IOHW weights)."""

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        kernel_size: int = 2,
        stride: int = 2,
        padding: int = 0,
        bias: bool = True,
        key=None,
    ):
        key = key if key is not None else jax.random.key(0)
        k = kernel_size
        fan_in = in_channels * k * k
        # torch layout: (in, out, kH, kW)
        self.weight = he_init(key, (in_channels, out_channels, k, k), fan_in)
        self.bias = jnp.zeros((out_channels,)) if bias else None
        self.stride = stride
        self.padding = padding
        self.kernel_size = k

    def __call__(self, x):
        # matches torch's conv_transpose2d exactly: gradient-of-conv kernel
        # (transpose_kernel) with full padding shrunk by the torch padding
        p = self.kernel_size - 1 - self.padding
        if CONV_LAYOUT == "nhwc":
            xh = jnp.transpose(x, (0, 2, 3, 1))
            wh = jnp.transpose(self.weight.astype(x.dtype), (2, 3, 1, 0))
            out = lax.conv_transpose(
                xh,
                wh,
                strides=(self.stride, self.stride),
                padding=[(p, p)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                transpose_kernel=True,
            ).astype(x.dtype)
            if self.bias is not None:
                out = out + self.bias.astype(x.dtype)
            return jnp.transpose(out, (0, 3, 1, 2))
        out = lax.conv_transpose(
            x,
            self.weight.astype(x.dtype),
            strides=(self.stride, self.stride),
            padding=[(p, p)] * 2,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            transpose_kernel=True,
        ).astype(x.dtype)
        if self.bias is not None:
            out = out + self.bias.astype(x.dtype)[None, :, None, None]
        return out


class Linear(Module):
    def __init__(self, in_features: int, out_features: int, bias: bool = True, key=None):
        key = key if key is not None else jax.random.key(0)
        bound = 1 / math.sqrt(in_features)
        self.weight = jax.random.uniform(
            key, (out_features, in_features), minval=-bound, maxval=bound
        )
        self.bias = jnp.zeros((out_features,)) if bias else None

    def __call__(self, x):
        out = x @ self.weight.astype(x.dtype).T
        if self.bias is not None:
            out = out + self.bias.astype(x.dtype)
        return out


class Sequential(Module):
    def __init__(self, *layers):
        if len(layers) == 1 and isinstance(layers[0], (list, tuple)):
            layers = tuple(layers[0])
        self.layers = list(layers)

    def __call__(self, x):
        for l in self.layers:
            x = l(x)
        return x

    def __getitem__(self, i):
        return self.layers[i]

    def __len__(self):
        return len(self.layers)


class ReLU(Module):
    def __init__(self):
        pass

    def __call__(self, x):
        return jax.nn.relu(x)


class LeakyReLU(Module):
    def __init__(self, negative_slope: float = 0.01):
        self.negative_slope = negative_slope

    def __call__(self, x):
        return jax.nn.leaky_relu(x, self.negative_slope)


class GELU(Module):
    def __init__(self):
        pass

    def __call__(self, x):
        return jax.nn.gelu(x)


class Identity(Module):
    def __init__(self):
        pass

    def __call__(self, x):
        return x


class Conv3d(Module):
    """3D convolution, NCDHW / OIDHW (torch-compatible weights) —
    reference models build 3D variants via ``conv_nd`` (models/utils.py)."""

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        kernel_size: int = 3,
        stride: int = 1,
        padding: int = 1,
        bias: bool = True,
        groups: int = 1,
        key=None,
    ):
        key = key if key is not None else jax.random.key(0)
        k = kernel_size
        fan_in = in_channels // groups * k ** 3
        self.weight = he_init(
            key, (out_channels, in_channels // groups, k, k, k), fan_in)
        self.bias = jnp.zeros((out_channels,)) if bias else None
        self.stride = stride
        self.padding = padding
        self.groups = groups

    def __call__(self, x):
        out = lax.conv_general_dilated(
            x,
            self.weight.astype(x.dtype),
            window_strides=(self.stride,) * 3,
            padding=[(self.padding, self.padding)] * 3,
            dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
            feature_group_count=self.groups,
            preferred_element_type=_conv_out_dtype(x),
        ).astype(x.dtype)
        if self.bias is not None:
            out = out + self.bias.astype(x.dtype)[None, :, None, None, None]
        return out


class ConvTranspose3d(Module):
    """3D transposed convolution matching torch semantics (IODHW)."""

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        kernel_size: int = 2,
        stride: int = 2,
        padding: int = 0,
        bias: bool = True,
        key=None,
    ):
        key = key if key is not None else jax.random.key(0)
        k = kernel_size
        fan_in = in_channels * k ** 3
        self.weight = he_init(key, (in_channels, out_channels, k, k, k),
                              fan_in)
        self.bias = jnp.zeros((out_channels,)) if bias else None
        self.stride = stride
        self.padding = padding
        self.kernel_size = k

    def __call__(self, x):
        p = self.kernel_size - 1 - self.padding
        out = lax.conv_transpose(
            x,
            self.weight.astype(x.dtype),
            strides=(self.stride,) * 3,
            padding=[(p, p)] * 3,
            # weight stored torch-style (in, out, k, k, k); with
            # transpose_kernel=True the O/I labels swap, so OIDHW is right
            # (same convention as the 2D NCHW path above)
            dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
            transpose_kernel=True,
        ).astype(x.dtype)
        if self.bias is not None:
            out = out + self.bias.astype(x.dtype)[None, :, None, None, None]
        return out


class MaxPool3d(Module):
    def __init__(self, kernel_size: int = 2, stride: Optional[int] = None):
        self.kernel_size = kernel_size
        self.stride = stride if stride is not None else kernel_size

    def __call__(self, x):
        k, s = self.kernel_size, self.stride
        return lax.reduce_window(
            x, -jnp.inf, lax.max, (1, 1, k, k, k), (1, 1, s, s, s), "VALID"
        )


def fix_dim(dim) -> int:
    """Normalize a ``dim`` argument: 2 / 3 / "2" / "2d" / "3D" -> int
    (reference models/utils.py fix_dim)."""
    d = int(str(dim).lower().rstrip("d"))
    if d not in (2, 3):
        raise ValueError(f"dim must be 2 or 3, got {dim!r}")
    return d


def conv_nd(dim):
    """Conv class for ``dim`` spatial dimensions (reference conv_nd)."""
    return Conv2d if fix_dim(dim) == 2 else Conv3d


def conv_transpose_nd(dim):
    return ConvTranspose2d if fix_dim(dim) == 2 else ConvTranspose3d


class AvgPool2d(Module):
    def __init__(self, kernel_size: int = 2, stride: Optional[int] = None):
        self.kernel_size = kernel_size
        self.stride = stride if stride is not None else kernel_size

    def __call__(self, x):
        k, s = self.kernel_size, self.stride
        out = lax.reduce_window(
            x, 0.0, lax.add, (1, 1, k, k), (1, 1, s, s), "VALID"
        )
        return out / (k * k)


class MaxPool2d(Module):
    def __init__(self, kernel_size: int = 2, stride: Optional[int] = None):
        self.kernel_size = kernel_size
        self.stride = stride if stride is not None else kernel_size

    def __call__(self, x):
        k, s = self.kernel_size, self.stride
        return lax.reduce_window(
            x, -jnp.inf, lax.max, (1, 1, k, k), (1, 1, s, s), "VALID"
        )


class UpsampleNearest(Module):
    def __init__(self, factor: int = 2):
        self.factor = factor

    def __call__(self, x):
        f = self.factor
        return jnp.repeat(jnp.repeat(x, f, axis=-2), f, axis=-1)


class PixelShuffle(Module):
    def __init__(self, factor: int = 2):
        self.factor = factor

    def __call__(self, x):
        B, C, H, W = x.shape
        r = self.factor
        x = x.reshape(B, C // (r * r), r, r, H, W)
        x = jnp.transpose(x, (0, 1, 4, 2, 5, 3))
        return x.reshape(B, C // (r * r), H * r, W * r)


class BatchNorm2d(Module):
    """Inference-mode batch norm (running statistics as leaves)."""

    def __init__(self, num_features: int, eps: float = 1e-5):
        self.weight = jnp.ones((num_features,))
        self.bias = jnp.zeros((num_features,))
        self.running_mean = jnp.zeros((num_features,))
        self.running_var = jnp.ones((num_features,))
        self.eps = eps

    def __call__(self, x):
        # dim-agnostic channel broadcast (works for 4D NCHW and 5D NCDHW)
        shape = (1, -1) + (1,) * (x.ndim - 2)
        m = self.running_mean.reshape(shape)
        v = self.running_var.reshape(shape)
        w = self.weight.reshape(shape)
        b = self.bias.reshape(shape)
        return (x - m) / jnp.sqrt(v + self.eps) * w + b
