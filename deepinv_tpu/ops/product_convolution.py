"""Product convolution: space-varying blur as sum_k h_k * (w_k . x)
(reference deepinv/physics/functional/product_convolution.py:10).

The K filter branches are evaluated with ``jax.vmap`` over k instead of the
reference's Python loop — one batched conv, MXU-friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .conv import conv2d, conv2d_fft
from ..core.linalg import transpose_primal

__all__ = ["product_convolution2d", "product_convolution2d_adjoint", "multiplier"]


def multiplier(x, w):
    """Hadamard product with broadcast (reference functional/multiplier.py)."""
    return x * w


def product_convolution2d(x, w, h, padding: str = "valid", use_fft: bool = False):
    """y = sum_k h_k * (w_k . x).

    :param x: (B, C, H, W)
    :param w: multipliers (b, c, K, H, W), b in {1,B}, c in {1,C}
    :param h: filters (b, c, K, hh, ww)
    """
    conv = conv2d_fft if use_fft else conv2d
    K = w.shape[2]

    def branch(k):
        return conv(x * w[:, :, k], h[:, :, k], padding=padding)

    outs = jax.vmap(branch)(jnp.arange(K))
    return jnp.sum(outs, axis=0)


def product_convolution2d_adjoint(y, w, h, padding: str = "valid", use_fft: bool = False):
    """Exact adjoint via linear_transpose of the forward."""
    B, C = y.shape[:2]
    H, W = w.shape[-2:]
    x_shape = (B, C, H, W)
    fwd = lambda x: product_convolution2d(x, w, h, padding=padding, use_fft=use_fft)
    (xt,) = jax.linear_transpose(fwd, transpose_primal(y, x_shape))(y)
    return xt
