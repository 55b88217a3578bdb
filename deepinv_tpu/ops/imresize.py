"""MATLAB-compatible imresize (reference deepinv/physics/functional/
imresize_matlab.py, 364 LoC) and the DownsamplingMatlab physics helper.

Implements MATLAB's antialiased cubic interpolation: scaled cubic kernel with
support widened by 1/scale when downscaling, applied separably with
precomputed (static) weights — so the resize is two dense matmuls (MXU work).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["imresize_matlab"]


def _cubic(x):
    ax = np.abs(x)
    return ((1.5 * ax - 2.5) * ax * ax + 1) * (ax <= 1) + (
        ((-0.5 * ax + 2.5) * ax - 4) * ax + 2
    ) * ((1 < ax) & (ax <= 2))


def _weights(in_len, out_len, scale):
    kernel_width = 4.0
    if scale < 1:
        kernel_width /= scale
    x = np.arange(1, out_len + 1, dtype=np.float64)
    u = x / scale + 0.5 * (1 - 1 / scale)
    left = np.floor(u - kernel_width / 2)
    P = int(np.ceil(kernel_width)) + 2
    idx = left[:, None] + np.arange(P)[None]
    if scale < 1:
        w = scale * _cubic(scale * (u[:, None] - idx))
    else:
        w = _cubic(u[:, None] - idx)
    w = w / np.sum(w, axis=1, keepdims=True)
    # mirror boundary indices (MATLAB convention): idx is 1-based here, so
    # the 0-based lookup is aux[(idx - 1) mod 2n]
    aux = np.concatenate([np.arange(in_len), np.arange(in_len)[::-1]])
    idx = aux[np.mod(idx.astype(np.int64) - 1, 2 * in_len)]
    # build a dense (out_len, in_len) matrix (static, tiny)
    M = np.zeros((out_len, in_len))
    for r in range(out_len):
        np.add.at(M[r], idx[r], w[r])
    return jnp.asarray(M, jnp.float32)


def imresize_matlab(x, scale=None, out_shape=None):
    """MATLAB imresize with bicubic antialiasing, (B, C, H, W) input."""
    H, W = x.shape[-2:]
    if out_shape is None:
        oh, ow = int(np.ceil(H * scale)), int(np.ceil(W * scale))
        sh = sw = scale
    else:
        oh, ow = out_shape
        sh, sw = oh / H, ow / W
    Mh = _weights(H, oh, sh)
    Mw = _weights(W, ow, sw)
    out = jnp.einsum("oh,bchw->bcow", Mh, x)
    out = jnp.einsum("pw,bcow->bcop", Mw, out)
    return out
