"""Orthonormal trigonometric transforms and centered FFTs.

TPU-native counterpart of deepinv/physics/functional/{dct.py,dst.py} and the
MRI fft helpers in deepinv/utils/mixins.py:118-289. All transforms are
expressed through ``jnp.fft`` so XLA lowers them to its fused FFT kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from ..core.linalg import transpose_primal

__all__ = ["dct2", "idct2", "dst1", "fftc", "ifftc", "dct1d", "idct1d"]


def dct1d(x: jax.Array, axis: int = -1, ortho: bool = True) -> jax.Array:
    """DCT-II along ``axis`` (reference functional/dct.py semantics)."""
    N = x.shape[axis]
    x = jnp.moveaxis(x, axis, -1)
    # even extension trick: interleave
    v = jnp.concatenate([x[..., ::2], x[..., 1::2][..., ::-1]], axis=-1)
    V = jnp.fft.fft(v, axis=-1)
    k = jnp.arange(N)
    factor = 2 * jnp.exp(-1j * jnp.pi * k / (2 * N))
    out = jnp.real(V * factor)
    if ortho:
        scale = jnp.full((N,), jnp.sqrt(1.0 / (2 * N)))
        scale = scale.at[0].set(jnp.sqrt(1.0 / (4 * N)))
        out = out * scale
    return jnp.moveaxis(out, -1, axis)


def idct1d(x: jax.Array, axis: int = -1, ortho: bool = True) -> jax.Array:
    """Inverse of :func:`dct1d`.

    The orthonormal DCT-II is an orthogonal map, so its inverse equals its
    transpose; ``jax.linear_transpose`` derives it from the forward — exact
    round-trip by construction, lowered by XLA to inverse FFTs.
    """
    if not ortho:
        raise NotImplementedError("idct1d only supports ortho normalization")
    fwd = lambda v: dct1d(v, axis=axis, ortho=True)
    (out,) = jax.linear_transpose(fwd, transpose_primal(x, x.shape))(x)
    return out


def dct2(x: jax.Array, ortho: bool = True) -> jax.Array:
    """2D DCT-II over the last two axes."""
    return dct1d(dct1d(x, axis=-1, ortho=ortho), axis=-2, ortho=ortho)


def idct2(x: jax.Array, ortho: bool = True) -> jax.Array:
    return idct1d(idct1d(x, axis=-1, ortho=ortho), axis=-2, ortho=ortho)


def dst1(x: jax.Array, axes=(-2, -1), ortho: bool = True) -> jax.Array:
    """DST-I over the given axes; self-inverse when ``ortho`` is True.

    Used by StructuredRandom physics (deepinv/physics/structured_random.py:108)
    and Liu-Jia padding (deepinv/physics/functional/blur.py:583).
    """
    out = x
    for ax in axes:
        out = _dst1_1d(out, ax, ortho)
    return out


def _dst1_1d(x: jax.Array, axis: int, ortho: bool) -> jax.Array:
    N = x.shape[axis]
    x = jnp.moveaxis(x, axis, -1)
    # DST-I via odd extension of length 2(N+1)
    zeros = jnp.zeros_like(x[..., :1])
    ext = jnp.concatenate([zeros, x, zeros, -jnp.flip(x, axis=-1)], axis=-1)
    spec = jnp.fft.fft(ext, axis=-1)
    out = -jnp.imag(spec[..., 1 : N + 1]) / 2
    if ortho:
        out = out * jnp.sqrt(2.0 / (N + 1))
    else:
        out = out * 2
    return jnp.moveaxis(out, -1, axis)


def fftc(x: jax.Array, axes=(-2, -1)) -> jax.Array:
    """Centered orthonormal FFT (MRI convention, utils/mixins.py:118)."""
    return jnp.fft.fftshift(
        jnp.fft.fftn(jnp.fft.ifftshift(x, axes=axes), axes=axes, norm="ortho"),
        axes=axes,
    )


def ifftc(x: jax.Array, axes=(-2, -1)) -> jax.Array:
    """Inverse of :func:`fftc`."""
    return jnp.fft.fftshift(
        jnp.fft.ifftn(jnp.fft.ifftshift(x, axes=axes), axes=axes, norm="ortho"),
        axes=axes,
    )
