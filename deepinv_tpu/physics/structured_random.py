"""Structured random operators (reference deepinv/physics/structured_random.py:108).

``A = prod_i (F D_i)``: alternating diagonal random-sign/phase multiplications
and orthonormal transforms (DST-I by default) — fast Johnson-Lindenstrauss
style embeddings, all bandwidth-light XLA ops.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core.rng import ensure_key
from ..ops.fourier import dst1
from .base import LinearPhysics
from ..core.linalg import transpose_primal

__all__ = ["StructuredRandom", "compare_sizes", "generate_diagonal"]


def compare_sizes(input_shape, output_shape):
    n_in = int(np.prod(input_shape))
    n_out = int(np.prod(output_shape))
    return n_in, n_out


def generate_diagonal(shape, mode: str, key, dtype=jnp.float32):
    """Random diagonal: 'rademacher' signs or 'uniform_phase' unit complex."""
    if mode == "rademacher":
        return jax.random.bernoulli(key, 0.5, shape).astype(dtype) * 2 - 1
    if mode == "uniform_phase":
        phase = jax.random.uniform(key, shape, minval=0.0, maxval=2 * np.pi)
        return jnp.exp(1j * phase)
    raise ValueError(mode)


class StructuredRandom(LinearPhysics):
    r"""``y = crop( prod_i F D_i x )`` (reference structured_random.py:108).

    :param input_shape: (C, H, W).
    :param output_shape: (C, H', W') — smaller (compression) or equal.
    :param n_layers: number of (transform, diagonal) layers; .5 offsets mean
        a final transform without diagonal (reference convention).
    :param diagonal_mode: 'rademacher' (real) or 'uniform_phase' (complex).
    """

    def __init__(
        self,
        input_shape,
        output_shape=None,
        n_layers: float = 1.0,
        transform: str = "dst1",
        diagonal_mode: str = "rademacher",
        key=None,
        seed: int = 0,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.input_shape = tuple(input_shape)
        self.output_shape = tuple(output_shape) if output_shape is not None else self.input_shape
        self.n_layers = n_layers
        key = ensure_key(key, seed)
        n_diag = int(n_layers)
        keys = jax.random.split(key, max(n_diag, 1))
        self.diagonals = [
            generate_diagonal(self.input_shape, diagonal_mode, keys[i])
            for i in range(n_diag)
        ]
        self.extra_transform = (n_layers - n_diag) > 0.0

    def _transform(self, x):
        return dst1(x, axes=(-2, -1))

    def A(self, x, **params):
        out = x
        if self.extra_transform:
            out = self._transform(out)
        for d in self.diagonals:
            out = out * d
            out = self._transform(out)
        # crop to output shape (centered)
        H, W = out.shape[-2:]
        h, w = self.output_shape[-2:]
        top, left = (H - h) // 2, (W - w) // 2
        return out[..., top : top + h, left : left + w]

    def A_adjoint(self, y, **params):
        B, C = y.shape[:2]
        x_shape = (B,) + self.input_shape
        fwd = lambda x: self.A(x)
        (xt,) = jax.linear_transpose(
            fwd, transpose_primal(y, x_shape)
        )(y)
        return xt
