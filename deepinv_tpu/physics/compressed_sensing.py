"""Compressed sensing physics (reference deepinv/physics/compressed_sensing.py).

Dense Gaussian measurement matrices are the MXU sweet spot: ``A`` and
``A_adjoint`` are single large matmuls in bfloat16/float32. The fast
Johnson-Lindenstrauss variant composes a random sign flip, an orthonormal
DST, and row subsampling — all bandwidth-light XLA ops.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..core.rng import ensure_key
from ..ops.fourier import dst1
from .base import LinearPhysics

__all__ = ["CompressedSensing"]


class CompressedSensing(LinearPhysics):
    r"""``y = Ax`` with iid Gaussian A (reference compressed_sensing.py:32).

    :param m: number of measurements.
    :param img_size: shape of the input image (C, H, W).
    :param fast: use the fast structured transform ``A = S F D`` (row
        subsampling, DST-I, random signs) instead of a dense matrix.
    :param channelwise: apply the same matrix per channel.

    :Examples:

        >>> import jax
        >>> from deepinv_tpu.physics import CompressedSensing
        >>> physics = CompressedSensing(m=50, img_size=(1, 10, 10),
        ...                             key=jax.random.key(0))
        >>> x = jax.random.normal(jax.random.key(1), (1, 1, 10, 10))
        >>> physics.A(x).shape
        (1, 50)
        >>> physics.A_adjoint(physics.A(x)).shape
        (1, 1, 10, 10)
    """

    def __init__(
        self,
        m: int,
        img_size,
        fast: bool = False,
        channelwise: bool = False,
        key=None,
        seed: int = 0,
        dtype=jnp.float32,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.m = int(m)
        self.img_size = tuple(img_size)
        self.fast = fast
        self.channelwise = channelwise
        key = ensure_key(key, seed)

        n = int(jnp.prod(jnp.asarray(self.img_size)))
        if channelwise:
            n = n // self.img_size[0]
        self.n = n

        # constructors run under jit: eager sampling on the axon TPU backend
        # is either unsupported or very slow for large arrays
        if fast:
            def make(k):
                kd, km = jax.random.split(k)
                D = jax.random.bernoulli(kd, 0.5, (n,)).astype(dtype) * 2 - 1
                rows = jax.random.permutation(km, n)[: self.m]
                return D, rows

            self.D, self.rows = jax.jit(make)(key)
            self._A_mat = None
        else:
            self._A_mat = jax.jit(
                lambda k: jax.random.normal(k, (self.m, n), dtype) / math.sqrt(self.m)
            )(key)
            self.D = None
            self.rows = None

    def _flatten(self, x):
        B = x.shape[0]
        if self.channelwise:
            C = x.shape[1]
            return x.reshape(B * C, -1), (B, C)
        return x.reshape(B, -1), (B, None)

    def _unflatten(self, v, meta):
        B, C = meta
        if C is not None:
            return v.reshape(B, C, *self.img_size[1:])
        return v.reshape(B, *self.img_size)

    def A(self, x, **params):
        v, meta = self._flatten(x)
        if self.fast:
            u = dst1(v * self.D, axes=(-1,))
            y = u[:, self.rows] * math.sqrt(self.n / self.m)
        else:
            y = v @ self._A_mat.T
        B, C = meta
        if C is not None:
            y = y.reshape(B, C, self.m)
        return y

    def A_adjoint(self, y, **params):
        if self.channelwise:
            B, C = y.shape[0], y.shape[1]
            v = y.reshape(B * C, -1)
            meta = (B, C)
        else:
            v = y.reshape(y.shape[0], -1)
            meta = (y.shape[0], None)
        if self.fast:
            u = jnp.zeros((v.shape[0], self.n), v.dtype)
            u = u.at[:, self.rows].set(v * math.sqrt(self.n / self.m))
            x = dst1(u, axes=(-1,)) * self.D
        else:
            # A^H = conj(A)^T; conj is a no-op for the real default dtype
            x = v @ self._A_mat.conj()
        return self._unflatten(x, meta)
