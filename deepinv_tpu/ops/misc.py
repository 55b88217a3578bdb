"""Miscellaneous functional kernels (reference deepinv/physics/functional/
{hist.py, interp.py ThinPlateSpline, rand.py random_choice}).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["histogram", "histogramdd", "ThinPlateSpline", "random_choice"]


def _per_dim(v, D, dtype=None):
    """Broadcast a scalar or length-D sequence to a (D,) array."""
    arr = jnp.asarray(v)
    if dtype is not None:
        arr = arr.astype(dtype)
    return jnp.broadcast_to(arr, (D,))


def histogramdd(x, bins=10, low=None, upp=None, bounded: bool = False,
                weights=None):
    """D-dimensional histogram (reference functional/hist.py:87).

    Semantics follow the reference/numpy: all bins are half-open except the
    last, which includes the upper bound.

    :param x: (N, D) samples.
    :param bins: bin count — int or length-D sequence.
    :param low/upp: per-dimension bounds (scalar or length-D). ``None``
        infers them from the data (min/max per dimension).
    :param bounded: when False, samples outside [low, upp] are dropped
        (reference hist.py ``bounded``); when True, the caller guarantees
        boundedness and every sample lands in a bin.
    :param weights: optional (N,) per-sample weights.
    :returns: (hist, edges) — hist of shape ``tuple(bins)``, edges a list of
        D arrays of bin edges.
    """
    x = jnp.asarray(x)
    N, D = x.shape
    bins_np = np.broadcast_to(np.asarray(bins, np.int64), (D,))
    low_v = jnp.min(x, axis=0) if low is None else _per_dim(low, D, x.dtype)
    upp_v = jnp.max(x, axis=0) if upp is None else _per_dim(upp, D, x.dtype)
    binsf = jnp.asarray(bins_np, x.dtype)
    t = (x - low_v) / (upp_v - low_v)
    idx = jnp.floor(binsf * t).astype(jnp.int32)
    # the last bin includes the upper bound
    idx = jnp.where(
        jnp.asarray(bins_np, jnp.int32)[None, :] == idx,
        idx - 1,
        idx,
    )
    w = jnp.ones((N,), x.dtype) if weights is None else jnp.asarray(weights)
    if not bounded and (low is not None or upp is not None):
        inside = jnp.all((x >= low_v) & (x <= upp_v), axis=1)
        w = jnp.where(inside, w, 0.0)
    idx = jnp.clip(idx, 0, jnp.asarray(bins_np - 1, jnp.int32)[None, :])
    lin = jnp.zeros((N,), jnp.int32)
    for d in range(D):
        lin = lin * int(bins_np[d]) + idx[:, d]
    hist = (
        jnp.zeros((int(np.prod(bins_np)),), w.dtype).at[lin].add(w)
    ).reshape(tuple(int(b) for b in bins_np))
    edges = [
        jnp.linspace(low_v[d], upp_v[d], int(bins_np[d]) + 1) for d in range(D)
    ]
    return hist, edges


def histogram(x, bins: int = 10, low=None, upp=None, bounded: bool = False,
              weights=None):
    """1D histogram (reference functional/hist.py)."""
    h, e = histogramdd(
        jnp.reshape(x, (-1, 1)), bins=bins, low=low, upp=upp,
        bounded=bounded, weights=weights,
    )
    return h, e[0]


def random_choice(key, a, shape=(), replace: bool = True, p=None):
    """jax.random.choice facade (reference functional/rand.py)."""
    return jax.random.choice(key, a, shape=shape, replace=replace, p=p)


class ThinPlateSpline:
    """Thin-plate-spline interpolation (reference functional/interp.py:4).

    Fit control points ``X (n_c, d_s)`` to targets ``Y`` — unbatched
    ``(n_c, d_t)`` or batched ``(B, C, n_c, d_t)`` like the reference — then
    evaluate at query points with :meth:`transform`.
    """

    def __init__(self, alpha: float = 0.0):
        self.alpha = alpha
        self._theta = None
        self._ctrl = None
        self._batched = False

    @staticmethod
    def _phi(r2):
        # U(r) = r^2 log r = 0.5 r^2 log r^2
        return 0.5 * r2 * jnp.log(jnp.clip(r2, 1e-12, None))

    def _solve(self, X, Y):
        n_c, d_s = X.shape
        d2 = jnp.sum((X[:, None] - X[None]) ** 2, axis=-1)
        K = self._phi(d2) + self.alpha * jnp.eye(n_c)
        P = jnp.concatenate([jnp.ones((n_c, 1)), X], axis=1)
        zeros = jnp.zeros((d_s + 1, d_s + 1))
        L = jnp.block([[K, P], [P.T, zeros]])
        rhs = jnp.concatenate([Y, jnp.zeros((d_s + 1, Y.shape[-1]))], axis=0)
        return jnp.linalg.solve(L, rhs)

    def fit(self, X, Y):
        """X: (n_c, d_s) control points; Y: (n_c, d_t) or (B, C, n_c, d_t)."""
        X = jnp.asarray(X)
        Y = jnp.asarray(Y)
        self._ctrl = X
        self._batched = Y.ndim == 4
        if self._batched:
            B, C = Y.shape[:2]
            self._theta = jax.vmap(jax.vmap(lambda y: self._solve(X, y)))(Y)
        else:
            self._theta = self._solve(X, Y)
        return self

    def transform(self, X):
        """Evaluate at (M, d_s) points -> (M, d_t) (or (B, C, M, d_t))."""
        X = jnp.asarray(X)
        d2 = jnp.sum((X[:, None] - self._ctrl[None]) ** 2, axis=-1)
        U = self._phi(d2)
        P = jnp.concatenate([jnp.ones((X.shape[0], 1)), X], axis=1)
        A = jnp.concatenate([U, P], axis=1)  # (M, n_c + d_s + 1)
        if self._batched:
            return jnp.einsum("mk,bckd->bcmd", A, self._theta)
        return A @ self._theta
