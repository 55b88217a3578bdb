"""Miscellaneous functional kernels (reference deepinv/physics/functional/
{histogram.py:226, thinplatespline.py:217, blur.py:583 liu_jia_pad,
random_choice.py}).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["histogram", "histogramdd", "ThinPlateSpline", "random_choice"]


def histogramdd(x, bins: int = 10, low: float = 0.0, upp: float = 1.0, weights=None):
    """Differentiable-ish D-dimensional histogram via one-hot scatter
    (reference functional/histogram.py). ``x``: (N, D)."""
    N, D = x.shape
    edges = jnp.linspace(low, upp, bins + 1)
    idx = jnp.clip(((x - low) / (upp - low) * bins).astype(jnp.int32), 0, bins - 1)
    flat = jnp.zeros((bins,) * D).reshape(-1)
    lin = jnp.zeros((N,), jnp.int32)
    for d in range(D):
        lin = lin * bins + idx[:, d]
    w = jnp.ones((N,)) if weights is None else weights
    hist = flat.at[lin].add(w).reshape((bins,) * D)
    return hist, edges


def histogram(x, bins: int = 10, low: float = 0.0, upp: float = 1.0, weights=None):
    """1D histogram."""
    h, e = histogramdd(x.reshape(-1, 1), bins=bins, low=low, upp=upp, weights=weights)
    return h, e


def random_choice(key, a, shape=(), replace: bool = True, p=None):
    """jax.random.choice facade (reference functional/random_choice.py)."""
    return jax.random.choice(key, a, shape=shape, replace=replace, p=p)


class ThinPlateSpline:
    """Thin-plate-spline warping (reference functional/thinplatespline.py).

    Fit with control points, evaluate the interpolated displacement field.
    """

    def __init__(self, alpha: float = 0.0):
        self.alpha = alpha
        self._theta = None
        self._ctrl = None

    @staticmethod
    def _phi(r2):
        return 0.5 * r2 * jnp.log(jnp.clip(r2, 1e-12, None))

    def fit(self, X, Y):
        """X: (N, 2) control points; Y: (N, D) target values."""
        N = X.shape[0]
        d2 = jnp.sum((X[:, None] - X[None]) ** 2, axis=-1)
        K = self._phi(d2) + self.alpha * jnp.eye(N)
        P = jnp.concatenate([jnp.ones((N, 1)), X], axis=1)
        zeros = jnp.zeros((3, 3))
        L = jnp.block([[K, P], [P.T, zeros]])
        rhs = jnp.concatenate([Y, jnp.zeros((3, Y.shape[1]))], axis=0)
        self._theta = jnp.linalg.solve(L, rhs)
        self._ctrl = X
        return self

    def transform(self, X):
        """Evaluate at (M, 2) points -> (M, D)."""
        d2 = jnp.sum((X[:, None] - self._ctrl[None]) ** 2, axis=-1)
        U = self._phi(d2)
        P = jnp.concatenate([jnp.ones((X.shape[0], 1)), X], axis=1)
        N = self._ctrl.shape[0]
        return U @ self._theta[:N] + P @ self._theta[N:]
