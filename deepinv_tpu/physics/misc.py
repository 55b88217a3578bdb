"""Miscellaneous physics operators (reference deepinv/physics/{haze.py,
lidar.py, range.py, spatial_unwrapping.py, unmixing.py, cassi.py}).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core import TensorList
from ..core.rng import ensure_key
from .base import Physics, LinearPhysics, DecomposablePhysics

__all__ = [
    "Haze",
    "SinglePhotonLidar",
    "Decolorize",
    "SpatialUnwrapping",
    "HyperSpectralUnmixing",
    "CompressiveSpectralImaging",
]


class Haze(Physics):
    r"""Koschmieder haze model (reference haze.py:6):
    ``y = t(d) . I + a (1 - t(d))`` with transmission ``t = exp(-beta d)``.

    Inputs are TensorLists ``[image, depth, airlight]``.
    """

    def __init__(self, beta: float = 0.1, offset: float = 0.0, **kwargs):
        super().__init__(**kwargs)
        self.beta = beta
        self.offset = offset

    def A(self, x, **params):
        im, d, A0 = x[0], x[1], x[2]
        t = jnp.exp(-self.beta * (d + self.offset))
        return t * im + A0 * (1 - t)

    def A_dagger(self, y, **params):
        """Dark-channel-prior style inversion (reference haze.py:49)."""
        # airlight = max over a dark-channel window (approx: global max)
        A0 = jnp.max(y, axis=(-2, -1), keepdims=True)
        dark = jnp.min(y / jnp.clip(A0, 1e-6, None), axis=1, keepdims=True)
        t = jnp.clip(1.0 - dark, 0.1, 1.0)
        im = (y - A0 * (1 - t)) / t
        d = -jnp.log(jnp.clip(t, 1e-6, None)) / self.beta
        return TensorList([im, d, A0])


class SinglePhotonLidar(Physics):
    r"""Single-photon lidar (reference lidar.py:7): per-pixel temporal
    histogram ``y[t] = r * g(t - d) + b`` with Gaussian pulse shape g.

    Input TensorList-free convention: x = (B, 3, H, W) with channels
    (depth, reflectivity, background); output (B, T, H, W).
    """

    def __init__(self, sigma: float = 1.0, bins: int = 50, **kwargs):
        super().__init__(**kwargs)
        self.sigma = sigma
        self.bins = bins

    def A(self, x, **params):
        d = x[:, 0:1]
        r = x[:, 1:2]
        b = x[:, 2:3]
        t = jnp.arange(self.bins, dtype=x.dtype).reshape(1, self.bins, 1, 1)
        pulse = jnp.exp(-((t - d) ** 2) / (2 * self.sigma**2))
        pulse = pulse / (np.sqrt(2 * np.pi) * self.sigma)
        return r * pulse + b

    def A_dagger(self, y, **params):
        """Matched-filter depth + moment estimates (reference lidar.py:76)."""
        t = jnp.arange(self.bins, dtype=y.dtype).reshape(1, self.bins, 1, 1)
        b = jnp.median(y, axis=1, keepdims=True)
        yc = jnp.clip(y - b, 0.0, None)
        r = jnp.sum(yc, axis=1, keepdims=True)
        d = jnp.sum(yc * t, axis=1, keepdims=True) / jnp.clip(r, 1e-6, None)
        r = r * (np.sqrt(2 * np.pi) * self.sigma) / (np.sqrt(2 * np.pi) * self.sigma)
        return jnp.concatenate([d, r, b], axis=1)


class Decolorize(DecomposablePhysics):
    r"""RGB -> grayscale via a spectral response function
    (reference range.py:6). ``A x = sum_c srf_c x_c``."""

    def __init__(self, img_size=None, srf="rec601", **kwargs):
        super().__init__(**kwargs)
        if srf == "rec601":
            w = np.array([0.2989, 0.587, 0.114], np.float32)
        elif srf == "flat":
            w = np.ones(3, np.float32) / 3
        elif isinstance(srf, (tuple, list, np.ndarray)):
            w = np.asarray(srf, np.float32)
        else:
            raise ValueError(f"unknown srf {srf!r}")
        norm = float(np.linalg.norm(w))
        self.srf = jnp.asarray(w / norm)
        self.mask = norm

    def V_adjoint(self, x):
        return jnp.sum(x * self.srf[None, :, None, None], axis=1, keepdims=True)

    def V(self, y):
        return y * self.srf[None, :, None, None]


class SpatialUnwrapping(Physics):
    r"""Phase wrapping ``y = mod(x, threshold)`` (reference
    spatial_unwrapping.py:8). ``A_dagger`` = Itoh integration of wrapped
    differences."""

    def __init__(self, threshold: float = 2 * np.pi, mode: str = "floor", **kwargs):
        super().__init__(**kwargs)
        self.threshold = threshold
        if mode not in ("floor", "round"):
            raise ValueError("mode must be 'floor' or 'round'")
        self.mode = mode

    def A(self, x, **params):
        t = self.threshold
        if self.mode == "round":
            # symmetric wrap to [-t/2, t/2) (reference mode='round')
            return x - t * jnp.round(x / t)
        return jnp.mod(x, t)

    def __call__(self, x, key=None, **params):
        # the reference wraps after noise (spatial_unwrapping.py:61)
        return self.sensor(self.A(self.noise(x, key=key), **params))

    def _wrap(self, v):
        t = self.threshold
        return jnp.mod(v + t / 2, t) - t / 2

    def A_adjoint(self, y, **params):
        """Identity (reference spatial_unwrapping.py:72): the modulo
        operator has no meaningful linear adjoint; the reference defines it
        as the identity so wrapped data can seed reconstruction."""
        return y

    def A_dagger(self, y, **params):
        """Itoh's method: cumulative sum of wrapped gradients."""
        dy = self._wrap(jnp.diff(y, axis=-2))
        dx = self._wrap(jnp.diff(y, axis=-1))
        # integrate along first column then rows
        col0 = jnp.cumsum(
            jnp.concatenate([y[..., :1, :1], dy[..., :, :1]], axis=-2), axis=-2
        )
        rows = jnp.concatenate([col0, dx], axis=-1)
        return jnp.cumsum(rows, axis=-1)


class HyperSpectralUnmixing(LinearPhysics):
    r"""Linear unmixing ``y = M x`` over endmembers (reference unmixing.py:7).

    :param M: mixing matrix (E endmembers -> C channels), shape (E, C).
    """

    def __init__(self, M=None, E: int = 4, C: int = 8, key=None, seed: int = 0, **kwargs):
        super().__init__(**kwargs)
        if M is None:
            key = ensure_key(key, seed)
            M = jax.jit(lambda k: jax.random.uniform(k, (E, C)))(key)
        self.M = jnp.asarray(M)
        self.M_pinv = jnp.asarray(jnp.linalg.pinv(self.M))

    def A(self, x, M=None, **params):
        M = self.M if M is None else M
        return jnp.einsum("ec,behw->bchw", M, x)

    def A_adjoint(self, y, M=None, **params):
        M = self.M if M is None else M
        return jnp.einsum("ce,bchw->behw", M.T, y)

    def A_dagger(self, y, **params):
        return jnp.einsum("ce,bchw->behw", self.M_pinv, y)


class CompressiveSpectralImaging(LinearPhysics):
    r"""CASSI hyperspectral camera (reference cassi.py:11).

    ``y = mean_c S M x`` ('sd', single disperser) or ``mean_c S^-1 M S x``
    ('ss', spatial-spectral), where M is a binary coded aperture and S a
    per-channel pixel shear along H.

    :param img_size: (C, H, W).
    :param mask: None | float (Bernoulli ratio) | array.
    :param mode: 'sd' | 'ss'.
    """

    def __init__(self, img_size, mask=None, mode: str = "ss", shear_dir: str = "h", key=None, seed: int = 0, **kwargs):
        super().__init__(**kwargs)
        self.img_size = tuple(img_size)
        if mode not in ("sd", "ss"):
            raise ValueError("mode must be 'sd' or 'ss' (reference cassi.py)")
        if shear_dir not in ("h", "w"):
            raise ValueError("shear_dir must be 'h' or 'w'")
        self.mode = mode
        self.shear_dir = shear_dir
        C, H, W = self.img_size
        if mask is None:
            mask = 0.5
        if isinstance(mask, float):
            key = ensure_key(key, seed)
            mask = jax.random.bernoulli(key, mask, (1, C, H, W)).astype(jnp.float32)
        else:
            mask = jnp.asarray(mask)
            if mask.ndim == 3:
                mask = mask[None]
        self.mask = mask

    @property
    def C(self):
        return self.img_size[0]

    def pad(self, x):
        """Zero-pad bottom (or right) by C-1 pixels (reference
        cassi.py:104)."""
        C = self.img_size[0]
        if self.shear_dir == "h":
            return jnp.pad(x, ((0, 0), (0, 0), (0, C - 1), (0, 0)))
        return jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, C - 1)))

    def crop(self, x):
        """Undo :meth:`pad` (reference cassi.py:114)."""
        C = self.img_size[0]
        if self.shear_dir == "h":
            return x[:, :, : x.shape[-2] - (C - 1), :]
        return x[:, :, :, : x.shape[-1] - (C - 1)]

    def shear(self, x, un: bool = False):
        """Per-channel pixel shear (reference cassi.py:124); ``un`` shears
        in the opposite direction."""
        return self._shear(x, inverse=un)

    def flatten(self, x):
        """Average over the channel dimension (reference cassi.py:142)."""
        return jnp.mean(x, axis=1, keepdims=True)

    def unflatten(self, y):
        """Spread a flat measurement back over C channels (reference
        cassi.py:149)."""
        C = self.img_size[0]
        return jnp.repeat(y, C, axis=1) / C

    def _shear(self, x, inverse: bool = False):
        C = x.shape[1]
        ax = -2 if self.shear_dir == "h" else -1

        def sh(c, xc):
            s = -c if inverse else c
            return jnp.roll(xc, s, axis=ax)

        return jnp.stack(
            [sh(c, x[:, c]) for c in range(C)], axis=1
        )

    def A(self, x, mask=None, **params):
        m = self.mask if mask is None else mask
        if self.mode == "ss":
            out = self._shear(self._shear(x) * m, inverse=True)
        else:  # single disperser
            out = self._shear(x * m)
        return jnp.mean(out, axis=1, keepdims=True)

    def A_adjoint(self, y, mask=None, **params):
        m = self.mask if mask is None else mask
        C = self.img_size[0]
        xe = jnp.repeat(y, C, axis=1) / C
        if self.mode == "ss":
            return self._shear(self._shear(xe) * m, inverse=True)
        return m * self._shear(xe, inverse=True)
