"""2D discrete wavelet transforms in pure XLA.

TPU-native replacement for the reference's ptwt/PyWavelets dependency
(deepinv/models/wavdict.py, deepinv/optim/prior.py:315). Separable
orthonormal DWT with periodized boundary: the analysis operator is a strided
circular correlation, and — because the basis is orthonormal — the synthesis
operator is exactly ``jax.linear_transpose`` of the analysis. Perfect
reconstruction is therefore guaranteed by construction rather than by
filter-bank bookkeeping.

Inputs of arbitrary (odd) size are symmetrically padded to a multiple of
``2^level`` and cropped back after the inverse.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from ..core.linalg import transpose_primal

__all__ = ["WaveletTransform", "WAVELET_FILTERS"]

_SQRT2 = math.sqrt(2.0)

# Orthonormal decomposition low-pass filters (standard published coefficients).
WAVELET_FILTERS = {
    "haar": [1 / _SQRT2, 1 / _SQRT2],
    "db1": [1 / _SQRT2, 1 / _SQRT2],
    "db2": [
        -0.12940952255092145,
        0.22414386804185735,
        0.836516303737469,
        0.48296291314469025,
    ],
    "db4": [
        -0.010597401784997278,
        0.032883011666982945,
        0.030841381835986965,
        -0.18703481171888114,
        -0.02798376941698385,
        0.6308807679295904,
        0.7148465705525415,
        0.23037781330885523,
    ],
    "db8": [
        -0.00011747678400228192,
        0.0006754494059985568,
        -0.0003917403729959771,
        -0.00487035299301066,
        0.008746094047015655,
        0.013981027917015516,
        -0.04408825393106472,
        -0.01736930100202211,
        0.128747426620186,
        0.00047248457399797254,
        -0.2840155429624281,
        -0.015829105256023893,
        0.5853546836548691,
        0.6756307362980128,
        0.3128715909144659,
        0.05441584224308161,
    ],
    "sym4": [
        -0.07576571478927333,
        -0.02963552764599851,
        0.49761866763201545,
        0.8037387518059161,
        0.29785779560527736,
        -0.09921954357684722,
        -0.012603967262037833,
        0.0322231006040427,
    ],
}


def _qmf(lo):
    """High-pass from low-pass by quadrature mirror relation."""
    n = len(lo)
    return [((-1) ** k) * lo[n - 1 - k] for k in range(n)]


class WaveletTransform:
    """Multi-level separable DWT on (B, C, H, W) / (B, C, D, H, W) arrays.

    ``dwt2`` returns ``[cA_L, (cH_L, cV_L, cD_L), ..., (cH_1, cV_1, cD_1)]``
    (coarsest first, PyWavelets convention used by the reference). With
    ``ndim=3`` each level has 7 detail bands over the trailing (D, H, W)
    axes (the reference's ``wvdim=3``, models/wavdict.py:68).
    """

    def __init__(self, wavelet: str = "db4", level: int = 3, ndim: int = 2):
        if wavelet not in WAVELET_FILTERS:
            raise ValueError(
                f"unknown wavelet {wavelet!r}; available: {sorted(WAVELET_FILTERS)}"
            )
        if ndim not in (2, 3):
            raise ValueError("ndim must be 2 or 3")
        self.wavelet = wavelet
        self.level = level
        self.ndim = ndim
        lo = WAVELET_FILTERS[wavelet]
        self.lo = jnp.asarray(lo, jnp.float32)
        self.hi = jnp.asarray(_qmf(lo), jnp.float32)

    # -- single-level periodized analysis --------------------------------
    def _analysis_1d(self, x, axis):
        """Circular correlation with dec filters + downsample by 2 on axis."""
        x = jnp.moveaxis(x, axis, -1)
        N = x.shape[-1]
        L = self.lo.shape[0]
        # periodize: wrap filter support
        idx = (jnp.arange(0, N, 2)[:, None] + jnp.arange(L)[None, :] - (L - 2)) % N
        gathered = x[..., idx]  # (..., N/2, L)
        lo = jnp.sum(gathered * self.lo[::-1], axis=-1)
        hi = jnp.sum(gathered * self.hi[::-1], axis=-1)
        return jnp.moveaxis(lo, -1, axis), jnp.moveaxis(hi, -1, axis)

    def _dwt2_level(self, x):
        """One separable analysis level over the trailing ``ndim`` axes:
        2^ndim subbands, all-lowpass first (2D order: ll, lh, hl, hh)."""
        bands = [x]
        for ax in range(-self.ndim, 0):
            nxt = []
            for b in bands:
                lo, hi = self._analysis_1d(b, ax)
                nxt += [lo, hi]
            bands = nxt
        return bands[0], tuple(bands[1:])

    def _pad(self, x):
        m = 2**self.level
        sp = x.shape[-self.ndim:]
        pads = [(-s) % m for s in sp]
        if any(pads):
            x = jnp.pad(
                x,
                [(0, 0)] * (x.ndim - self.ndim) + [(0, p) for p in pads],
                mode="symmetric",
            )
        return x, tuple(sp)

    def dwt2(self, x):
        x, orig = self._pad(x)
        coeffs = []
        a = x
        for _ in range(self.level):
            a, details = self._dwt2_level(a)
            coeffs.append(details)
        out = [a] + coeffs[::-1]
        return {"coeffs": out, "orig_shape": orig}

    def idwt2(self, tree):
        coeffs, orig = tree["coeffs"], tree["orig_shape"]
        a = coeffs[0]
        for details in coeffs[1:]:
            a = self._idwt2_level(a, details)
        sl = (Ellipsis,) + tuple(slice(0, s) for s in orig)
        return a[sl]

    def _idwt2_level(self, a, details):
        # synthesis = transpose of the orthonormal analysis
        shp = a.shape[: -self.ndim] + tuple(
            s * 2 for s in a.shape[-self.ndim:]
        )
        fwd = lambda x: self._dwt2_level(x)
        (xt,) = jax.linear_transpose(
            fwd, transpose_primal(a, shp)
        )((a, tuple(details)))
        return xt

    # -- helpers used by priors/denoisers --------------------------------
    def map_detail(self, tree, fn):
        """Apply ``fn`` to every detail coefficient (keep approximation)."""
        coeffs = tree["coeffs"]
        new = [coeffs[0]] + [tuple(fn(c) for c in d) for d in coeffs[1:]]
        return {"coeffs": new, "orig_shape": tree["orig_shape"]}

    def flat_coeffs(self, tree):
        """Concatenate detail coefficients into (B, -1) for norms."""
        coeffs = tree["coeffs"]
        parts = []
        for d in coeffs[1:]:
            for c in d:
                parts.append(c.reshape(c.shape[0], -1))
        return jnp.concatenate(parts, axis=1)
