"""Zernike polynomial basis (reference deepinv/physics/generator/blur.py +
zernike helpers, 216 LoC). Host-side numpy construction (static constants).
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

__all__ = ["zernike_basis", "noll_to_nm", "Zernike"]


def noll_to_nm(j: int):
    """Noll index -> (n, m) Zernike orders."""
    n = 0
    j1 = j
    while j1 > n:
        n += 1
        j1 -= n
    m = (-1) ** j * ((n % 2) + 2 * int((j1 - 1) // 2))
    return n, m


def _zernike_radial(n, m, r):
    m = abs(m)
    out = np.zeros_like(r)
    for k in range((n - m) // 2 + 1):
        c = (
            (-1) ** k
            * math.factorial(n - k)
            / (
                math.factorial(k)
                * math.factorial((n + m) // 2 - k)
                * math.factorial((n - m) // 2 - k)
            )
        )
        out += c * r ** (n - 2 * k)
    return out


def zernike_basis(n_modes: int = 10, grid_size: int = 31, radius: float = 8.0):
    """Return (basis (n_modes, G, G) jnp array, pupil_mask (G, G) complex)."""
    ax = np.arange(grid_size) - (grid_size - 1) / 2
    yy, xx = np.meshgrid(ax, ax, indexing="ij")
    r = np.sqrt(xx**2 + yy**2) / radius
    th = np.arctan2(yy, xx)
    mask = (r <= 1.0).astype(np.float64)

    modes = []
    for j in range(1, n_modes + 1):
        n, m = noll_to_nm(j)
        R = _zernike_radial(n, abs(m), np.clip(r, 0, 1))
        if m > 0:
            Z = R * np.cos(m * th)
        elif m < 0:
            Z = R * np.sin(-m * th)
        else:
            Z = R
        Z = Z * mask
        nrm = np.sqrt(np.sum(Z**2)) + 1e-12
        modes.append(Z / nrm)
    return jnp.asarray(np.stack(modes), jnp.float32), jnp.asarray(mask, jnp.complex64)


class Zernike:
    """Static utility namespace for Zernike polynomials
    (reference generator/zernike.py:26). All methods are static."""

    noll_to_nm = staticmethod(noll_to_nm)

    @staticmethod
    def radial(n, m, r):
        return _zernike_radial(n, abs(m), np.clip(np.asarray(r, float), 0, 1))

    @staticmethod
    def basis(n_modes=10, grid_size=31, radius=8.0):
        return zernike_basis(n_modes=n_modes, grid_size=grid_size, radius=radius)
