"""Zernike polynomial utilities (reference deepinv/physics/generator/zernike.py).

The static :class:`Zernike` namespace evaluates :math:`Z_n^m` on jnp (or
numpy) grids with the Noll RMS normalization and converts single indices
between the ANSI and Noll conventions.  A legacy host-side
:func:`zernike_basis` helper (grid-RMS-normalized modes) is kept for the
3D diffraction generator.
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

__all__ = ["zernike_basis", "noll_to_nm", "Zernike"]

# Standard aberration names (reference zernike.py:6)
_NAMES = {
    (0, 0): "Zernike(n = 0, m = 0) -- Piston",
    (1, -1): "Zernike(n = 1, m = -1) -- Vertical Tilt",
    (1, 1): "Zernike(n = 1, m = 1) -- Horizontal Tilt",
    (2, -2): "Zernike(n = 2, m = -2) -- Oblique Astigmatism",
    (2, 0): "Zernike(n = 2, m = 0) -- Defocus",
    (2, 2): "Zernike(n = 2, m = 2) -- Vertical Astigmatism",
    (3, -3): "Zernike(n = 3, m = -3) -- Vertical Trefoil",
    (3, -1): "Zernike(n = 3, m = -1) -- Vertical Coma",
    (3, 1): "Zernike(n = 3, m = 1) -- Horizontal Coma",
    (3, 3): "Zernike(n = 3, m = 3) -- Oblique Trefoil",
    (4, -4): "Zernike(n = 4, m = -4) -- Oblique Quadrafoil",
    (4, -2): "Zernike(n = 4, m = -2) -- Oblique Secondary Astigmatism",
    (4, 0): "Zernike(n = 4, m = 0) -- Primary Spherical",
    (4, 2): "Zernike(n = 4, m = 2) -- Vertical Secondary Astigmatism",
    (4, 4): "Zernike(n = 4, m = 4) -- Vertical Quadrafoil",
    (6, 0): "Zernike(n = 6, m = 0) -- Secondary Spherical",
}


class Zernike:
    r"""Static utility class for Zernike polynomials
    (reference generator/zernike.py:26): Noll-normalized
    :math:`Z_n^m(\rho,\theta) = N_n^m R_n^m(\rho) \cos/\sin(m\theta)`
    with ANSI/Noll single-index conversion.

    :Examples:

        >>> from deepinv_tpu.physics.generator import Zernike
        >>> Zernike.index_conversion(4, convention="noll")
        (2, 0)
        >>> Zernike.get_name(2, 0)
        'Zernike(n = 2, m = 0) -- Defocus'
    """

    @staticmethod
    def get_name(n: int, m: int) -> str:
        """ANSI standard aberration name for :math:`(n, m)`."""
        Zernike._validate(n, m)
        return _NAMES.get((n, m), f"Zernike(n={n}, m={m})")

    @staticmethod
    def normalization_constant(n: int, m: int) -> float:
        """Noll RMS constant: :math:`\\sqrt{n+1}` if ``m==0`` else
        :math:`\\sqrt{2n+2}`."""
        return math.sqrt(n + 1) if m == 0 else math.sqrt(2 * (n + 1))

    @staticmethod
    def cartesian_evaluate(n: int, m: int, x, y, use_mask: bool = True):
        """Evaluate :math:`Z_n^m` at Cartesian coordinates (jnp arrays)."""
        Zernike._validate(n, m)
        rho = jnp.sqrt(x**2 + y**2)
        theta = jnp.arctan2(y, x)
        return Zernike.polar_evaluate(n, m, rho, theta, use_mask)

    @staticmethod
    def polar_evaluate(n: int, m: int, rho, theta, use_mask: bool = True):
        """Evaluate :math:`Z_n^m` at polar coordinates (jnp arrays)."""
        Zernike._validate(n, m)
        R = Zernike._radial_polynomial(n, m, rho)
        angular = jnp.cos(m * theta) if m >= 0 else jnp.sin(abs(m) * theta)
        Z = Zernike.normalization_constant(n, m) * R * angular
        if use_mask:
            Z = jnp.where(rho > 1.0, 0.0, Z)
        return Z

    @staticmethod
    def _radial_polynomial(n: int, m: int, rho):
        m_abs = abs(m)
        R = jnp.zeros_like(rho)
        for k in range((n - m_abs) // 2 + 1):
            num = (-1) ** k * math.factorial(n - k)
            den = (
                math.factorial(k)
                * math.factorial((n + m_abs) // 2 - k)
                * math.factorial((n - m_abs) // 2 - k)
            )
            R = R + (num / den) * rho ** (n - 2 * k)
        return R

    @staticmethod
    def _validate(n: int, m: int):
        if n < 0:
            raise ValueError(f"n must be >= 0. Got {n}.")
        if abs(m) > n:
            raise ValueError(f"|m| must be <= n. Got n={n}, m={m}.")
        if (n - abs(m)) % 2 != 0:
            raise ValueError(f"n - |m| must be even. Got n={n}, m={m}.")

    @staticmethod
    def index_conversion(index: int, *, convention: str = "ansi"):
        """Single index -> ``(n, m)`` under the ANSI or Noll convention
        (reference zernike.py:183)."""
        if convention.lower() == "ansi":
            n = math.floor((2 * index + 0.25) ** 0.5 - 0.5)
            m = 2 * index - n * (n + 2)
            return n, m
        elif convention.lower() == "noll":
            if index < 1:
                raise ValueError("Noll index must be >= 1")
            n = math.floor((2 * (index - 1) + 0.25) ** 0.5 - 0.5)
            m = n % 2 + 2 * math.floor(
                (index - n * (n + 1) / 2 - 1 + (n + 1) % 2) / 2
            )
            m = m * (-1) ** index
            return n, m
        raise NotImplementedError("Only 'ANSI' and 'Noll' conventions are implemented.")


def noll_to_nm(j: int):
    """Noll index -> (n, m) Zernike orders."""
    return Zernike.index_conversion(j, convention="noll")


def zernike_basis(n_modes: int = 10, grid_size: int = 31, radius: float = 8.0):
    """Legacy host-side basis: (n_modes, G, G) grid-RMS-normalized modes and
    a complex pupil mask.  Used by :class:`DiffractionBlurGenerator3D`."""
    ax = np.arange(grid_size) - (grid_size - 1) / 2
    yy, xx = np.meshgrid(ax, ax, indexing="ij")
    r = np.sqrt(xx**2 + yy**2) / radius
    th = np.arctan2(yy, xx)
    mask = (r <= 1.0).astype(np.float64)

    modes = []
    for j in range(1, n_modes + 1):
        n, m = noll_to_nm(j)
        rc = np.clip(r, 0, 1)
        R = np.zeros_like(rc)
        m_abs = abs(m)
        for k in range((n - m_abs) // 2 + 1):
            c = (
                (-1) ** k
                * math.factorial(n - k)
                / (
                    math.factorial(k)
                    * math.factorial((n + m_abs) // 2 - k)
                    * math.factorial((n - m_abs) // 2 - k)
                )
            )
            R += c * rc ** (n - 2 * k)
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
