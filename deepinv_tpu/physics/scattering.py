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
        """Total field (B, S, n, n): Krylov solve of the Lippmann-Schwinger
        system ``(I - G diag(k0^2 c)) u = u_inc``.

        BiCGStab converges where the plain Born series (spectral radius of
        ``G diag(k0^2 c)`` > 1 at realistic contrasts) diverges — the
        reference reaches the same system through its lsqr/BiCGStab/CG
        LippmannSchwingerSolver (scattering.py:782). Wrapped in
        ``lax.custom_linear_solve`` so gradients use the implicit
        adjoint-state solve (one transposed Krylov solve) instead of
        differentiating through the iterations — the JAX analogue of the
        reference's LippmannSchwingerAdjointState (scattering.py:862)."""
        g = self.grid
        u0 = jnp.broadcast_to(
            g.u_inc[None], (c.shape[0],) + g.u_inc.shape).astype(jnp.complex64)
        k2c = (g.k0**2 * c[:, None]).astype(jnp.complex64)

        def matvec(u):
            return u - g.apply_G(k2c * u)

        def solve(mv, b):
            return jax.scipy.sparse.linalg.bicgstab(
                mv, b, x0=b, tol=self.ls_tol, maxiter=self.ls_max_iter)[0]

        return jax.lax.custom_linear_solve(
            matvec, u0, solve, transpose_solve=solve)

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

    # -- reference solver-configuration surface (scattering.py:184-423) ----

    from dataclasses import dataclass as _dataclass

    @_dataclass
    class SolverConfig:
        """Lippmann-Schwinger solver configuration (reference
        scattering.py:184). ``solver``/``adjoint_state`` are accepted for
        signature parity; the JAX implementation always runs the
        while_loop Born fixed point with autodiff gradients."""

        min_iter: int = 1
        max_iter: int = 500
        solver: str = "lsqr"
        tol: float = 1e-5
        green_imaginary_part: float = 0.0
        adjoint_state: bool = True
        verbose: bool = False

    del _dataclass

    def set_solver(self, solver_config: "Scattering.SolverConfig"):
        """Update the field-solver configuration (reference
        scattering.py:234)."""
        self.ls_max_iter = int(solver_config.max_iter)
        self.ls_tol = float(solver_config.tol)
        self.verbose = bool(solver_config.verbose)
        return self

    def set_verbose(self, verbose: bool):
        """Toggle verbosity (reference scattering.py:401)."""
        self.verbose = bool(verbose)
        return self

    @property
    def img_width(self) -> int:
        return self.grid.n

    @property
    def box_length(self) -> float:
        return self.grid.n * self.grid.dx

    @property
    def wavenumber(self) -> float:
        return self.grid.k0

    @property
    def incident_field(self):
        """Incident field ``(1, T, H, W)`` on the image grid."""
        return self.grid.u_inc[None]

    def get_img_grid(self, dtype=jnp.float32):
        """Flattened physical (x, y) coordinates of the image grid
        (reference scattering.py:209)."""
        dom = jnp.linspace(-self.box_length / 2, self.box_length / 2,
                           self.img_width, dtype=dtype)
        y_dom, x_dom = jnp.meshgrid(-dom, dom, indexing="ij")
        return x_dom.ravel(), y_dom.ravel()

    def generate_incident_field(self, dtype=jnp.complex64):
        """Plane-wave incident fields ``(1, T, H, W)`` on the image grid
        (reference scattering.py:297); this implementation's sources are
        plane waves, precomputed on the grid at construction."""
        return self.incident_field.astype(dtype)

    def compute_total_field(self, x, **kwargs):
        """Total field ``u`` solving the Lippmann-Schwinger equation for
        potential ``x`` (reference scattering.py:387), shape (B,T,H,W)."""
        c = x[:, 0] if x.ndim == 4 else x
        return self._solve_field(c)

    def compute_field_out(self, x, total_field):
        """Receiver samples ``y = M G (k0^2 x . u)`` of the scattered field
        radiated by the induced currents (reference scattering.py:411)."""
        g = self.grid
        c = x[:, 0] if x.ndim == 4 else x
        return g.measure(g.apply_G(g.k0**2 * c[:, None] * total_field))

    def normalize(self, x):
        """Rescale the incident field (and any Gaussian noise sigma) by the
        operator's Jacobian spectral norm at ``x`` (reference
        scattering.py:222)."""
        norm = jnp.sqrt(self.compute_norm(x))
        self.grid = self.grid.replace(u_inc=self.grid.u_inc / norm)
        if self.noise_model is not None and hasattr(self.noise_model, "sigma"):
            self.noise_model = self.noise_model.replace(
                sigma=self.noise_model.sigma / norm)
        return self
