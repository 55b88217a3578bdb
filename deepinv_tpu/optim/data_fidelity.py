"""Data-fidelity terms f(x) = d(A(x), y)
(reference deepinv/optim/data_fidelity.py, 10 classes, 843 LoC).

Chain rule through the physics: ``grad f = A_vjp(x, grad_d(A x, y))``
(data_fidelity.py:26). For :class:`L2`, prox routes to
``physics.prox_l2`` — closed form for DecomposablePhysics, implicit-vjp
Krylov otherwise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import TensorList
from .potential import Potential
from .distance import (
    Distance,
    L2Distance,
    IndicatorL2Distance,
    PoissonLikelihoodDistance,
    L1Distance,
    AmplitudeLossDistance,
    LogPoissonLikelihoodDistance,
    ZeroDistance,
)
from ..core.linalg import transpose_primal

__all__ = [
    "DataFidelity",
    "StackedPhysicsDataFidelity",
    "L2",
    "IndicatorL2",
    "PoissonLikelihood",
    "L1",
    "AmplitudeLoss",
    "LogPoissonLikelihood",
    "ZeroFidelity",
    "ItohFidelity",
]


class DataFidelity(Potential):
    r"""Base data fidelity ``f(x) = d(A(x), y)`` (data_fidelity.py:26)."""

    def __init__(self, d: Distance = None):
        self.d = d if d is not None else L2Distance()

    def fn(self, x, y, physics, *args, **kwargs):
        Ax = physics.A(x)
        if isinstance(Ax, TensorList):
            return sum(self.d.fn(a, b) for a, b in zip(Ax, y))
        return self.d.fn(Ax, y, *args, **kwargs)

    def grad(self, x, y, physics, *args, **kwargs):
        Ax = physics.A(x)
        if isinstance(Ax, TensorList):
            gd = TensorList([self.d.grad(a, b) for a, b in zip(Ax, y)])
        else:
            gd = self.d.grad(Ax, y, *args, **kwargs)
        return physics.A_vjp(x, gd)

    def grad_d(self, u, y, *args, **kwargs):
        return self.d.grad(u, y, *args, **kwargs)

    def prox_d(self, u, y, *args, gamma=1.0, **kwargs):
        return self.d.prox(u, y, *args, gamma=gamma, **kwargs)

    def prox(self, x, y, physics, *args, gamma=1.0, stepsize_inter=1.0,
             max_iter_inter: int = 50, **kwargs):
        """Default prox by inner gradient descent (data_fidelity.py:172)."""

        def obj_grad(u):
            g = self.grad(u, y, physics)
            return jax.tree_util.tree_map(lambda gi, ui, xi: gamma * gi + (ui - xi), g, u, x)

        def body(_, u):
            g = obj_grad(u)
            return jax.tree_util.tree_map(lambda ui, gi: ui - stepsize_inter * gi, u, g)

        return jax.lax.fori_loop(0, max_iter_inter, body, x)

    def prox_conjugate(self, x, y, physics, *args, gamma=1.0, lamb=1.0, **kwargs):
        """Prox of the conjugate of the FULL fidelity f = d(A., y) by the
        Moreau identity on :meth:`prox` (reference Potential.prox_conjugate,
        potential.py:120 — DataFidelity inherits it unchanged, so the
        physics rides inside)."""
        return x - gamma * self.prox(
            x / gamma, y, physics, *args, gamma=lamb / gamma, **kwargs
        )

    def prox_d_conjugate(self, x, y, *args, gamma=1.0, lamb=1.0, **kwargs):
        """Moreau decomposition on the measurement-space distance d only."""
        return x - gamma * self.prox_d(x / gamma, y, *args, gamma=lamb / gamma, **kwargs)


class StackedPhysicsDataFidelity(DataFidelity):
    r"""Sum of per-operator fidelities for stacked physics
    (data_fidelity.py:113)."""

    def __init__(self, data_fidelity_list):
        self.data_fidelity_list = list(data_fidelity_list)
        self.d = None

    def fn(self, x, y, physics, *args, **kwargs):
        return sum(
            f.fn(x, yi, p)
            for f, yi, p in zip(self.data_fidelity_list, y, physics.physics_list)
        )

    def grad(self, x, y, physics, *args, **kwargs):
        grads = [
            f.grad(x, yi, p)
            for f, yi, p in zip(self.data_fidelity_list, y, physics.physics_list)
        ]
        tot = grads[0]
        for g in grads[1:]:
            tot = jax.tree_util.tree_map(jnp.add, tot, g)
        return tot


class L2(DataFidelity):
    r"""``f(x) = 1/(2 sigma^2)||Ax-y||^2`` with closed/Krylov prox via
    ``physics.prox_l2`` (data_fidelity.py:237).

    :Examples:

        The gradient is ``A^T(Ax - y)`` by the chain rule through the
        physics (data_fidelity.py:26):

        >>> import jax, jax.numpy as jnp
        >>> from deepinv_tpu.optim import L2
        >>> from deepinv_tpu.physics import Denoising
        >>> fid = L2()
        >>> physics = Denoising()
        >>> x = jnp.ones((1, 1, 4, 4)); y = jnp.zeros((1, 1, 4, 4))
        >>> float(fid.fn(x, y, physics)[0])
        8.0
        >>> bool(jnp.allclose(fid.grad(x, y, physics), x - y))
        True
    """

    def __init__(self, sigma: float = 1.0):
        super().__init__(d=L2Distance(sigma=sigma))
        self.sigma = sigma
        self.norm = 1 / (sigma**2)

    def prox(self, x, y, physics, *args, gamma=1.0, **kwargs):
        return physics.prox_l2(x, y, self.norm * gamma, **kwargs)

    def grad(self, x, y, physics, *args, **kwargs):
        if getattr(physics, "fast_normal", False):
            # A^T(Ax - y) split so the normal operator runs via the physics'
            # fast (Toeplitz/closed-form) path; A^T y is loop-invariant and
            # gets hoisted out of scan/while reconstruction loops by XLA
            import jax.tree_util as jtu

            ata = physics.A_adjoint_A(x)
            aty = physics.A_adjoint(y)
            return jtu.tree_map(lambda a, b: (a - b) * self.norm, ata, aty)
        return super().grad(x, y, physics, *args, **kwargs)


class IndicatorL2(DataFidelity):
    r"""Indicator of ||Ax - y|| <= r (data_fidelity.py:585)."""

    def __init__(self, radius: float = 0.0):
        super().__init__(d=IndicatorL2Distance(radius=radius))
        self.radius = radius

    def prox(
        self, x, y, physics, *args, radius=None, gamma=None,
        stepsize=None, crit_conv=1e-5, max_iter: int = 100, **kwargs,
    ):
        """Projection onto {x : ||Ax - y|| <= r} by the dual
        forward-backward algorithm (data_fidelity.py:620): the dual update
        uses the Moreau decomposition ``u <- u_ - step * proj(u_/step)`` —
        the ball projection is not positively homogeneous (center y != 0),
        so the scaling matters for optimality, not just feasibility."""
        radius = self.radius if radius is None else radius
        from ..physics import Denoising

        if isinstance(physics, Denoising):
            # A = I: the projection is the closed-form ball projection —
            # exact, and reverse-differentiable (the CP iterator with an
            # explicit K=A lands here)
            return self.d.prox(x, y, radius=radius)
        # the step size is a solver hyperparameter: keep the power method
        # out of the autodiff graph (its while_loop is not reverse-
        # differentiable, and d stepsize/d x is not wanted anyway)
        norm_AtA = jax.lax.stop_gradient(physics.compute_norm(x, max_iter=30))
        stepsize_val = 1.0 / norm_AtA if stepsize is None else stepsize

        def body(_, u):
            t = x - physics.A_adjoint(u)
            u_ = u + stepsize_val * physics.A(t)
            return u_ - stepsize_val * self.d.prox(
                u_ / stepsize_val, y, radius=radius)

        u = jax.lax.fori_loop(0, max_iter, body, physics.A(x))
        return x - physics.A_adjoint(u)


class PoissonLikelihood(DataFidelity):
    r"""Poisson NLL fidelity (data_fidelity.py:663)."""

    def __init__(self, gain: float = 1.0, bkg: float = 0.0, denormalize: bool = True):
        super().__init__(
            d=PoissonLikelihoodDistance(gain=gain, bkg=bkg, denormalize=denormalize)
        )


class L1(DataFidelity):
    r"""l1 fidelity (data_fidelity.py:692)."""

    def __init__(self):
        super().__init__(d=L1Distance())

    def prox(self, x, y, physics, *args, gamma=1.0, stepsize=None,
             max_iter: int = 100, **kwargs):
        """Dual forward-backward solver for ``prox`` of ``gamma ||A.-y||_1``
        (reference data_fidelity.py:712-756); fixed iterations under jit."""
        if stepsize is None:
            stepsize = 1.0 / physics.compute_sqnorm(x)
        u0 = physics.A(x)

        def body(_, carry):
            u, _t = carry
            t = x - physics.A_adjoint(u)
            u_ = u + stepsize * physics.A(t)
            u = u_ - stepsize * self.d.prox(u_ / stepsize, y,
                                            gamma=gamma / stepsize)
            return (u, t)

        _, t = jax.lax.fori_loop(0, max_iter, body, (u0, x))
        return t


class AmplitudeLoss(DataFidelity):
    r"""Amplitude loss for phase retrieval (data_fidelity.py:757)."""

    def __init__(self):
        super().__init__(d=AmplitudeLossDistance())


class LogPoissonLikelihood(DataFidelity):
    r"""Log-Poisson NLL (data_fidelity.py:776)."""

    def __init__(self, N0: float = 1024.0, mu: float = 1 / 50.0):
        super().__init__(d=LogPoissonLikelihoodDistance(N0=N0, mu=mu))


class ZeroFidelity(DataFidelity):
    r"""Identically zero fidelity (data_fidelity.py:798)."""

    def __init__(self):
        super().__init__(d=ZeroDistance())

    def fn(self, x, y, physics, *args, **kwargs):
        return jnp.zeros(x.shape[0], x.dtype)

    def grad(self, x, y, physics, *args, **kwargs):
        return jax.tree_util.tree_map(jnp.zeros_like, x)

    def prox(self, x, y, physics, *args, gamma=1.0, **kwargs):
        return x


class ItohFidelity(L2):
    r"""Itoh data fidelity for spatial phase unwrapping
    (reference data_fidelity.py:341): :math:`\frac{1}{2\sigma^2}\|Dx - w_t(Dy)\|^2`
    with D the forward finite-difference operator and ``w_t`` the wrapping
    operator. Use with :class:`deepinv_tpu.physics.SpatialUnwrapping`.
    """

    def __init__(self, sigma: float = 1.0, threshold: float = 1.0):
        super().__init__(sigma=sigma)
        self.threshold = threshold

    def D(self, x):
        """Forward differences stacked on a trailing axis, zero at borders;
        (horizontal, vertical) order as in the reference
        (data_fidelity.py:456)."""
        dh = jnp.diff(x, axis=-1, append=x[..., -1:])
        dv = jnp.diff(x, axis=-2, append=x[..., -1:, :])
        return jnp.stack([dh, dv], axis=-1)

    def D_adjoint(self, v):
        fwd = self.D
        (xt,) = jax.linear_transpose(
            fwd, transpose_primal(v, v.shape[:-1])
        )(v)
        return xt

    def wrap(self, v):
        t = self.threshold
        return v - t * jnp.round(v / t)

    def WD(self, y):
        return self.wrap(self.D(y))

    def fn(self, x, y, physics=None, *args, **kwargs):
        return self.d.fn(self.D(x), self.WD(y))

    def grad(self, x, y, physics=None, *args, **kwargs):
        return self.D_adjoint(self.d.grad(self.D(x), self.WD(y)))

    def prox(self, x, y, physics=None, *args, gamma=1.0, **kwargs):
        """DCT closed-form prox (reference data_fidelity.py:517, the
        Ramirez et al. 2024 solution): the finite-difference normal operator
        diagonalizes in the DCT-II basis, so the prox is one forward DCT,
        an elementwise divide by the cosine eigenvalue grid, and one inverse
        DCT. ``x=None`` gives the pure least-squares unwrapping (the
        ``D_dagger`` initialization); the reference's ``denom[0,0]=1`` DC
        pinning is replicated for cross-framework parity."""
        from ..ops import dct2, idct2

        psi = self.D_adjoint(self.WD(y))
        if x is not None:
            psi = psi + (gamma / 2) * x
        M, N = psi.shape[-2], psi.shape[-1]
        ci = jnp.cos(jnp.pi * jnp.arange(M) / M)[:, None]
        cj = jnp.cos(jnp.pi * jnp.arange(N) / N)[None, :]
        if x is None:
            denom = 2 * (2 - (ci + cj))
        else:
            denom = 2 * ((gamma / 4) + 2 - (ci + cj))
        denom = denom.at[0, 0].set(1.0)
        return idct2(dct2(psi) / denom)

    def D_dagger(self, y, **kwargs):
        """Fast DCT least-squares unwrapping initialization (reference
        data_fidelity.py:497)."""
        return self.prox(None, y, physics=None, gamma=None)
