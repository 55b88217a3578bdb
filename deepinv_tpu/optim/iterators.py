"""Optimization iterators (reference deepinv/optim/optim_iterators/, 11
algorithms, ~1.5k LoC).

Each iterator maps an iterate state ``X = {"est": (x, z), "it": k}`` to the
next state, given (data_fidelity, prior, cur_params, y, physics). States are
pytrees and every step is pure, so :class:`deepinv_tpu.optim.FixedPoint`
compiles the whole loop with ``lax.scan`` / ``lax.while_loop``.

``cur_params`` keys follow the reference convention
(optimizers.py:136): ``stepsize``, ``g_param`` (denoiser sigma), ``lambda``
(regularization weight), ``beta`` (relaxation), ``stepsize_dual``, ``a``
(FISTA momentum power).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..core import Module

__all__ = [
    "OptimIterator",
    "GDIteration",
    "PGDIteration",
    "FISTAIteration",
    "HQSIteration",
    "ADMMIteration",
    "DRSIteration",
    "CPIteration",
    "MDIteration",
    "PMDIteration",
    "SMIteration",
    "SIRTIteration",
    "MLEMIteration",
]


def objective_function(x, data_fidelity, prior, params, y, physics):
    """F(x) = f(x) + lambda g(x) (reference optim/utils.py:33)."""
    F = data_fidelity.fn(x, y, physics)
    if prior is not None and getattr(prior, "explicit_prior", False):
        F = F + params["lambda"] * prior.fn(x, params.get("g_param"))
    return F


class OptimIterator(Module):
    """Base: one step of a splitting algorithm
    (reference optim_iterator.py:13)."""

    requires_grad_g = False
    requires_prox_g = False

    def __init__(self, g_first: bool = False, has_cost: bool = False):
        self.g_first = g_first
        self.has_cost = has_cost

    def init_state(self, x_init, y, physics):
        """Initial state from the initialization image."""
        return {"est": (x_init, x_init), "it": jnp.asarray(0)}

    def get_output(self, X):
        return X["est"][0]

    def relaxation(self, u, v, beta):
        return beta * u + (1 - beta) * v

    # reference-named alias (optim_iterator.py relaxation_step)
    relaxation_step = relaxation

    def __call__(self, X, data_fidelity, prior, params, y, physics):
        raise NotImplementedError

    def _cost(self, x, data_fidelity, prior, params, y, physics):
        if self.has_cost:
            return objective_function(x, data_fidelity, prior, params, y, physics)
        return None


class GDIteration(OptimIterator):
    r"""Gradient descent: x_{k+1} = x_k - step (grad f + lambda grad g)
    (gradient_descent.py:12)."""

    requires_grad_g = True

    def __call__(self, X, data_fidelity, prior, params, y, physics):
        x = X["est"][0]
        grad = data_fidelity.grad(x, y, physics) + params["lambda"] * prior.grad(
            x, params.get("g_param")
        )
        x_new = x - params["stepsize"] * grad
        return {"est": (x_new, x_new), "it": X["it"] + 1}


class PGDIteration(OptimIterator):
    r"""Proximal gradient (pgd.py:12): gradient step on f then prox of g
    (or the reverse with ``g_first``)."""

    requires_prox_g = True

    def __call__(self, X, data_fidelity, prior, params, y, physics):
        x = X["est"][0]
        if not self.g_first:
            z = x - params["stepsize"] * data_fidelity.grad(x, y, physics)
            x_new = prior.prox(
                z, params.get("g_param"), gamma=params["lambda"] * params["stepsize"]
            )
        else:
            # reference pgd.py gStepPGD(g_first=True): GRADIENT step on g,
            # then prox of f — not a prox-prox (HQS-like) splitting
            z = x - params["lambda"] * params["stepsize"] * prior.grad(
                x, params.get("g_param")
            )
            x_new = data_fidelity.prox(z, y, physics, gamma=params["stepsize"])
        x_new = self.relaxation(x_new, x, params.get("beta", 1.0))
        return {"est": (x_new, z), "it": X["it"] + 1}


class FISTAIteration(OptimIterator):
    r"""FISTA with Chambolle-Dossal momentum alpha_k = (k+a-1)/(k+a)
    (pgd.py:35)."""

    requires_prox_g = True

    def __call__(self, X, data_fidelity, prior, params, y, physics):
        x_prev, z_prev = X["est"]
        k = X["it"]
        a = params.get("a", 3.0)
        alpha = (k + a - 1) / (k + a)
        if not self.g_first:
            u = z_prev - params["stepsize"] * data_fidelity.grad(z_prev, y, physics)
            x = prior.prox(
                u, params.get("g_param"), gamma=params["lambda"] * params["stepsize"]
            )
        else:
            # gradient step on g then prox of f (reference pgd.py:35)
            u = z_prev - params["lambda"] * params["stepsize"] * prior.grad(
                z_prev, params.get("g_param")
            )
            x = data_fidelity.prox(u, y, physics, gamma=params["stepsize"])
        z = x + alpha * (x - x_prev)
        return {"est": (x, z), "it": k + 1}


class HQSIteration(OptimIterator):
    r"""Half-quadratic splitting (hqs.py:11):
    u = prox_{stepsize f}(x); x = prox_{sigma lambda g}(u)."""

    requires_prox_g = True

    def __call__(self, X, data_fidelity, prior, params, y, physics):
        x = X["est"][0]
        if not self.g_first:
            z = data_fidelity.prox(x, y, physics, gamma=params["stepsize"])
            x_new = prior.prox(
                z, params.get("g_param"), gamma=params["lambda"] * params["stepsize"]
            )
        else:
            z = prior.prox(
                x, params.get("g_param"), gamma=params["lambda"] * params["stepsize"]
            )
            x_new = data_fidelity.prox(z, y, physics, gamma=params["stepsize"])
        x_new = self.relaxation(x_new, x, params.get("beta", 1.0))
        return {"est": (x_new, z), "it": X["it"] + 1}


class ADMMIteration(OptimIterator):
    r"""ADMM (admm.py:11): u = prox_f(x - z); x = prox_g(u + z);
    z = z + beta (u - x)."""

    requires_prox_g = True

    def init_state(self, x_init, y, physics):
        # the reference seeds the auxiliary variable with the iterate itself
        # (optimizers.py init gives est = (x0, x0); admm.py:58 only zeroes z
        # when shapes differ) — first iterations match bit-for-bit
        return {
            "est": (x_init, x_init),
            "it": jnp.asarray(0),
        }

    def __call__(self, X, data_fidelity, prior, params, y, physics):
        x, z = X["est"]
        if self.g_first:
            # reference admm.py:140: g-first flips the dual sign in BOTH
            # steps — u = prox_g(x - z); x = prox_f(u + z). Using the
            # g-last signs here makes the dual update positive-feedback
            # (diverges to NaN).
            u = prior.prox(
                x - z, params.get("g_param"), gamma=params["lambda"] * params["stepsize"]
            )
            x_new = data_fidelity.prox(u + z, y, physics, gamma=params["stepsize"])
        else:
            u = data_fidelity.prox(x - z, y, physics, gamma=params["stepsize"])
            x_new = prior.prox(
                u + z, params.get("g_param"), gamma=params["lambda"] * params["stepsize"]
            )
        z = z + params.get("beta", 1.0) * (u - x_new)
        return {"est": (x_new, z), "it": X["it"] + 1}


class DRSIteration(OptimIterator):
    r"""Douglas-Rachford splitting (drs.py:11)."""

    requires_prox_g = True

    def init_state(self, x_init, y, physics):
        return {"est": (x_init, x_init), "it": jnp.asarray(0)}

    def __call__(self, X, data_fidelity, prior, params, y, physics):
        x, z = X["est"]
        if self.g_first:
            u = prior.prox(
                z, params.get("g_param"), gamma=params["lambda"] * params["stepsize"]
            )
            x_new = data_fidelity.prox(2 * u - z, y, physics, gamma=params["stepsize"])
        else:
            u = data_fidelity.prox(z, y, physics, gamma=params["stepsize"])
            x_new = prior.prox(
                2 * u - z, params.get("g_param"),
                gamma=params["lambda"] * params["stepsize"],
            )
        z = z + params.get("beta", 1.0) * (x_new - u)
        return {"est": (x_new, z), "it": X["it"] + 1}


class CPIteration(OptimIterator):
    r"""Chambolle-Pock primal-dual (primal_dual_CP.py:173).

    State carries (x, z, u): primal, primal-bar, dual.
    """

    requires_prox_g = True

    # optional explicit splitting operator (reference CP params "K",
    # primal_dual_CP.py:70); defaults to the IDENTITY like the reference —
    # the physics enters through the full-fidelity prox_conjugate, so for
    # decomposable physics the dual step is a closed form
    K = None
    K_adjoint = None

    def _ops(self, physics):
        if self.K is not None:
            return self.K, self.K_adjoint
        ident = lambda v: v
        return ident, ident

    def init_state(self, x_init, y, physics):
        Kf, _ = self._ops(physics)
        Kx = Kf(x_init)
        # the reference seeds the dual with the measurement itself
        # (PDCP custom_init, optimizers.py:2219: u_init = y); fall back to
        # zeros when the dual space does not match y (custom K)
        same = jax.tree_util.tree_structure(Kx) == jax.tree_util.tree_structure(y) and all(
            a.shape == b.shape
            for a, b in zip(jax.tree_util.tree_leaves(Kx), jax.tree_util.tree_leaves(y))
        )
        u0 = y if same else jax.tree_util.tree_map(jnp.zeros_like, Kx)
        return {"est": (x_init, x_init, u0), "it": jnp.asarray(0)}

    def __call__(self, X, data_fidelity, prior, params, y, physics):
        x, xbar, u = X["est"]
        Kf, Kt = self._ops(physics)
        sigma = params.get("stepsize_dual", 1.0)
        tau = params["stepsize"]
        lam = params.get("lambda", 1.0)
        if self.g_first:
            # minimize d(Ax, y) + lambda g(Kx): roles swap — dual ascent
            # on (lambda g)*, primal prox of the full fidelity (reference
            # primal_dual_CP.py:161 gStepCP/fStepCP g_first branches).
            # Documented deviation: the reference passes gamma =
            # lambda*stepsize_dual into the dual prox while incrementing
            # with stepsize_dual alone, which fixes the dual at
            # u* in d(lambda g)(K x*/lambda) — a lambda-rescaled problem
            # (untested upstream: its own CP tests use g_first=False).
            # Using gamma = stepsize_dual with lamb=lambda makes both
            # splittings solve the SAME objective (verified by the
            # Tikhonov fixed-point battery).
            u = prior.prox_conjugate(
                u + sigma * Kf(xbar), params.get("g_param"),
                gamma=sigma, lamb=lam,
            )
            x_new = data_fidelity.prox(
                x - tau * Kt(u), y, physics, gamma=tau
            )
        else:
            # dual ascent on f*(u): u = prox_{sigma f*}(u + sigma K xbar);
            # f is the FULL fidelity d(A., y) (reference fStepCP:129)
            u = data_fidelity.prox_conjugate(
                u + sigma * Kf(xbar), y, physics, gamma=sigma
            )
            # primal descent on g: x = prox_{tau lambda g}(x - tau K^T u)
            x_new = prior.prox(
                x - tau * Kt(u), params.get("g_param"), gamma=tau * lam
            )
        xbar = x_new + params.get("beta", 1.0) * (x_new - x)
        return {"est": (x_new, xbar, u), "it": X["it"] + 1}

    def get_output(self, X):
        return X["est"][0]


class MDIteration(OptimIterator):
    r"""Mirror descent with a Bregman potential (gradient_descent.py:110)."""

    requires_grad_g = True

    def __init__(self, bregman_potential=None, **kwargs):
        super().__init__(**kwargs)
        if bregman_potential is None:
            from .bregman import BregmanL2

            bregman_potential = BregmanL2()
        self.bregman_potential = bregman_potential

    def __call__(self, X, data_fidelity, prior, params, y, physics):
        x = X["est"][0]
        v = data_fidelity.grad(x, y, physics) + params["lambda"] * prior.grad(
            x, params.get("g_param")
        )
        xi = self.bregman_potential.grad(x) - params["stepsize"] * v
        x_new = self.bregman_potential.grad_conj(xi)
        return {"est": (x_new, x_new), "it": X["it"] + 1}


class SIRTIteration(OptimIterator):
    r"""Simultaneous Iterative Reconstruction Technique (sirt.py:12):
    x_{k+1} = x_k + tau V A^T W (y - A x_k), with row/col-sum normalizers."""

    def __call__(self, X, data_fidelity, prior, params, y, physics, eps: float = 1e-10):
        x = X["est"][0]
        ones_x = jax.tree_util.tree_map(jnp.ones_like, x)
        ones_y = jax.tree_util.tree_map(jnp.ones_like, y)
        row_sum = physics.A(ones_x)  # W^{-1}
        col_sum = physics.A_adjoint(ones_y)  # V^{-1}
        W = jax.tree_util.tree_map(lambda r: 1.0 / jnp.clip(r, eps, None), row_sum)
        resid = jax.tree_util.tree_map(jnp.subtract, y, physics.A(x))
        upd = physics.A_adjoint(jax.tree_util.tree_map(jnp.multiply, W, resid))
        x_new = x + params["stepsize"] * upd / jnp.clip(col_sum, eps, None)
        return {"est": (x_new, x_new), "it": X["it"] + 1}


class MLEMIteration(OptimIterator):
    r"""Maximum-likelihood EM for Poisson problems (mlem.py:5):
    x <- x A^T(y / Ax) / (A^T 1 + lambda grad g)."""

    def __call__(self, X, data_fidelity, prior, params, y, physics, eps: float = 1e-15):
        x = X["est"][0]
        sensitivity = physics.A_adjoint(jax.tree_util.tree_map(jnp.ones_like, y))
        ratio = jax.tree_util.tree_map(
            lambda yi, ai: yi / jnp.clip(ai, eps, None), y, physics.A(x)
        )
        x_new = x * physics.A_adjoint(ratio)
        if prior is not None and not isinstance(prior, type(None)):
            from .prior import Zero

            if not isinstance(prior, Zero):
                denom = sensitivity + params["lambda"] * prior.grad(
                    x_new, params.get("g_param")
                )
            else:
                denom = sensitivity
        else:
            denom = sensitivity
        x_new = x_new / jnp.clip(denom, eps, None)
        return {"est": (x_new, x_new), "it": X["it"] + 1}


class PMDIteration(MDIteration):
    r"""Proximal mirror descent (reference optim_iterators/pgd.py:178):
    ``u = grad h*(grad h(x) - gamma grad f(x)); x = prox^h_{gamma lam g}(u)``.
    With the default ``BregmanL2`` potential this reduces to PGD."""

    requires_grad_g = False
    requires_prox_g = True

    def __call__(self, X, data_fidelity, prior, params, y, physics):
        x = X["est"][0]
        grad = params["stepsize"] * data_fidelity.grad(x, y, physics)
        u = self.bregman_potential.grad_conj(self.bregman_potential.grad(x) - grad)
        x_new = prior.bregman_prox(
            u,
            self.bregman_potential,
            params.get("g_param"),
            gamma=params["stepsize"] * params.get("lambda", 1.0),
        )
        return {"est": (x_new, x_new), "it": X["it"] + 1}


class SMIteration(OptimIterator):
    r"""Spectral-method iteration for phase retrieval
    (reference optim_iterators/spectral_methods.py:11): one power-iteration
    step on ``M = B^* diag(T(y)) B + lamb I`` followed by the prior prox,
    with normalization. ``physics`` must be a PhaseRetrieval."""

    requires_prox_g = True

    def __init__(self, lamb: float = 10.0, preprocessing=None, **kwargs):
        super().__init__(**kwargs)
        self.lamb = lamb
        self.preprocessing = preprocessing if preprocessing is not None else (
            lambda u: jnp.maximum(1 - 1 / jnp.clip(u, 1e-6, None), -5.0)
        )

    def __call__(self, X, data_fidelity, prior, params, y, physics):
        x = X["est"][0]
        yn = y / jnp.mean(y, axis=tuple(range(1, y.ndim)), keepdims=True)
        diag = self.preprocessing(yn)
        B, Bt = physics.B.A, physics.B.A_adjoint
        v = Bt(diag * B(x)) + self.lamb * x
        v = prior.prox(v, params.get("g_param"), gamma=params.get("stepsize", 1.0))
        norm = jnp.sqrt(
            jnp.sum(jnp.abs(v) ** 2, axis=tuple(range(1, v.ndim)), keepdims=True)
        )
        x_new = v / jnp.maximum(norm, 1e-12)
        return {"est": (x_new, x_new), "it": X["it"] + 1}
