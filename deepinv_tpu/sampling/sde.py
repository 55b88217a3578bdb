"""SDE framework for generation and posterior sampling
(reference deepinv/sampling/diffusion_sde.py:16-960, sde_solver.py).

``BaseSDE`` holds drift/diffusion callables; solvers (Euler-Maruyama, Heun)
run the time grid as a ``lax.scan`` with explicit keys. ``PosteriorDiffusion``
composes the reverse-time SDE drift with a noisy-data-fidelity guidance term
(reference noisy_datafidelity.py:99) — the guidance gradient is plain
``jax.grad`` through denoiser and physics.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..core import Module
from ..core.rng import ensure_key
from ..models.base import Reconstructor
from ..optim.data_fidelity import DataFidelity

__all__ = [
    "BaseSDE",
    "DiffusionSDE",
    "VarianceExplodingDiffusion",
    "VariancePreservingDiffusion",
    "FlowMatching",
    "EulerSolver",
    "HeunSolver",
    "PosteriorDiffusion",
    "DPSDataFidelity",
]


class BaseSDE(Module):
    r"""``dx = f(x,t) dt + g(t) dw`` (reference diffusion_sde.py:16).

    :Examples:

        An Ornstein-Uhlenbeck process integrated with Euler-Maruyama (the
        whole trajectory compiles to one ``lax.scan``):

        >>> import jax, jax.numpy as jnp
        >>> from deepinv_tpu.sampling import BaseSDE, EulerSolver
        >>> sde = BaseSDE(drift=lambda x, t: -x,
        ...               diffusion=lambda t: jnp.asarray(0.1))
        >>> solver = EulerSolver(timesteps=jnp.linspace(0, 1, 50))
        >>> x1 = solver.sample(sde, jnp.ones((1, 1, 4, 4)),
        ...                    key=jax.random.key(0))
        >>> bool(jnp.all(jnp.abs(x1) < 1.0))  # contracted toward 0
        True
    """

    def __init__(self, drift: Callable, diffusion: Callable):
        self.drift = drift
        self.diffusion = diffusion

    def sample_init(self, shape, key):
        """Sample from the end-time distribution of the forward diffusion
        (reference diffusion_sde.py:95) — defined by concrete SDEs."""
        raise NotImplementedError

    def discretize(self, x, t, dt, key):
        f = self.drift(x, t)
        g = self.diffusion(t)
        return f, g

    def sample(self, x_init, solver: "BaseSDESolver", key=None, seed: int = 0):
        """Integrate the SDE from ``x_init`` with ``solver`` (reference
        BaseSDE.sample, diffusion_sde.py)."""
        return solver.sample(self, x_init, key=key, seed=seed)


class BaseSDESolver(Module):
    """Base class for SDE solvers (reference sde_solver.py BaseSDESolver):
    holds the (static) time grid, the single ``step``, and the ``sample``
    scan over the grid."""

    def __init__(self, timesteps, rng_seed: int = 0):
        self.timesteps = jnp.asarray(timesteps, jnp.float32)
        self.rng_seed = rng_seed
        self.initial_rng_seed = rng_seed

    def randn_like(self, x, key=None):
        """Standard normal shaped like ``x`` (reference sde_solver.py
        ``randn_like``), keyed by the solver's seed when no key is given.
        Like the reference's stateful generator, seed-keyed draws ADVANCE:
        successive calls return fresh noise (an eager-mode utility — inside
        jit pass explicit keys instead)."""
        if key is None:
            draw = self._draw_counter = getattr(self, "_draw_counter", 0)
            key = jax.random.fold_in(ensure_key(None, self.rng_seed), draw)
            self._draw_counter = draw + 1
            return jax.random.normal(key, x.shape, x.dtype)
        return jax.random.normal(ensure_key(key, self.rng_seed), x.shape,
                                 x.dtype)

    def rng_manual_seed(self, seed=None):
        """Set the solver's default seed (reference sde_solver.py
        ``rng_manual_seed``); string seeds are hashed."""
        if seed is not None:
            if isinstance(seed, str):
                import hashlib

                seed = int(hashlib.sha256(seed.encode()).hexdigest()[:8], 16)
            self.rng_seed = int(seed)
        return self

    def reset_rng(self):
        """Restore the construction-time seed (reference ``reset_rng``)."""
        self.rng_seed = self.initial_rng_seed
        self._draw_counter = 0
        return self

    def step(self, sde, x, t, dt, key):
        """One stochastic step ``t -> t + dt`` (reference sde_solver.py
        ``step``)."""
        raise NotImplementedError

    def sample(self, sde, x_init, key=None, seed: int = 0):
        """Scan :meth:`step` over the time grid — one XLA program."""
        key = ensure_key(key, seed)
        ts = self.timesteps
        dts = ts[1:] - ts[:-1]
        keys = jax.random.split(key, dts.shape[0])

        def body(x, inp):
            k, t, dt = inp
            return self.step(sde, x, t, dt, k), None

        x, _ = jax.lax.scan(body, x_init, (keys, ts[:-1], dts))
        return x


class EulerSolver(BaseSDESolver):
    """Euler-Maruyama (reference sde_solver.py:202)."""

    def step(self, sde: BaseSDE, x, t, dt, key):
        f = sde.drift(x, t)
        g = sde.diffusion(t)
        z = jax.random.normal(key, x.shape, x.dtype)
        return x + f * dt + g * jnp.sqrt(jnp.abs(dt)) * z


class HeunSolver(BaseSDESolver):
    """Heun 2nd-order stochastic solver (reference sde_solver.py:231)."""

    def step(self, sde: BaseSDE, x, t, dt, key):
        z = jax.random.normal(key, x.shape, x.dtype)
        g = sde.diffusion(t)
        noise = g * jnp.sqrt(jnp.abs(dt)) * z
        f1 = sde.drift(x, t)
        x_pred = x + f1 * dt + noise
        f2 = sde.drift(x_pred, t + dt)
        return x + 0.5 * (f1 + f2) * dt + noise


class DiffusionSDE(BaseSDE):
    r"""Reverse-time diffusion with a score from a denoiser via Tweedie
    (reference diffusion_sde.py:~200)."""

    def sample_init(self, shape, key):
        """Draw from the prior at the initial (largest-noise) time
        (reference ``sample_init``; alias of :meth:`prior_sample`)."""
        return self.prior_sample(shape, key)

    def sigma_t(self, t):
        """Noise schedule sigma(t) (reference diffusion_sde.py sigma_t).

        Replaced per-instance by the callable given to the constructor;
        this class-level declaration documents the protocol.
        """
        raise NotImplementedError

    def __init__(self, denoiser, sigma_t: Callable, sigma_deriv: Callable,
                 alpha=1.0):
        self.denoiser = denoiser
        self.sigma_t = sigma_t
        self.sigma_deriv = sigma_deriv
        self.alpha = alpha if callable(alpha) else (lambda t, a=alpha: a)

        # alpha-family reverse SDE (reference diffusion_sde.py:178-186):
        # per |dt| (timesteps decrease) the update must be
        # +(1+alpha)/2 g^2 score with sqrt(alpha) g noise, g^2 = 2 s s' —
        # drift and diffusion must share the SAME alpha or the marginals
        # are wrong (alpha=0 is the probability-flow ODE)
        def drift(x, t):
            s = self.sigma_t(t)
            ds = self.sigma_deriv(t)
            a = self.alpha(t)
            return -(1 + a) * s * ds * self.score(x, t)

        def diffusion(t):
            s = self.sigma_t(t)
            ds = self.sigma_deriv(t)
            a = self.alpha(t)
            return jnp.sqrt(jnp.clip(2 * a * s * ds, 0, None))

        super().__init__(drift, diffusion)

    def score(self, x, t):
        s = self.sigma_t(t)
        return (self.denoiser(x, s) - x) / jnp.clip(s**2, 1e-8, None)

    def scale_t(self, t):
        """State scaling (1 for VE; sqrt(alpha_bar) for VP) — the
        guidance denoiser must see ``x / scale_t`` (reference
        diffusion_sde.py:1040-1060)."""
        return jnp.asarray(1.0)


class VarianceExplodingDiffusion(DiffusionSDE):
    r"""VE-SDE: sigma(t) = sigma_min (sigma_max/sigma_min)^t
    (reference diffusion_sde.py VE)."""

    def __init__(self, denoiser, sigma_min: float = 0.02, sigma_max: float = 10.0,
                 alpha=0.25):
        self.sigma_min = sigma_min
        self.sigma_max = sigma_max
        ratio = sigma_max / sigma_min
        sigma_t = lambda t: sigma_min * ratio**t
        sigma_deriv = lambda t: sigma_min * (ratio**t) * jnp.log(ratio)
        # alpha=0.25 is the reference's VE default (diffusion_sde.py:702)
        super().__init__(denoiser, sigma_t, sigma_deriv, alpha=alpha)

    def prior_sample(self, shape, key):
        return jax.random.normal(key, shape) * self.sigma_max


class VariancePreservingDiffusion(DiffusionSDE):
    r"""VP (DDPM) SDE (reference diffusion_sde.py VP/Song)."""

    def __init__(self, denoiser, beta_min: float = 0.1, beta_max: float = 20.0):
        self.beta_min = beta_min
        self.beta_max = beta_max
        self.denoiser = denoiser

        def beta(t):
            return beta_min + t * (beta_max - beta_min)

        def alpha_bar(t):
            return jnp.exp(-0.5 * t**2 * (beta_max - beta_min) - t * beta_min)

        self._beta = beta
        self._alpha_bar = alpha_bar

        def drift(x, t):
            b = beta(t)
            ab = alpha_bar(t)
            sigma = jnp.sqrt(jnp.clip(1 - ab, 1e-8, None) / jnp.clip(ab, 1e-8, None))
            x0 = self.denoiser(x / jnp.sqrt(jnp.clip(ab, 1e-8, None)), sigma)
            score = (jnp.sqrt(ab) * x0 - x) / jnp.clip(1 - ab, 1e-8, None)
            return -0.5 * b * x - b * score  # reverse drift (time reversed)

        def diffusion(t):
            return jnp.sqrt(beta(t))

        BaseSDE.__init__(self, drift, diffusion)

    def sigma_t(self, t):
        ab = self._alpha_bar(t)
        return jnp.sqrt(jnp.clip(1 - ab, 1e-8, None) / jnp.clip(ab, 1e-8, None))

    def scale_t(self, t):
        return jnp.sqrt(jnp.clip(self._alpha_bar(t), 1e-8, None))

    def prior_sample(self, shape, key):
        return jax.random.normal(key, shape)


class EDMDiffusionSDE(DiffusionSDE):
    r"""Karras-style generative SDE with scale/noise schedules
    (reference diffusion_sde.py:248):

    ``dx = (s'/s x - (1+alpha) s^2 sigma sigma' score) dt
         + s sqrt(2 alpha sigma sigma') dw``,

    solved reverse in time. ``variance_preserving=True`` sets
    ``s = (1+sigma^2)^{-1/2}``; ``variance_exploding=True`` sets ``s = 1``.
    Unsupplied derivatives are obtained with ``jax.grad``.
    """

    def __init__(self, sigma_t: Callable, scale_t: Callable = None,
                 sigma_prime_t: Callable = None, scale_prime_t: Callable = None,
                 variance_preserving: bool = False, variance_exploding: bool = False,
                 alpha=1.0, T: float = 1.0, denoiser=None):
        self.denoiser = denoiser
        self.T = T
        self.sigma_t = sigma_t
        if scale_t is None:
            if variance_preserving:
                scale_t = lambda t: (1 + sigma_t(t) ** 2) ** -0.5
            elif variance_exploding:
                scale_t = lambda t: jnp.ones(())
            else:
                raise ValueError("provide scale_t or set a variance_* flag")
        self.scale_t = scale_t
        if sigma_prime_t is None:
            sigma_prime_t = jax.grad(lambda t: jnp.sum(sigma_t(jnp.asarray(t))))
        self.sigma_prime_t = sigma_prime_t
        if scale_prime_t is None:
            scale_prime_t = jax.grad(lambda t: jnp.sum(self.scale_t(t)))
        self.scale_prime_t = scale_prime_t
        self.alpha = alpha if callable(alpha) else (lambda t, a=alpha: a)

        def drift(x, t):
            sc, sp = self.scale_t(t), self.scale_prime_t(t)
            sg, sgp = self.sigma_t(t), self.sigma_prime_t(t)
            a = self.alpha(t)
            return (sp / sc) * x - (1 + a) * sc**2 * sg * sgp * self.score(x, t)

        def diffusion(t):
            sc = self.scale_t(t)
            a = self.alpha(t)
            return sc * jnp.sqrt(jnp.clip(2 * a * self.sigma_t(t) * self.sigma_prime_t(t), 0, None))

        BaseSDE.__init__(self, drift, diffusion)

    def score(self, x, t):
        """Score via Tweedie on the de-scaled variable:
        ``(D(x/s, sigma) - x/s) / (s sigma^2)``."""
        sc = self.scale_t(t)
        sg = self.sigma_t(t)
        u = x / sc
        return (self.denoiser(u, sg) - u) / jnp.clip(sc * sg**2, 1e-12, None)

    def prior_sample(self, shape, key):
        sT = self.scale_t(self.T) * self.sigma_t(self.T)
        return jax.random.normal(key, shape) * sT


class SongDiffusionSDE(EDMDiffusionSDE):
    r"""Song et al. (2021) formulation (reference diffusion_sde.py:477):
    forward ``dx = -1/2 beta(t) x dt + sqrt(xi(t)) dw``, converted to the
    EDM (scale, noise) parametrization with
    ``s(t) = exp(-1/2 B(t))``, ``sigma(t) = sqrt(int_0^t xi/s^2)``.
    ``B_t`` defaults to numerical integration on a fixed Simpson grid.
    """

    def __init__(self, beta_t: Callable = None, B_t: Callable = None,
                 xi_t: Callable = None, variance_preserving: bool = False,
                 variance_exploding: bool = False, alpha=1.0, T: float = 1.0,
                 denoiser=None, n_quad: int = 257):
        if variance_preserving:
            if beta_t is None:
                beta_t = lambda t: 0.1 + t * (20.0 - 0.1)
            xi_t = beta_t
        if variance_exploding:
            beta_t = lambda t: jnp.zeros(())
            if xi_t is None:
                raise ValueError("variance_exploding needs xi_t")
        if beta_t is None or xi_t is None:
            raise ValueError("provide beta_t and xi_t (or a variance_* flag)")

        # trapezoid cumulative integrals on a fixed grid (static shapes)
        grid = jnp.linspace(0.0, T, n_quad)

        def cumint(f):
            vals = jax.vmap(lambda t: jnp.asarray(f(t), jnp.float32))(grid)
            dt = grid[1] - grid[0]
            c = jnp.concatenate([jnp.zeros((1,)), jnp.cumsum(0.5 * (vals[1:] + vals[:-1]) * dt)])
            return lambda t: jnp.interp(t, grid, c)

        B = B_t if B_t is not None else cumint(beta_t)
        scale_t = lambda t: jnp.exp(-0.5 * B(t))
        var_int = cumint(lambda t: xi_t(t) / jnp.clip(scale_t(t) ** 2, 1e-12, None))
        sigma_t = lambda t: jnp.sqrt(jnp.clip(var_int(t), 1e-12, None))
        super().__init__(
            sigma_t=sigma_t, scale_t=scale_t, alpha=alpha, T=T, denoiser=denoiser
        )


class FlowMatching(EDMDiffusionSDE):
    r"""Flow matching as an EDM-parametrized SDE (reference
    diffusion_sde.py:602): linear interpolation ``x_t = a(t) x_0 + b(t) z``
    maps to scale ``s = a`` and noise ``sigma = b / a``; ``alpha = 0`` (the
    default) is the straight-path ODE. The denoiser sees the de-scaled state
    ``x / a(t)`` (through :meth:`EDMDiffusionSDE.score`).
    """

    def __init__(self, denoiser=None, timesteps=None,
                 a_t: Callable = None, a_prime_t: Callable = None,
                 b_t: Callable = None, b_prime_t: Callable = None,
                 alpha=0.0, T: float = 0.99):
        a = a_t if a_t is not None else (lambda t: 1 - t)
        ap = a_prime_t if a_prime_t is not None else (lambda t: -jnp.ones(()))
        b = b_t if b_t is not None else (lambda t: t)
        bp = b_prime_t if b_prime_t is not None else (lambda t: jnp.ones(()))
        sigma_t = lambda t: b(t) / a(t)
        sigma_prime_t = lambda t: (bp(t) * a(t) - b(t) * ap(t)) / a(t) ** 2
        super().__init__(sigma_t=sigma_t, scale_t=a,
                         sigma_prime_t=sigma_prime_t, scale_prime_t=ap,
                         alpha=alpha, T=T, denoiser=denoiser)
        ts = jnp.asarray(
            timesteps if timesteps is not None else np.linspace(T, 0.0, 50),
            jnp.float32,
        )
        # t = 1 has a(1) = 0 (infinite sigma): clamp to the start time T
        self.timesteps = jnp.clip(ts, 0.0, T)

    def sample(self, x_init, key=None, seed: int = 0):
        return EulerSolver(self.timesteps).sample(self, x_init, key=key,
                                                  seed=seed)

    def velocity(self, x, t, *args, **kwargs):
        """Velocity field of the flow-matching process — the drift of the
        backward SDE (reference diffusion_sde.py:687)."""
        return self.drift(x, t)


class NoisyDataFidelity(DataFidelity):
    r"""Base preconditioned data fidelity for diffusion posterior sampling
    (reference noisy_datafidelity.py:9): ``grad(x_t, y) = P(A(x_t') - y)``
    with preconditioner ``P = A^T`` and ``x_t' = x_t`` by default.

    Inherits the full :class:`~deepinv_tpu.optim.DataFidelity` potential
    surface (``fn``/``prox``/``conjugate``/...) like the reference."""

    def __init__(self, weight: float = 1.0):
        super().__init__()
        self.weight = weight

    def precond(self, u, physics):
        return physics.A_adjoint(u) if hasattr(physics, "A_adjoint") else physics.A_dagger(u)

    def diff(self, x, y, physics, **kwargs):
        return physics.A(x) - y

    def grad(self, x, y, physics, sigma=None, **kwargs):
        return self.weight * self.precond(self.diff(x, y, physics, **kwargs), physics)


class DPSDataFidelity(NoisyDataFidelity):
    r"""Noisy data-fidelity guidance
    ``grad weight * sqrt(1/2) ||y - A(D(x, sigma))||``
    (reference noisy_datafidelity.py:99, loss = sqrt(L2Distance * m/B)
    = ||r|| / sqrt(2)).

    :param clip: optional (lo, hi) clipping of the denoised output
        (the reference DPS uses (-1, 1), diffusion.py:562).
    """

    def __init__(self, denoiser, weight: float = 1.0, clip=None):
        super().__init__(weight=weight)
        self.denoiser = denoiser
        self.clip = tuple(sorted(clip)) if clip is not None else None

    def grad(self, x, y, physics, sigma):
        def loss(u):
            x0 = self.denoiser(u, sigma)
            if self.clip is not None:
                x0 = jnp.clip(x0, self.clip[0], self.clip[1])
            r = physics.A(x0) - y
            return jnp.sqrt(0.5 * jnp.sum(r**2))

        return self.weight * jax.grad(loss)(x)


class PosteriorDiffusion(Reconstructor):
    r"""Reverse SDE with data-fidelity guidance (reference
    diffusion_sde.py:825-960): drift = unconditional reverse drift + g(t)^2 *
    grad log p(y | x_t)."""

    def __init__(self, sde: DiffusionSDE, data_fidelity: DPSDataFidelity, solver=None, timesteps=None):
        self.sde = sde
        self.data_fidelity = data_fidelity
        if timesteps is None:
            timesteps = np.linspace(1.0, 1e-3, 100)
        self.solver = solver if solver is not None else EulerSolver(timesteps)

    def __call__(self, y, physics, key=None, seed: int = 0, x_init=None, **kwargs):
        key = ensure_key(key, seed)
        kp, ks = jax.random.split(key)
        shape = physics.A_adjoint(y).shape
        if x_init is None:
            x_init = self.sde.prior_sample(shape, kp)

        base_drift = self.sde.drift
        base_diff = self.sde.diffusion

        def guided_drift(x, t):
            g2 = base_diff(t) ** 2
            sigma = self.sde.sigma_t(t) if hasattr(self.sde, "sigma_t") else 0.1
            # the guidance denoiser sees the x0-scaled state x / scale(t)
            # and the gradient is mapped back by 1/scale (reference
            # diffusion_sde.py:1040-1060); scale = 1 for VE, sqrt(abar)
            # for VP
            scale = self.sde.scale_t(t) if hasattr(self.sde, "scale_t") else 1.0
            guide = self.data_fidelity.grad(x / scale, y, physics, sigma) / scale
            # sign convention: our drifts are integrated with NEGATIVE dt
            # (timesteps decrease), so adding +g2*guide to the drift yields
            # the desired -g2*grad_x||r|| update per |dt| — the reverse SDE
            # moves along +grad log p(y|x_t) (reference
            # diffusion_sde.py:1040-1060 with its -f+... backward form)
            return base_drift(x, t) + g2 * guide

        guided = BaseSDE(guided_drift, base_diff)
        # integrate backwards: timesteps decrease; dt negative handled by solver
        return self.solver.sample(guided, x_init, key=ks)

    def score(self, y, physics, x, t, *args, **kwargs):
        """Conditional score ``grad log p_t(x | y)`` (reference
        diffusion_sde.py:188): unconditional SDE score minus the
        data-fidelity guidance gradient evaluated on the de-scaled state."""
        if self.data_fidelity is None:
            return self.sde.score(x, t, *args, **kwargs)
        sigma = self.sde.sigma_t(t)
        scale = self.sde.scale_t(t) if hasattr(self.sde, "scale_t") else 1.0
        return (self.sde.score(x, t, *args, **kwargs)
                - self.data_fidelity.grad(x / scale, y, physics, sigma) / scale)

    forward = __call__
