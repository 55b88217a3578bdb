"""Optimization utilities (reference deepinv/optim/utils.py:
gradient_descent:63, check_conv:89, objective_function:33)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["gradient_descent", "check_conv", "objective_function"]


def objective_function(x, data_fidelity, prior, params, y, physics):
    """F(x) = f(x, y) + lambda g(x) (reference optim/utils.py:33)."""
    from .iterators import objective_function as _of

    return _of(x, data_fidelity, prior, params, y, physics)


def gradient_descent(grad_f, x0, step_size: float = 1.0, max_iter: int = 100, tol: float = 1e-5):
    """Simple GD loop as lax.while_loop (reference optim/utils.py:63)."""

    def cond(state):
        x, gnorm, it = state
        return jnp.logical_and(it < max_iter, gnorm > tol)

    def body(state):
        x, _, it = state
        g = grad_f(x)
        x = jax.tree_util.tree_map(lambda a, b: a - step_size * b, x, g)
        gn = jnp.sqrt(sum(jnp.sum(jnp.abs(v) ** 2) for v in jax.tree_util.tree_leaves(g)))
        return (x, gn, it + 1)

    x, _, _ = jax.lax.while_loop(cond, body, (x0, jnp.asarray(jnp.inf), jnp.asarray(0)))
    return x


def check_conv(X_prev, X, it, crit_conv: str = "residual", thres_conv: float = 1e-5):
    """Relative-change convergence test (reference optim/utils.py:89)."""
    if crit_conv == "residual":
        a = X_prev["est"][0] if isinstance(X_prev, dict) else X_prev
        b = X["est"][0] if isinstance(X, dict) else X
        num = jnp.sqrt(sum(jnp.sum(jnp.abs(u - v) ** 2) for u, v in zip(
            jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))))
        den = jnp.sqrt(sum(jnp.sum(jnp.abs(v) ** 2) for v in jax.tree_util.tree_leaves(b)))
        return num / jnp.maximum(den, 1e-12) < thres_conv
    elif crit_conv == "cost":
        ca = X_prev.get("cost") if isinstance(X_prev, dict) else None
        cb = X.get("cost") if isinstance(X, dict) else None
        if ca is None or cb is None:
            return jnp.asarray(False)
        return jnp.abs(cb - ca) / jnp.maximum(jnp.abs(cb), 1e-12) < thres_conv
    raise ValueError(crit_conv)


from dataclasses import dataclass


@dataclass
class AndersonAccelerationConfig:
    """API-parity config object (reference optimizers.py AndersonAccelerationConfig);
    fields map onto BaseOptim's anderson_* constructor args."""

    history_size: int = 5
    beta_anderson_acc: float = 1.0
    eps_anderson_acc: float = 1e-4


@dataclass
class BacktrackingConfig:
    """API-parity config (reference optimizers.py:74): Armijo backtracking.
    Maps onto FixedPoint(backtracking=True, backtracking_eta=eta)."""

    eta: float = 0.5
    gamma: float = 0.1


@dataclass
class DEQConfig:
    """API-parity config for deep-equilibrium fixed points; maps onto
    deepinv_tpu.unfolded.DEQ_builder arguments."""

    max_iter_backward: int = 50
    anderson_acceleration: bool = False
    history_size: int = 5
