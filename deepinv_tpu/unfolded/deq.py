"""Deep equilibrium models with implicit differentiation
(reference deepinv/optim/optimizers.py:734-817 DEQ_additional_step,
DEQConfig:38).

The reference backpropagates by running a *second* fixed-point iteration on
the adjoint equation ``v = J^T v + u``. Here that is a ``jax.custom_vjp``:

- forward: non-differentiated ``lax.while_loop`` to the equilibrium
  ``x* = T(x*, params)`` — O(1) memory, any number of iterations;
- backward: Neumann/fixed-point solve of ``w = u + J_x T(x*)^T w`` (each
  step one ``jax.vjp`` call), then parameter cotangents via
  ``J_params T(x*)^T w``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["deq_fixed_point"]


def deq_fixed_point(T, params, x0, max_iter: int = 50, tol: float = 1e-4, backward_iter: int = 30, backward_tol: float = 1e-6):
    """Differentiable equilibrium of ``x = T(params, x)``.

    :param T: iteration map ``T(params, x) -> x`` (pytree params).
    :param params: pytree of parameters (gradients flow into these).
    :param x0: initial iterate.
    """
    leaves, treedef = jax.tree_util.tree_flatten(params)
    return _deq(treedef, T, leaves, x0, max_iter, tol, backward_iter, backward_tol)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 4, 5, 6, 7))
def _deq(treedef, T, leaves, x0, max_iter, tol, backward_iter, backward_tol):
    params = jax.tree_util.tree_unflatten(treedef, leaves)

    def cond(state):
        x, x_prev, it = state
        diff = jnp.sqrt(sum(jnp.sum(jnp.abs(a - b) ** 2) for a, b in zip(
            jax.tree_util.tree_leaves(x), jax.tree_util.tree_leaves(x_prev))))
        nrm = jnp.sqrt(sum(jnp.sum(jnp.abs(a) ** 2) for a in jax.tree_util.tree_leaves(x)))
        return jnp.logical_and(it < max_iter, diff / jnp.maximum(nrm, 1e-12) > tol)

    def body(state):
        x, _, it = state
        return (T(params, x), x, it + 1)

    x1 = T(params, x0)
    x_star, _, _ = jax.lax.while_loop(cond, body, (x1, x0, jnp.asarray(1)))
    return x_star


def _deq_fwd(treedef, T, leaves, x0, max_iter, tol, backward_iter, backward_tol):
    x_star = _deq(treedef, T, leaves, x0, max_iter, tol, backward_iter, backward_tol)
    return x_star, (leaves, x_star)


def _deq_bwd(treedef, T, max_iter, tol, backward_iter, backward_tol, res, g):
    leaves, x_star = res
    params = jax.tree_util.tree_unflatten(treedef, leaves)

    # vjp of T at the equilibrium w.r.t. (params, x)
    _, vjp_fn = jax.vjp(lambda lv, x: T(jax.tree_util.tree_unflatten(treedef, lv), x), leaves, x_star)

    def cond(state):
        w, w_prev, it = state
        diff = jnp.sqrt(sum(jnp.sum(jnp.abs(a - b) ** 2) for a, b in zip(
            jax.tree_util.tree_leaves(w), jax.tree_util.tree_leaves(w_prev))))
        return jnp.logical_and(it < backward_iter, diff > backward_tol)

    def body(state):
        w, _, it = state
        _, jt_w = vjp_fn(w)
        w_new = jax.tree_util.tree_map(jnp.add, g, jt_w)
        return (w_new, w, it + 1)

    w0 = g
    _, jt_g = vjp_fn(g)
    w1 = jax.tree_util.tree_map(jnp.add, g, jt_g)
    w, _, _ = jax.lax.while_loop(cond, body, (w1, w0, jnp.asarray(1)))

    dparams, _ = vjp_fn(w)
    dx0 = jax.tree_util.tree_map(jnp.zeros_like, x_star)
    return (dparams, dx0)


_deq.defvjp(_deq_fwd, _deq_bwd)
