"""Fixed-point iteration engine (reference deepinv/optim/fixed_point.py:13).

Two compilation modes, replacing the reference's Python ``for`` loop with
host-side convergence checks (fixed_point.py:262-361):

- ``early_stop=False`` → ``lax.scan`` over a *stacked per-iteration parameter
  pytree* (each leaf has leading dim ``max_iter``); the whole reconstruction
  is one XLA program, unrolled nowhere, and differentiable (for unfolded
  networks the scan gives reverse-mode through all iterations).
- ``early_stop=True`` → ``lax.while_loop`` carrying the convergence flag;
  residual/cost criteria evaluated on-device (no host sync per iteration —
  this alone is a large throughput win over the reference on accelerators).

Anderson acceleration (reference fixed_point.py:117-260) is implemented as
batched least-squares on a rolling history buffer carried through the scan.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..core import Module

__all__ = ["FixedPoint"]


def _index_params(params, it):
    """Select iteration ``it`` from a stacked per-iteration param pytree."""
    return jax.tree_util.tree_map(
        lambda v: jax.lax.dynamic_index_in_dim(v, it, axis=0, keepdims=False),
        params,
    )


def _residual(x_new, x_old):
    num = sum(
        jnp.sum(jnp.abs(a - b) ** 2)
        for a, b in zip(jax.tree_util.tree_leaves(x_new), jax.tree_util.tree_leaves(x_old))
    )
    den = sum(jnp.sum(jnp.abs(a) ** 2) for a in jax.tree_util.tree_leaves(x_new))
    return jnp.sqrt(num) / jnp.maximum(jnp.sqrt(den), 1e-12)


class FixedPoint(Module):
    """Iterate ``X_{k+1} = iterator(X_k, ...)`` to convergence.

    :param iterator: an :class:`deepinv_tpu.optim.iterators.OptimIterator`.
    :param max_iter: iteration budget (static).
    :param early_stop: use while_loop with the convergence criterion.
    :param crit_conv: 'residual' (relative iterate change).
    :param thres_conv: convergence threshold.
    :param anderson_acceleration: enable Anderson mixing.
    :param history_size: Anderson history length.
    :param beta_anderson_acc: Anderson relaxation.
    :param eps_anderson_acc: Tikhonov regularization of the Anderson LS system.
    :param remat: rematerialize each iteration in the backward pass
        (``jax.checkpoint``) — O(sqrt)-memory training of deep unrolled nets
        at the cost of one extra forward per iteration.
    :param backtracking: per-iteration Armijo backtracking on the stepsize
        (reference BacktrackingConfig, optimizers.py:74): if the objective
        increased, retry the iteration with the stepsize halved (one retry
        per iteration, carried into subsequent iterations).
    """

    def __init__(
        self,
        iterator,
        max_iter: int = 50,
        early_stop: bool = False,
        crit_conv: str = "residual",
        thres_conv: float = 1e-5,
        anderson_acceleration: bool = False,
        history_size: int = 5,
        beta_anderson_acc: float = 1.0,
        eps_anderson_acc: float = 1e-4,
        remat: bool = False,
        backtracking: bool = False,
        backtracking_eta: float = 0.5,
    ):
        self.iterator = iterator
        self.max_iter = max_iter
        self.early_stop = early_stop
        self.crit_conv = crit_conv
        self.thres_conv = thres_conv
        self.anderson_acceleration = anderson_acceleration
        self.history_size = history_size
        self.beta_anderson_acc = beta_anderson_acc
        self.eps_anderson_acc = eps_anderson_acc
        self.remat = remat
        self.backtracking = backtracking
        self.backtracking_eta = backtracking_eta

    # ------------------------------------------------------------------
    def __call__(self, x_init, data_fidelity, prior, params_iter, y, physics):
        """Run the loop. ``params_iter`` is a pytree whose leaves have leading
        dimension ``max_iter`` (one slice per iteration)."""
        if isinstance(x_init, dict):
            # reference custom_init dict form (optimizers.py:238): the dict
            # IS the initial state, e.g. {"est": (x0, z0)}
            X0 = dict(x_init)
            X0.setdefault("it", jnp.asarray(0))
        else:
            X0 = self.iterator.init_state(x_init, y, physics)
        if self.anderson_acceleration:
            return self._run_anderson(X0, data_fidelity, prior, params_iter, y, physics)
        if self.early_stop:
            return self._run_while(X0, data_fidelity, prior, params_iter, y, physics)
        return self._run_scan(X0, data_fidelity, prior, params_iter, y, physics)

    def _step(self, X, cur_params, data_fidelity, prior, y, physics):
        return self.iterator(X, data_fidelity, prior, cur_params, y, physics)

    def single_iteration(self, X, cur_data_fidelity, cur_prior, cur_params,
                         y, physics, **kwargs):
        """One iteration of the underlying iterator (reference
        fixed_point.py ``single_iteration``)."""
        return self._step(X, cur_params, cur_data_fidelity, cur_prior, y,
                          physics)

    def init_anderson_acceleration(self, x0):
        """Zeroed Anderson history buffers ``(X_hist, F_hist)`` of shape
        ``(B, history_size, N)`` for iterate pytree ``x0`` (reference
        fixed_point.py:117)."""
        flat = jnp.concatenate(
            [v.reshape(v.shape[0], -1)
             for v in jax.tree_util.tree_leaves(x0)], axis=1)
        B, N = flat.shape
        m = self.history_size
        return jnp.zeros((B, m, N)), jnp.zeros((B, m, N))

    def anderson_acceleration_step(self, k, x_prev_flat, gx_flat, X_hist,
                                   F_hist):
        """One Anderson mixing update (reference fixed_point.py:169): insert
        ``(x_k, T(x_k) - x_k)`` into the rolling history, solve the
        regularized least-squares for the mixing weights, and return
        ``(x_acc_flat, X_hist, F_hist)``."""
        m = self.history_size
        B = x_prev_flat.shape[0]
        f = gx_flat - x_prev_flat
        slot = jnp.mod(k, m)
        X_hist = jax.lax.dynamic_update_index_in_dim(X_hist, x_prev_flat,
                                                     slot, axis=1)
        F_hist = jax.lax.dynamic_update_index_in_dim(F_hist, f, slot, axis=1)
        n = jnp.minimum(k + 1, m)
        valid = (jnp.arange(m) < n).astype(f.dtype)
        Fv = F_hist * valid[None, :, None]
        G = jnp.einsum("bmn,bkn->bmk", Fv, Fv) + self.eps_anderson_acc * jnp.eye(m)
        sol = jnp.linalg.solve(G, jnp.broadcast_to(valid, (B, m))[..., None])[..., 0]
        alpha = sol * valid / jnp.sum(sol * valid, axis=1, keepdims=True)
        beta = self.beta_anderson_acc
        x_acc = jnp.einsum(
            "bm,bmn->bn", alpha,
            beta * (X_hist + F_hist) + (1 - beta) * X_hist)
        x_acc = jnp.where(k + 1 < 2, gx_flat, x_acc)
        return x_acc, X_hist, F_hist

    def _run_scan(self, X0, data_fidelity, prior, params_iter, y, physics):
        from .iterators import objective_function

        if self.backtracking:
            def body(carry, cur_params):
                X, scale = carry
                cur = dict(cur_params)
                cur["stepsize"] = cur["stepsize"] * scale
                X_new = self._step(X, cur, data_fidelity, prior, y, physics)
                F_old = jnp.sum(objective_function(
                    X["est"][0], data_fidelity, prior, cur, y, physics))
                F_new = jnp.sum(objective_function(
                    X_new["est"][0], data_fidelity, prior, cur, y, physics))
                # one Armijo retry with a halved (persistent) stepsize scale
                def retry(_):
                    cur2 = dict(cur)
                    cur2["stepsize"] = cur["stepsize"] * self.backtracking_eta
                    Xr = self._step(X, cur2, data_fidelity, prior, y, physics)
                    return Xr, scale * self.backtracking_eta

                def keep(_):
                    return X_new, scale

                X_out, scale = jax.lax.cond(F_new > F_old, retry, keep, None)
                return (X_out, scale), None

            if self.remat:
                body = jax.checkpoint(body)
            (X, _), _ = jax.lax.scan(
                body, (X0, jnp.asarray(1.0)), params_iter, length=self.max_iter
            )
            return X

        def body(X, cur_params):
            X_new = self._step(X, cur_params, data_fidelity, prior, y, physics)
            return X_new, None

        if self.remat:
            body = jax.checkpoint(body)
        X, _ = jax.lax.scan(body, X0, params_iter, length=self.max_iter)
        return X

    def _run_while(self, X0, data_fidelity, prior, params_iter, y, physics):
        def cond(carry):
            X, converged = carry
            return jnp.logical_and(X["it"] < self.max_iter, jnp.logical_not(converged))

        def body(carry):
            X, _ = carry
            cur = _index_params(params_iter, X["it"])
            X_new = self._step(X, cur, data_fidelity, prior, y, physics)
            res = _residual(X_new["est"][0], X["est"][0])
            return (X_new, res < self.thres_conv)

        X, _ = jax.lax.while_loop(cond, body, (X0, jnp.asarray(False)))
        return X

    # -- Anderson acceleration (fixed_point.py:117-260) -------------------
    def _run_anderson(self, X0, data_fidelity, prior, params_iter, y, physics):
        m = self.history_size
        x0 = X0["est"][0]
        flat0 = jnp.concatenate([v.reshape(v.shape[0], -1) for v in jax.tree_util.tree_leaves(x0)], axis=1)
        B, N = flat0.shape

        leaves0 = jax.tree_util.tree_leaves(x0)
        treedef = jax.tree_util.tree_structure(x0)
        shapes = [v.shape for v in leaves0]

        def to_flat(x):
            return jnp.concatenate(
                [v.reshape(v.shape[0], -1) for v in jax.tree_util.tree_leaves(x)], axis=1
            )

        def from_flat(f):
            out, o = [], 0
            for s in shapes:
                import numpy as _np

                n = int(_np.prod(s[1:]))
                out.append(f[:, o : o + n].reshape(s))
                o += n
            return jax.tree_util.tree_unflatten(treedef, out)

        X_hist0, F_hist0 = self.init_anderson_acceleration(x0)

        def body(carry, cur_params):
            X, X_hist, F_hist = carry
            k = X["it"]
            x_prev = to_flat(X["est"][0])
            X_new = self._step(X, cur_params, data_fidelity, prior, y, physics)
            gx = to_flat(X_new["est"][0])  # T(x_k)
            x_acc, X_hist, F_hist = self.anderson_acceleration_step(
                k, x_prev, gx, X_hist, F_hist)
            est = list(X_new["est"])
            est[0] = from_flat(x_acc)
            X_new = {**X_new, "est": tuple(est)}
            return (X_new, X_hist, F_hist), None

        (X, _, _), _ = jax.lax.scan(body, (X0, X_hist0, F_hist0), params_iter, length=self.max_iter)
        return X
