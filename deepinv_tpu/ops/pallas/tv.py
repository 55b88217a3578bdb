"""Pallas TPU kernel for the Chambolle total-variation prox.

The XLA version (`deepinv_tpu.optim.prior.TVPrior.prox`) runs the dual
projection as a ``fori_loop`` whose carry — the dual field ``p`` — round-trips
HBM every iteration (~6 HBM passes/iter after fusion). This kernel keeps
``x`` and ``p`` resident in VMEM for the *entire* loop: one HBM read of the
image, ``n_iter`` iterations at VPU speed, one HBM write. For the typical
50-100 iteration budget this removes ~99% of the memory traffic.

Numerics mirror prior.py's update exactly (same operator, same tau):
    p <- (p + tau * grad(div(p) - x/gamma)) / (1 + tau * |grad(...)|)
    out = x - gamma * div(p)

Backward: ``jax.custom_vjp`` whose bwd re-runs the pure-XLA implementation
under autodiff (rematerialized backward — identical math, so gradients are
consistent to float rounding).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["chambolle_prox"]

_TAU = 0.25  # 1/(2*dim), Chambolle's stability bound


def _dh(u):
    z = jnp.zeros((1, u.shape[1]), u.dtype)
    return jnp.concatenate([u[1:, :] - u[:-1, :], z], axis=0)


def _dw(u):
    z = jnp.zeros((u.shape[0], 1), u.dtype)
    return jnp.concatenate([u[:, 1:] - u[:, :-1], z], axis=1)


def _divh(p):
    z = jnp.zeros((1, p.shape[1]), p.dtype)
    return jnp.concatenate([p[:-1, :], z], 0) - jnp.concatenate([z, p[:-1, :]], 0)


def _divw(p):
    z = jnp.zeros((p.shape[0], 1), p.dtype)
    return jnp.concatenate([p[:, :-1], z], 1) - jnp.concatenate([z, p[:, :-1]], 1)


def _kernel(gamma_ref, x_ref, out_ref, *, n_iter):
    x = x_ref[0]
    g = gamma_ref[0]
    xg = x / g

    def body(_, ps):
        ph, pw = ps
        u = _divh(ph) + _divw(pw) - xg
        eh, ew = _dh(u), _dw(u)
        denom = 1.0 + _TAU * jnp.sqrt(eh * eh + ew * ew)
        return (ph + _TAU * eh) / denom, (pw + _TAU * ew) / denom

    z = jnp.zeros_like(x)
    ph, pw = jax.lax.fori_loop(0, n_iter, body, (z, z))
    out_ref[0] = x - g * (_divh(ph) + _divw(pw))


def _pallas_impl(x, gamma, n_iter):
    B, C, H, W = x.shape
    flat = x.reshape(B * C, H, W)
    g = jnp.broadcast_to(jnp.asarray(gamma, x.dtype).reshape(-1)[:1], (1,))
    out = pl.pallas_call(
        functools.partial(_kernel, n_iter=n_iter),
        grid=(B * C,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, H, W), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, H, W), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B * C, H, W), x.dtype),
        interpret=jax.default_backend() != "tpu",
    )(g, flat)
    return out.reshape(B, C, H, W)


def _xla_impl(x, gamma, n_iter):
    from ...optim.prior import _grad_op, _div_op

    def body(_, p):
        e = _grad_op(_div_op(p) - x / gamma)
        s = jnp.sum(e**2, axis=-1, keepdims=True)
        # safe norm: sqrt has a NaN cotangent at exactly 0 (structural zeros
        # at the image border), so gate the branch instead of adding an eps
        norm = jnp.where(s > 0, jnp.sqrt(jnp.where(s > 0, s, 1.0)), 0.0)
        denom = 1 + _TAU * norm
        return (p + _TAU * e) / denom

    p = jax.lax.fori_loop(0, n_iter, body, jnp.zeros(x.shape + (2,), x.dtype))
    return x - gamma * _div_op(p)


def _dispatch(x, gamma, n_iter):
    import numpy as _np

    if jnp.ndim(gamma) > 0 and int(_np.prod(jnp.shape(gamma))) > 1:
        # per-sample gamma (the batched (B,1,1,1) convention): the Pallas
        # kernel takes ONE SMEM scalar per call and would silently prox
        # every sample with gamma[0] while the custom_vjp backward used
        # the full gamma — shape-static fallback to the XLA loop
        return _xla_impl(x, gamma, n_iter)
    return _pallas_impl(x, gamma, n_iter)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def chambolle_prox(x, gamma, n_iter: int = 100):
    """Isotropic-TV prox ``argmin 0.5||u-x||^2 + gamma*TV(u)`` — VMEM-resident
    Pallas loop on TPU (interpret mode elsewhere); per-sample gamma arrays
    run the XLA loop."""
    return _dispatch(x, gamma, n_iter)


def _fwd(x, gamma, n_iter):
    return _dispatch(x, gamma, n_iter), (x, gamma)


def _bwd(n_iter, res, ct):
    x, gamma = res
    _, vjp = jax.vjp(lambda xx, gg: _xla_impl(xx, gg, n_iter), x, gamma)
    gx, gg = vjp(ct)
    return gx, jnp.broadcast_to(gg, jnp.shape(gamma)) if jnp.ndim(gamma) else gg

chambolle_prox.defvjp(_fwd, _bwd)
