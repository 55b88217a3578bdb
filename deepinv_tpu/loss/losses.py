"""Supervised and self-supervised losses
(reference deepinv/loss/{sup,mc,ei,moi,sure,r2r,score,tv}.py).

All stochastic estimators draw from an explicit ``key``; divergence terms use
``jax.jvp`` (forward-mode) instead of the reference's double-backward
(sure.py:33-39) — one JVP is cheaper than grad-of-grad and exact for the
Hutchinson estimate.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..core.rng import ensure_key
from .base import Loss
from .metric import MSE

__all__ = [
    "SupLoss",
    "MCLoss",
    "EILoss",
    "MOILoss",
    "MOEILoss",
    "SureGaussianLoss",
    "SurePoissonLoss",
    "SurePGLoss",
    "R2RLoss",
    "ScoreLoss",
    "TVLoss",
    "JacobianSpectralNorm",
    "FNEJacobianSpectralNorm",
]


def _bmean(v):
    return jnp.mean(v.reshape(v.shape[0], -1), axis=1)


class SupLoss(Loss):
    """Supervised loss metric(x_net, x) (reference sup.py).

    :Examples:

        Losses share the reference signature
        ``loss(x_net=..., x=..., y=..., physics=..., model=...)``:

        >>> import jax.numpy as jnp
        >>> from deepinv_tpu.loss import SupLoss, MCLoss
        >>> from deepinv_tpu.physics import Denoising
        >>> x = jnp.ones((1, 1, 4, 4)); x_net = jnp.zeros_like(x)
        >>> float(SupLoss()(x_net=x_net, x=x)[0])
        1.0
        >>> float(MCLoss()(x_net=x_net, y=x, physics=Denoising())[0])
        1.0
    """

    def __init__(self, metric=None):
        self.metric = metric if metric is not None else MSE()

    def __call__(self, x_net=None, x=None, **kwargs):
        return self.metric(x_net, x)


class MCLoss(Loss):
    """Measurement consistency ||A(x_net) - y||^2 (reference mc.py:44)."""

    def __init__(self, metric=None):
        self.metric = metric if metric is not None else MSE()

    def __call__(self, x_net=None, y=None, physics=None, **kwargs):
        return self.metric(physics.A(x_net), y)


class EILoss(Loss):
    """Equivariant imaging loss (reference ei.py:13):
    ``|| T x_net - model(A(T x_net)) ||``."""

    def __init__(self, transform, metric=None, apply_noise: bool = True, weight: float = 1.0, no_grad: bool = False):
        self.T = transform
        self.metric = metric if metric is not None else MSE()
        self.apply_noise = apply_noise
        self.weight = weight
        self.no_grad = no_grad

    def __call__(self, x_net=None, physics=None, model=None, key=None, **kwargs):
        key = ensure_key(key, 3)
        x2 = self.T(x_net, key=key)
        if self.no_grad:
            x2 = jax.lax.stop_gradient(x2)
        if self.apply_noise:
            y2 = physics(x2, key=jax.random.fold_in(key, 1))
        else:
            y2 = physics.A(x2)
        x3 = model(y2, physics)
        return self.weight * self.metric(x3, x2)


class MOILoss(Loss):
    """Multi-operator imaging loss (reference moi.py:16): re-measure the
    reconstruction through a random *other* operator from the list."""

    def __init__(self, physics_list=None, metric=None, apply_noise: bool = True, weight: float = 1.0):
        self.physics_list = physics_list
        self.metric = metric if metric is not None else MSE()
        self.apply_noise = apply_noise
        self.weight = weight

    def __call__(self, x_net=None, physics=None, model=None, key=None, **kwargs):
        key = ensure_key(key, 4)
        kidx, knoise = jax.random.split(key)
        physics_list = self.physics_list if self.physics_list is not None else [physics]
        # jit-safe random operator choice: lax.switch over the list (the
        # reference indexes a ModuleList eagerly, moi.py:16)
        idx = jax.random.randint(kidx, (), 0, len(physics_list))

        def branch(p2):
            def f(_):
                y2 = p2(x_net, key=knoise) if self.apply_noise else p2.A(x_net)
                x2 = model(y2, p2)
                return self.metric(x2, x_net)

            return f

        return self.weight * jax.lax.switch(
            idx, [branch(p) for p in physics_list], 0
        )


class MOEILoss(EILoss):
    """Multi-operator EI (reference moi.py): EI with a random operator."""

    def __init__(self, transform, physics_list=None, **kwargs):
        super().__init__(transform, **kwargs)
        self.physics_list = physics_list

    def __call__(self, x_net=None, physics=None, model=None, key=None, **kwargs):
        key = ensure_key(key, 5)
        if self.physics_list is not None:
            idx = jax.random.randint(
                jax.random.fold_in(key, 7), (), 0, len(self.physics_list)
            )
            return jax.lax.switch(idx, [
                (lambda p: lambda _: super(MOEILoss, self).__call__(
                    x_net=x_net, physics=p, model=model, key=key))(p)
                for p in self.physics_list
            ], 0)
        return super().__call__(x_net=x_net, physics=physics, model=model, key=key)


class SureGaussianLoss(Loss):
    r"""SURE for Gaussian noise (reference sure.py:122):
    ``1/m ||y - A xhat||^2 - sigma^2 + 2 sigma^2 / m div``.

    The divergence is the Hutchinson estimate computed with ``jax.jvp``
    through ``y -> A(model(y))``.

    :Examples:

        Self-supervised: needs only noisy measurements, no ground truth.

        >>> import jax
        >>> from deepinv_tpu.loss import SureGaussianLoss
        >>> from deepinv_tpu.physics import Denoising, GaussianNoise
        >>> from deepinv_tpu.models import MedianFilter
        >>> physics = Denoising(noise_model=GaussianNoise(0.1))
        >>> x = jax.random.uniform(jax.random.key(0), (1, 1, 16, 16))
        >>> y = physics(x, key=jax.random.key(1))
        >>> loss = SureGaussianLoss(sigma=0.1)
        >>> model = lambda yv, p: MedianFilter()(yv, 0.1)
        >>> l = loss(x_net=model(y, physics), y=y, physics=physics,
        ...          model=model, key=jax.random.key(2))
        >>> l.shape  # per-sample unbiased MSE estimate
        (1,)
    """

    def __init__(self, sigma: float, tau: float = 1e-2, unsure: bool = False):
        self.sigma2 = sigma**2
        self.tau = tau
        self.unsure = unsure

    def __call__(self, y=None, physics=None, model=None, x_net=None, key=None, **kwargs):
        key = ensure_key(key, 6)
        b = jax.random.normal(key, y.shape, y.dtype)

        def f(u):
            return physics.A(model(u, physics))

        y1, jvp_b = jax.jvp(f, (y,), (b,))
        div = 2 * self.sigma2 * _bmean(b * jvp_b)
        mse = _bmean((y1 - y) ** 2)
        return mse + div - self.sigma2


class SurePoissonLoss(Loss):
    r"""SURE for Poisson noise (reference sure.py:286)."""

    def __init__(self, gain: float, tau: float = 1e-3):
        self.gain = gain
        self.tau = tau

    def __call__(self, y=None, physics=None, model=None, x_net=None, key=None, **kwargs):
        key = ensure_key(key, 7)
        b = (jax.random.bernoulli(key, 0.5, y.shape).astype(y.dtype) * 2 - 1)

        def f(u):
            return physics.A(model(u, physics))

        y1 = f(y)
        y2 = f(y + self.tau * b)
        loss = (
            _bmean((y1 - y) ** 2)
            - self.gain * _bmean(y)
            + (2 * self.gain / self.tau) * _bmean(b * y * (y2 - y1))
        )
        return loss


class SurePGLoss(Loss):
    r"""SURE for Poisson-Gaussian noise (reference sure.py:~380)."""

    def __init__(self, sigma: float, gain: float, tau: float = 1e-3):
        self.sigma2 = sigma**2
        self.gain = gain
        self.tau = tau

    def __call__(self, y=None, physics=None, model=None, x_net=None, key=None, **kwargs):
        key = ensure_key(key, 8)
        b = (jax.random.bernoulli(key, 0.5, y.shape).astype(y.dtype) * 2 - 1)

        def f(u):
            return physics.A(model(u, physics))

        y1 = f(y)
        y2 = f(y + self.tau * b)
        loss = (
            _bmean((y1 - y) ** 2)
            - self.gain * _bmean(y)
            - self.sigma2
            + (2.0 / self.tau) * _bmean((self.gain * y + self.sigma2) * b * (y2 - y1))
        )
        return loss


class R2RLoss(Loss):
    r"""Recorrupted-to-Recorrupted (reference r2r.py:9):
    ``y1 = y + alpha w``, ``y2 = y - w/alpha``, loss = ||A f(y1) - y2||^2.

    ``adapt_model`` makes the model consume the recorrupted input at train
    time (reference R2RModel)."""

    def __init__(self, metric=None, alpha: float = 0.5, sigma: float = 0.1):
        self.metric = metric if metric is not None else MSE()
        self.alpha = alpha
        self.sigma = sigma

    def __call__(self, y=None, physics=None, model=None, x_net=None, key=None, **kwargs):
        key = ensure_key(key, 9)
        w = jax.random.normal(key, y.shape, y.dtype) * self.sigma
        y1 = y + self.alpha * w
        y2 = y - w / self.alpha
        xhat = model(y1, physics)
        return self.metric(physics.A(xhat), y2)


class ScoreLoss(Loss):
    r"""Noise2Score (reference score.py:6): learn the score of the noisy
    distribution with the AR residual trick."""

    def __init__(self, total_batches: int = 1000, delta=(0.001, 0.1)):
        self.delta = delta

    def __call__(self, y=None, physics=None, model=None, x_net=None, key=None, **kwargs):
        key = ensure_key(key, 10)
        kd, kb = jax.random.split(key)
        dmin, dmax = self.delta
        delta = jax.random.uniform(kd, (y.shape[0],) + (1,) * (y.ndim - 1), minval=dmin, maxval=dmax)
        b = jax.random.normal(kb, y.shape, y.dtype)
        grad = model(y + delta * b, physics)
        return _bmean((b + delta * grad) ** 2)


class TVLoss(Loss):
    r"""Total-variation regularization loss :math:`\|D x\|_2^2` with the
    reference's normalization (reference tv.py:21-43): per-axis sum of
    squared first differences divided by the element count of the
    difference tensor, times ``2 * weight``; returns a ``(B,)`` vector."""

    def __init__(self, weight: float = 1.0):
        self.weight = weight

    def __call__(self, x_net=None, **kwargs):
        dh = jnp.diff(x_net, axis=-2)
        dw = jnp.diff(x_net, axis=-1)
        count_h = dh[0].size
        count_w = dw[0].size
        h_tv = jnp.sum(dh.reshape(dh.shape[0], -1) ** 2, axis=1)
        w_tv = jnp.sum(dw.reshape(dw.shape[0], -1) ** 2, axis=1)
        return self.weight * 2 * (h_tv / count_h + w_tv / count_w)


class JacobianSpectralNorm(Loss):
    r"""Spectral norm of the Jacobian of ``f`` at x by power iteration
    (reference regularisers.py). In JAX each iteration is one jvp+vjp pair.
    """

    def __init__(
        self,
        max_iter: int = 10,
        tol: float = 1e-3,
        eval_mode: bool = False,
        verbose: bool = False,
        reduction: Optional[str] = "max",
        reduced_batchsize: Optional[int] = None,
    ):
        self.max_iter = max_iter
        self.tol = tol
        if reduction is None or (isinstance(reduction, str) and reduction.lower() == "none"):
            self.reduction = lambda v: v
        elif reduction.lower() == "mean":
            self.reduction = jnp.mean
        elif reduction.lower() == "sum":
            self.reduction = jnp.sum
        elif reduction.lower() == "max":
            self.reduction = jnp.max
        else:
            raise ValueError('Reduction should be "mean", "sum", "max", "none" or None.')
        self.reduced_batchsize = reduced_batchsize

    def compute_norm(self, f, x, key=None):
        """Per-batch-element power iteration on :math:`J^\\top J` with the
        reference's Rayleigh-quotient estimate (regularisers.py:119-162)."""
        if self.reduced_batchsize is not None:
            x = x[: self.reduced_batchsize]
        key = ensure_key(key, 11)
        u = jax.random.normal(key, x.shape, x.dtype)
        bflat = lambda v: v.reshape(v.shape[0], -1)
        bnorm = lambda v: jnp.sqrt(jnp.sum(bflat(v) ** 2, axis=1))
        bshape = (x.shape[0],) + (1,) * (x.ndim - 1)
        u = u / bnorm(u).reshape(bshape)

        def body(_, u):
            _, jvp_u = jax.jvp(f, (x,), (u,))
            _, vjp_fn = jax.vjp(f, x)
            (v,) = vjp_fn(jvp_u)
            z = jnp.sum(bflat(u) * bflat(v), axis=1) / jnp.clip(bnorm(u) ** 2, 1e-12, None)
            u = v / jnp.clip(bnorm(v), 1e-12, None).reshape(bshape)
            return u, z

        def scan_body(u, _):
            u, z = body(None, u)
            return u, z

        u, zs = jax.lax.scan(scan_body, u, None, length=self.max_iter)
        z = zs[-1]
        return self.reduction(jnp.sqrt(jnp.clip(z, 0.0, None)))

    def __call__(self, y=None, x_net=None, model=None, physics=None, key=None, **kwargs):
        f = lambda u: model(u, physics) if physics is not None else model(u)
        return self.compute_norm(f, y, key=key)


class FNEJacobianSpectralNorm(JacobianSpectralNorm):
    r"""Firm-nonexpansiveness regularizer: spectral norm of ``2J - I``
    (reference regularisers.py:FNE)."""

    def __call__(
        self,
        y=None,
        x_net=None,
        model=None,
        physics=None,
        key=None,
        interpolation: bool = False,
        **kwargs,
    ):
        key = ensure_key(key, 11)
        if interpolation:
            # reference regularisers.py:270-274: evaluate at a random convex
            # combination eta*y + (1-eta)*x_net, eta ~ U[0,1) per batch element
            key, ksub = jax.random.split(key)
            eta = jax.random.uniform(ksub, (y.shape[0],) + (1,) * (y.ndim - 1), y.dtype)
            point = eta * y + (1 - eta) * x_net
        else:
            point = y

        def g(u):
            out = model(u, physics) if physics is not None else model(u)
            return 2 * out - u

        return self.compute_norm(g, point, key=key)
