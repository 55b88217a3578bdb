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
import numpy as np

from ..core import Module
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
    "R2RModel",
    "ScoreLoss",
    "ScoreModel",
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

    def __init__(self, physics_list=None, physics_generator=None, metric=None,
                 apply_noise: bool = True, weight: float = 1.0):
        self.physics_list = physics_list
        # reference moi.py:16 alternative mode: draw fresh operator
        # parameters from a PhysicsGenerator every forward
        self.physics_generator = physics_generator
        self.metric = metric if metric is not None else MSE()
        self.apply_noise = apply_noise
        self.weight = weight

    def next_physics(self, physics=None, key=None):
        """Pick a random operator from the list (or regenerate parameters
        with an attached generator) — reference moi.py:86. Host-side
        convenience; the jit path in :meth:`__call__` uses ``lax.switch``."""
        key = ensure_key(key, 4)
        gen = getattr(self, "physics_generator", None)
        if gen is not None:
            base = (self.physics_list[0] if self.physics_list else physics)
            return base.update(**gen.step(batch_size=1, key=key))
        plist = self.physics_list if self.physics_list is not None else [physics]
        j = int(jax.device_get(jax.random.randint(key, (), 0, len(plist))))
        return plist[j]

    def __call__(self, x_net=None, physics=None, model=None, key=None, **kwargs):
        key = ensure_key(key, 4)
        kidx, knoise = jax.random.split(key)
        if self.physics_generator is not None:
            # generator mode (reference moi.py:86): resample operator
            # parameters every forward — traceable, so this works under
            # jit too (the generator draws with the traced key)
            base = (self.physics_list[0] if self.physics_list
                    else physics)
            p2 = base.update(**self.physics_generator.step(
                batch_size=x_net.shape[0], key=kidx))
            y2 = p2(x_net, key=knoise) if self.apply_noise else p2.A(x_net)
            x2 = model(y2, p2)
            return self.weight * self.metric(x2, x_net)
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

    next_physics = MOILoss.next_physics

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

    def __init__(self, sigma: float, tau: float = 1e-2, unsure: bool = False,
                 step_size: float = 1e-4, momentum: float = 0.9):
        self.sigma2 = sigma**2
        self.tau = tau
        self.unsure = unsure
        self.step_size = step_size
        self.momentum = momentum
        self.grad_sigma = 0.0
        self.init_flag = True

    def _unsure_step(self, attr, grad_attr, flag_attr, grad, step, momentum):
        """UNSURE gradient-ascent update of a noise-level estimate
        (reference sure.py:95 unsure_gradient_step). Host-side state: runs
        on concrete (eager) calls; traced calls leave the estimate fixed."""
        if isinstance(grad, jax.core.Tracer):
            return
        g = float(grad)
        if getattr(self, flag_attr):
            setattr(self, flag_attr, False)
            setattr(self, grad_attr, g)
        else:
            setattr(self, grad_attr,
                    momentum * getattr(self, grad_attr) + (1 - momentum) * g)
        setattr(self, attr, float(getattr(self, attr) + step * g))

    def __call__(self, y=None, physics=None, model=None, x_net=None, key=None, **kwargs):
        key = ensure_key(key, 6)
        b = jax.random.normal(key, y.shape, y.dtype)

        def f(u):
            return physics.A(model(u, physics))

        y1, jvp_b = jax.jvp(f, (y,), (b,))
        div = 2 * self.sigma2 * _bmean(b * jvp_b)
        mse = _bmean((y1 - y) ** 2)
        loss = mse + div - self.sigma2
        if self.unsure:
            # d(div)/d(sigma2) = mean(div) / sigma2 (reference sure.py:230)
            self._unsure_step("sigma2", "grad_sigma", "init_flag",
                              jnp.mean(div) / self.sigma2,
                              self.step_size, self.momentum)
        return loss


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


class SurePGLoss(SureGaussianLoss):
    r"""SURE for Poisson-Gaussian noise (reference sure.py:380): first-order
    Monte-Carlo divergence plus an optional second-derivative correction
    (``second_derivative=True``, reference :462-474); ``unsure=True`` learns
    ``sigma^2`` and ``gain`` by gradient ascent on the divergence."""

    def __init__(self, sigma: float, gain: float, tau1: float = 1e-3,
                 tau2: float = 1e-2, second_derivative: bool = False,
                 unsure: bool = False, step_size=(1e-4, 1e-4),
                 momentum=(0.9, 0.9), tau: Optional[float] = None):
        self.sigma2 = sigma**2
        self.gain = gain
        self.tau1 = tau1 if tau is None else tau  # tau kept for back-compat
        self.tau2 = tau2
        self.second_derivative = second_derivative
        self.unsure = unsure
        self.step_size = step_size
        self.momentum = momentum
        self.grad_sigma = 0.0
        self.grad_gain = 0.0
        self.init_flag = True
        self.init_flag_gain = True

    def __call__(self, y=None, physics=None, model=None, x_net=None, key=None, **kwargs):
        key = ensure_key(key, 8)
        k1, k2 = jax.random.split(key)
        b1 = (jax.random.bernoulli(k1, 0.5, y.shape).astype(y.dtype) * 2 - 1)

        def f(u):
            return physics.A(model(u, physics))

        y1 = f(y)
        y2 = f(y + self.tau1 * b1)
        div1 = (2.0 / self.tau1) * _bmean(
            (self.gain * y + self.sigma2) * b1 * (y2 - y1)
        )
        loss = _bmean((y1 - y) ** 2) - self.gain * _bmean(y) - self.sigma2 + div1
        if self.second_derivative:
            # sqrt(5)-weighted Rademacher probe (reference sure.py:429-432)
            p = 0.7236
            u = jax.random.uniform(k2, y.shape)
            b2 = jnp.where(u < p, -np.sqrt((1 - p) / p), np.sqrt(p / (1 - p))
                           ).astype(y.dtype)
            y2p = f(y + self.tau2 * b2)
            y2n = f(y - self.tau2 * b2)
            loss = loss - (2 * self.sigma2 * self.gain / self.tau2**2) * _bmean(
                b2 * (y2p + y2n - 2 * y1)
            )
        if self.unsure:
            # d(div1)/d(sigma2) and d(div1)/d(gain) in closed form
            g_sigma = (2.0 / self.tau1) * jnp.mean(b1 * (y2 - y1))
            g_gain = (2.0 / self.tau1) * jnp.mean(y * b1 * (y2 - y1))
            self._unsure_step("sigma2", "grad_sigma", "init_flag",
                              g_sigma, self.step_size[0], self.momentum[0])
            self._unsure_step("gain", "grad_gain", "init_flag_gain",
                              g_gain, self.step_size[1], self.momentum[1])
        return loss


def _resolve_noise_model(own, physics):
    nm = own if own is not None else getattr(physics, "noise_model", None)
    if nm is None:
        raise ValueError(
            "Noise model not found in the constructor or physics module."
        )
    return nm


class R2RModel(Module):
    """GR2R re-corruption wrapper (reference r2r.py:185 R2RModel): the model
    consumes ``y_1 ~ p(y_1 | y, alpha)`` — Gaussian re-noising, Poisson
    binomial thinning, or Gamma Beta thinning — one sample at train time,
    ``eval_n_samples`` Monte-Carlo averaged at evaluation."""

    train_aware = True

    def __init__(self, model, noise_model=None, alpha: float = 0.15,
                 eval_n_samples: int = 5):
        self.model = model
        self.noise_model = noise_model
        self.alpha = alpha
        self.eval_n_samples = eval_n_samples

    def corrupt(self, y, noise_model, key):
        """Draw ``y_1`` for the given exponential-family noise model
        (reference r2r.py:160-183 corruptors)."""
        a = self.alpha
        name = type(noise_model).__name__
        if name in ("GaussianNoise", "UniformGaussianNoise"):
            w = jax.random.normal(key, y.shape, y.dtype) * noise_model.sigma
            return y + w * jnp.sqrt(a / (1 - a))
        if name == "PoissonNoise":
            gain = noise_model.gain
            z = y / gain
            w = jax.random.binomial(key, jnp.round(z), a)
            return gain * (z - w) / (1 - a)
        if name == "GammaNoise":
            l = noise_model.l
            w = jax.random.beta(key, l * a, l * (1 - a), y.shape)
            return y * (1 - w) / (1 - a)
        raise NotImplementedError(f"R2R corruption for {name} not implemented")

    def __call__(self, y, physics=None, key=None, train=False,
                 return_corruption=False):
        key = ensure_key(key, 22)
        nm = _resolve_noise_model(self.noise_model, physics)
        n = 1 if train else max(self.eval_n_samples, 1)
        out, y1 = 0.0, None
        for i in range(n):
            y1 = self.corrupt(y, nm, jax.random.fold_in(key, i))
            out = out + self.model(y1, physics) / n
        return (out, y1) if return_corruption else out


class R2RLoss(Loss):
    r"""Generalized Recorrupted-to-Recorrupted (reference r2r.py:9):
    ``y_1 ~ p(y_1 | y, alpha)`` feeds the adapted model and the loss is
    ``|| A R(y_1) - y_2 ||^2`` with ``y_2 = (y - (1-alpha) y_1) / alpha``.
    Supports Gaussian, Poisson (binomial thinning) and Gamma noise.

    The JAX design shares the corruption between model and loss through the
    PRNG key instead of the reference's stored ``get_corruption()`` state.
    """

    def __init__(self, metric=None, noise_model=None, alpha: float = 0.15,
                 eval_n_samples: int = 5, sigma: Optional[float] = None):
        self.metric = metric if metric is not None else MSE()
        if noise_model is None and sigma is not None:
            from ..physics.noise import GaussianNoise

            noise_model = GaussianNoise(sigma)
        self.noise_model = noise_model
        self.alpha = alpha
        self.eval_n_samples = eval_n_samples

    def adapt_model(self, model):
        """Wrap the model to re-corrupt its input (reference r2r.py:129)."""
        if isinstance(model, R2RModel):
            return model
        return R2RModel(model, self.noise_model, self.alpha,
                        self.eval_n_samples)

    def __call__(self, y=None, physics=None, model=None, x_net=None, key=None, **kwargs):
        key = ensure_key(key, 9)
        m = model if isinstance(model, R2RModel) else self.adapt_model(model)
        x1, y1 = m(y, physics, key=key, train=True, return_corruption=True)
        y2 = (y - y1 * (1 - self.alpha)) / self.alpha
        return self.metric(physics.A(x1), y2)


class ScoreModel(Module):
    """Noise2Score wrapper (reference score.py:115 ScoreModel): the backbone
    approximates the score ``S(y)``; the wrapper perturbs the input with
    annealed noise during training and reconstructs via Tweedie's formula at
    evaluation (Gaussian/Poisson/Gamma)."""

    train_aware = True

    def __init__(self, model, noise_model=None, delta=(0.001, 0.1),
                 total_batches: int = 1000):
        self.model = model
        self.noise_model = noise_model
        self.delta = delta
        self.total_batches = total_batches
        self.counter = 0  # eager-mode annealing fallback (see __call__)

    def __call__(self, y, physics=None, key=None, train=False, step=None,
                 return_error=False):
        key = ensure_key(key, 23)
        nm = _resolve_noise_model(self.noise_model, physics)
        dmin, dmax = self.delta
        if train:
            if step is None:
                # host-side counter: fine eagerly; under jit pass step=.
                # The loss path (return_error=True) reads without bumping so
                # an eager trainer step (forward + loss) anneals once.
                if not return_error:
                    self.counter += 1
                step = max(self.counter, 1)
            # linear anneal max -> min, clamped (the reference extrapolates
            # past total_batches, which makes delta negative and divergent)
            w = jnp.clip(step / self.total_batches, 0.0, 1.0)
            delta = dmax * (1 - w) + dmin * w
            ks, ke = jax.random.split(key)
            sigma = jax.random.normal(
                ks, (y.shape[0],) + (1,) * (y.ndim - 1), y.dtype) * delta
        else:
            sigma = dmin
            ke = key
        eps = jax.random.normal(ke, y.shape, y.dtype)
        grad = self.model(y + eps * sigma, physics)
        error = _bmean((eps + grad * sigma) ** 2)
        name = type(nm).__name__
        if name in ("GaussianNoise", "UniformGaussianNoise"):
            out = y + nm.sigma**2 * grad
        elif name == "PoissonNoise":
            yy = y if getattr(nm, "normalize", True) else y * nm.gain
            out = yy + nm.gain * yy * grad
        elif name == "GammaNoise":
            l = nm.l
            out = l * y / ((l - 1.0) - y * grad)
        else:
            raise NotImplementedError(f"Tweedie formula for {name} not implemented")
        return (out, error) if return_error else out


class ScoreLoss(Loss):
    r"""Noise2Score (reference score.py:6): train the backbone to predict the
    score via ``||eps + sigma S(y + sigma eps)||^2`` with annealed sigma;
    reconstruction at evaluation uses Tweedie's formula (through
    :meth:`adapt_model`).

    The JAX design recomputes the perturbation from the PRNG key instead of
    the reference's stored ``get_error()`` state.
    """

    def __init__(self, noise_model=None, total_batches: int = 1000,
                 delta=(0.001, 0.1)):
        self.noise_model = noise_model
        self.total_batches = total_batches
        self.delta = delta

    def adapt_model(self, model):
        """Wrap the score backbone into the Tweedie reconstructor
        (reference score.py:103)."""
        if isinstance(model, ScoreModel):
            return model
        return ScoreModel(model, self.noise_model, self.delta,
                          self.total_batches)

    def __call__(self, y=None, physics=None, model=None, x_net=None, key=None,
                 step=None, **kwargs):
        key = ensure_key(key, 10)
        m = model if isinstance(model, ScoreModel) else self.adapt_model(model)
        _, error = m(y, physics, key=key, train=True, step=step,
                     return_error=True)
        return error


class TVLoss(Loss):
    r"""Total-variation regularization loss :math:`\|D x\|_2^2` with the
    reference's normalization (reference tv.py:21-43): per-axis sum of
    squared first differences divided by the element count of the
    difference tensor, times ``2 * weight``; returns a ``(B,)`` vector."""

    def __init__(self, weight: float = 1.0):
        self.weight = weight

    @staticmethod
    def tensor_size(t):
        """C*H*W of a (B, C, H, W) tensor (reference tv.py:46)."""
        return t.shape[1] * t.shape[2] * t.shape[3]

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


# reference exposes the Tweedie reconstructor as an inner class (score.py:109)
ScoreLoss.ScoreModel = ScoreModel
