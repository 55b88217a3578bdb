"""Priors g(x) (reference deepinv/optim/prior.py, 1034 LoC).

PnP / RED priors hold the denoiser as a *pytree leaf*, so an unfolded network
with trainable denoiser weights is just ``jax.grad`` over the prior — no
parameter registration machinery.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .potential import Potential
from ..core.linalg import transpose_primal

__all__ = [
    "Prior",
    "Zero",
    "PnP",
    "RED",
    "ScorePrior",
    "Tikhonov",
    "L1Prior",
    "L12Prior",
    "TVPrior",
    "TVL1Prior",
    "WaveletPrior",
]


def _batch_sum(v):
    return jnp.sum(v.reshape(v.shape[0], -1), axis=1)


class Prior(Potential):
    r"""Base prior (prior.py:18). ``explicit_prior`` marks priors with an
    accessible cost function. ``Prior(g=callable)`` wraps a plain cost
    function without subclassing (the reference's custom-prior idiom)."""

    explicit_prior = True

    def __init__(self, g=None):
        super().__init__(fn=g)

    def fn(self, x, *args, **kwargs):
        f = getattr(self, "_custom_fn", None)
        if f is not None:
            return f(x, *args, **kwargs)
        raise NotImplementedError

    def grad(self, x, sigma_denoiser=None, *args, **kwargs):
        return jax.grad(lambda u: jnp.sum(self.fn(u, sigma_denoiser, *args, **kwargs)))(x)


class Zero(Prior):
    r"""g(x) = 0 (prior.py:47)."""

    def fn(self, x, *args, **kwargs):
        return jnp.zeros(x.shape[0], x.dtype)

    def grad(self, x, *args, **kwargs):
        return jnp.zeros_like(x)

    def prox(self, x, *args, gamma=1.0, **kwargs):
        return x


class PnP(Prior):
    r"""Plug-and-Play prior: prox replaced by a denoiser (prior.py:86).

    :Examples:

        >>> import jax
        >>> from deepinv_tpu.optim import PnP
        >>> from deepinv_tpu.models import MedianFilter
        >>> prior = PnP(MedianFilter())
        >>> x = jax.random.uniform(jax.random.key(0), (1, 1, 8, 8))
        >>> prior.prox(x, 0.1).shape  # second arg = denoiser sigma
        (1, 1, 8, 8)
    """

    explicit_prior = False

    def __init__(self, denoiser):
        self.denoiser = denoiser

    def prox(self, x, sigma_denoiser, *args, gamma=None, **kwargs):
        return self.denoiser(x, sigma_denoiser)


class RED(Prior):
    r"""Regularization-by-denoising: grad = x - denoiser(x) (prior.py:112)."""

    explicit_prior = False

    def __init__(self, denoiser):
        self.denoiser = denoiser

    def grad(self, x, sigma_denoiser, *args, **kwargs):
        return x - self.denoiser(x, sigma_denoiser)


class ScorePrior(Prior):
    r"""Score prior via Tweedie: grad = (x - denoiser(x, sigma))/sigma^2
    (prior.py:138)."""

    explicit_prior = False

    def __init__(self, denoiser):
        self.denoiser = denoiser

    def grad(self, x, sigma_denoiser, *args, **kwargs):
        return (1 / sigma_denoiser**2) * (x - self.denoiser(x, sigma_denoiser))

    def score(self, x, sigma_denoiser, *args, **kwargs):
        return -self.grad(x, sigma_denoiser, *args, **kwargs)

    @staticmethod
    def stable_division(a, b, epsilon: float = 1e-7):
        """``a / b`` with the denominator pushed away from zero (reference
        prior.py:202)."""
        if isinstance(b, (int, float)):
            b = max(epsilon, abs(b)) * (1.0 if b >= 0 else -1.0)
            return a / b
        b = jnp.asarray(b)
        sign = jnp.where(b >= 0, 1.0, -1.0)
        return a / jnp.where(jnp.abs(b) > epsilon, b, sign * epsilon)


class Tikhonov(Prior):
    r"""g(x) = 0.5||x||^2 (prior.py:227)."""

    def fn(self, x, *args, **kwargs):
        return 0.5 * _batch_sum(jnp.abs(x) ** 2)

    def grad(self, x, *args, **kwargs):
        return x

    def prox(self, x, *args, gamma=1.0, **kwargs):
        return x / (1 + gamma)


class L1Prior(Prior):
    r"""g(x) = ||x||_1, soft-threshold prox (prior.py:269)."""

    def fn(self, x, *args, **kwargs):
        return _batch_sum(jnp.abs(x))

    def prox(self, x, *args, gamma=1.0, **kwargs):
        return jnp.sign(x) * jnp.maximum(jnp.abs(x) - gamma, 0.0)


class L12Prior(Prior):
    r"""Group l1-l2 norm over ``l2_axis`` (prior.py:963; reference default
    axis is the last one)."""

    def __init__(self, l2_axis: int = -1):
        self.l2_axis = l2_axis

    def fn(self, x, *args, **kwargs):
        n = jnp.sqrt(jnp.sum(x**2, axis=self.l2_axis))
        return jnp.sum(jnp.abs(n).reshape(n.shape[0], -1), axis=-1)

    def prox(self, x, *args, gamma=1.0, **kwargs):
        n = jnp.sqrt(jnp.sum(x**2, axis=self.l2_axis, keepdims=True))
        # reference prior.py:1031: relu(z - gamma) / (z + 1e-12)
        scale = jnp.maximum(n - gamma, 0.0) / (n + 1e-12)
        return x * scale


def _grad_op(x):
    """Forward-difference spatial gradient, shape (B,C,H,W) -> (B,C,H,W,2)."""
    dh = jnp.diff(x, axis=-2, append=x[..., -1:, :])
    dw = jnp.diff(x, axis=-1, append=x[..., -1:])
    return jnp.stack([dh, dw], axis=-1)


def _div_op(p):
    """Negative adjoint of _grad_op (divergence)."""
    fwd = lambda x: _grad_op(x)
    (xt,) = jax.linear_transpose(
        fwd, transpose_primal(p, p.shape[:-1])
    )(p)
    return -xt


class TVPrior(Prior):
    r"""Isotropic total variation (prior.py:485). Prox by the dual
    (Chambolle) projection algorithm compiled to ``lax.fori_loop``.

    :param use_pallas: run the prox as the VMEM-resident Pallas kernel
        (:func:`deepinv_tpu.ops.pallas.chambolle_prox`) — same update, the
        dual field stays on-chip for the whole loop instead of
        round-tripping HBM each iteration (bit-exact; measured 3-12x per
        iteration on a v5e vs the XLA loop). Default ``None`` = auto:
        Pallas on TPU, XLA elsewhere (interpret mode is slow on CPU).
    """

    def __init__(self, n_it_max: int = 100, use_pallas: bool | None = None):
        self.n_it_max = n_it_max
        self.use_pallas = use_pallas


    @staticmethod
    def nabla(x):
        """Finite-difference gradient operator (reference prior.py nabla)."""
        from ..models.classic import _TVOpsMixin

        return _TVOpsMixin.nabla(x)

    @staticmethod
    def nabla_adjoint(u):
        """Adjoint of :meth:`nabla` (reference prior.py nabla_adjoint)."""
        from ..models.classic import _TVOpsMixin

        return _TVOpsMixin.nabla_adjoint(u)

    def fn(self, x, *args, **kwargs):
        g = _grad_op(x)
        mag = jnp.sqrt(jnp.sum(g**2, axis=-1) + 1e-12)
        return _batch_sum(mag)

    def prox(self, x, *args, gamma=1.0, **kwargs):
        use_pallas = (
            self.use_pallas
            if self.use_pallas is not None
            else jax.default_backend() == "tpu"
        )
        if use_pallas:
            from ..ops.pallas import chambolle_prox

            return chambolle_prox(x, gamma, self.n_it_max)
        tau = 0.25  # 1/(2*dim) step for Chambolle's algorithm

        def body(_, p):
            grad_term = _grad_op(_div_op(p) - x / gamma)
            s = jnp.sum(grad_term**2, axis=-1, keepdims=True)
            # safe norm — sqrt cotangent is NaN at exactly 0 (border zeros)
            norm = jnp.where(s > 0, jnp.sqrt(jnp.where(s > 0, s, 1.0)), 0.0)
            denom = 1 + tau * norm
            return (p + tau * grad_term) / denom

        p0 = jnp.zeros(x.shape + (2,), x.dtype)
        p = jax.lax.fori_loop(0, self.n_it_max, body, p0)
        return x - gamma * _div_op(p)


class WaveletPrior(Prior):
    r"""g(x) = ||Wx||_1 with orthonormal DWT (prior.py:315).

    Prox = W^T soft_threshold(W x) (exact for orthonormal W).
    """

    def __init__(self, wv: str = "db4", level: int = 3, p: int = 1,
                 wvdim: int = 2):
        from ..ops.wavelets import WaveletTransform

        self.wt = WaveletTransform(wavelet=wv, level=level, ndim=wvdim)
        self.p = p

    def fn(self, x, *args, **kwargs):
        coeffs = self.wt.flat_coeffs(self.wt.dwt2(x))
        return _batch_sum(jnp.abs(coeffs))

    def prox(self, x, *args, gamma=1.0, **kwargs):
        coeffs = self.wt.dwt2(x)
        thresholded = self.wt.map_detail(
            coeffs, lambda c: jnp.sign(c) * jnp.maximum(jnp.abs(c) - gamma, 0.0)
        )
        return self.wt.idwt2(thresholded)

    def psi(self, x, *args, **kwargs):
        """Flattened list of wavelet coefficient arrays (reference
        prior.py WaveletPrior.psi)."""
        dec = self.wt.dwt2(x)
        out = [dec["coeffs"][0]]
        for details in dec["coeffs"][1:]:
            out.extend(details)
        return out


class TVL1Prior(Prior):
    r"""Anisotropic TV-L1 style prior (reference prior.py:575): prox via the
    TV-L1 primal-dual denoiser."""

    def __init__(self, n_it_max: int = 100):
        self.n_it_max = n_it_max


    @staticmethod
    def nabla(x):
        """Finite-difference gradient operator (reference prior.py nabla)."""
        from ..models.classic import _TVOpsMixin

        return _TVOpsMixin.nabla(x)

    @staticmethod
    def nabla_adjoint(u):
        """Adjoint of :meth:`nabla` (reference prior.py nabla_adjoint)."""
        from ..models.classic import _TVOpsMixin

        return _TVOpsMixin.nabla_adjoint(u)

    def fn(self, x, *args, **kwargs):
        g = _grad_op(x)
        return _batch_sum(jnp.sum(jnp.abs(g), axis=-1))

    def prox(self, x, *args, gamma=1.0, **kwargs):
        from ..models.classic import TVL1Denoiser

        return TVL1Denoiser(self.n_it_max)(x, ths=gamma)
