"""Classic (training-free) denoisers
(reference deepinv/models/{tv.py, wavdict.py, median.py, tgv.py}).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import Denoiser
from ..core.linalg import transpose_primal

__all__ = [
    "TVDenoiser",
    "TVL1Denoiser",
    "TGVDenoiser",
    "WaveletDenoiser",
    "WaveletDictDenoiser",
    "MedianFilter",
    "BilateralFilter",
    "AnscombeDenoiser",
    "generalized_anscombe_transform",
    "inverse_generalized_anscombe_transform",
]




def _fwd_diff_nd(x, first_axis: int = 2):
    """Forward differences along each spatial axis, stacked on a new last
    axis (zero at the trailing edge), matching reference tv.py:154."""
    comps = []
    for d in range(first_axis, x.ndim):
        last = jax.lax.slice_in_dim(x, x.shape[d] - 1, x.shape[d], axis=d)
        comps.append(jnp.diff(x, axis=d, append=last))
    return jnp.stack(comps, axis=-1)


class _TVOpsMixin:
    """Reference-named finite-difference operators shared by the TV family
    (reference tv.py:154-196, tgv.py:216-320)."""

    @staticmethod
    def nabla(x):
        """Finite-difference gradient (B,C,H,W[,D]) -> (..., n_spatial)
        (reference tv.py:154)."""
        if x.ndim not in (4, 5):
            raise ValueError(f"Input tensor must be 4D or 5D, got {x.ndim}D")
        return _fwd_diff_nd(x)

    @staticmethod
    def nabla_adjoint(u):
        """Adjoint of :meth:`nabla` (reference tv.py:184)."""
        if u.ndim not in (5, 6):
            raise ValueError(f"Input tensor must be 5D or 6D, got {u.ndim}D")
        (xt,) = jax.linear_transpose(
            _fwd_diff_nd, transpose_primal(u, u.shape[:-1], u.dtype)
        )(u)
        return xt

    def prox_tau_fx(self, x, y):
        """Prox of ``1/2 ||x - y||^2`` at stepsize ``tau``
        (reference tv.py:72)."""
        return (x + self.tau * y) / (1 + self.tau)

    def prox_sigma_g_conj(self, u, lambda2):
        """Projection of the dual variable onto the ``lambda2`` ball
        (reference tv.py:78)."""
        n = jnp.sqrt(jnp.sum(u**2, axis=-1, keepdims=True))
        return u / jnp.maximum(1.0, n / lambda2)


class TVDenoiser(_TVOpsMixin, Denoiser):
    """Isotropic TV denoiser (reference models/tv.py:239): the prox of
    ``ths * TV`` computed with Chambolle's dual algorithm.

    :Examples:

        >>> import jax, jax.numpy as jnp
        >>> from deepinv_tpu.models import TVDenoiser
        >>> x = jnp.zeros((1, 1, 8, 8)).at[:, :, 4:].set(1.0)
        >>> noisy = x + 0.1 * jax.random.normal(jax.random.key(0), x.shape)
        >>> den = TVDenoiser(n_it_max=50)
        >>> out = den(noisy, 0.1)
        >>> bool(jnp.mean((out - x) ** 2) < jnp.mean((noisy - x) ** 2))
        True
    """

    def __init__(self, n_it_max: int = 200, use_pallas: bool | None = None,
                 tau: float = 0.01):
        from ..optim.prior import TVPrior

        self.tau = tau
        self.prior = TVPrior(n_it_max=n_it_max, use_pallas=use_pallas)

    def __call__(self, x, ths=0.1, **kwargs):
        return self.prior.prox(x, gamma=ths)


class TGVDenoiser(_TVOpsMixin, Denoiser):
    """Second-order total generalized variation denoiser
    (reference models/tgv.py:312), primal-dual (Chambolle-Pock) iteration
    compiled to ``lax.fori_loop``."""

    def __init__(self, n_it_max: int = 200, alpha1: float = 1.0, alpha2: float = 2.0,
                 tau: float = 0.1):
        self.n_it_max = n_it_max
        self.alpha1 = alpha1
        self.alpha2 = alpha2
        self.tau = tau

    @staticmethod
    def epsilon(I):
        """Jacobian of a vector field (..., n_spatial) -> (..., n_spatial^2)
        (reference tgv.py:230): backward differences with a zero leading
        edge, component-major ordering d(comp_i)/d(spatial_j)."""
        if I.ndim not in (5, 6):
            raise ValueError(f"Input tensor must be 5D or 6D, got {I.ndim}D")
        n_sp = I.ndim - 3
        comps = []
        for i in range(n_sp):
            v = I[..., i]
            for d in range(2, 2 + n_sp):
                first = jax.lax.slice_in_dim(v, 0, 1, axis=d)
                comps.append(jnp.diff(v, axis=d, prepend=first))
        return jnp.stack(comps, axis=-1)

    @staticmethod
    def epsilon_adjoint(G):
        """Adjoint of :meth:`epsilon` (reference tgv.py:273)."""
        if G.ndim not in (5, 6):
            raise ValueError(f"Input tensor must be 5D or 6D, got {G.ndim}D")
        import math as _math

        n_sp = int(_math.isqrt(G.shape[-1]))
        (xt,) = jax.linear_transpose(
            TGVDenoiser.epsilon,
            transpose_primal(G, G.shape[:-1] + (n_sp,), G.dtype),
        )(G)
        return xt

    def prox_tau_fr(self, r, lambda1):
        """Prox of the TGV middle term (reference tgv.py:76)."""
        left = jnp.sqrt(jnp.sum(r**2, axis=-1)) / (self.tau * lambda1)
        return r - r / jnp.maximum(left, 1.0)[..., None]

    def __call__(self, x, ths=0.1, **kwargs):
        lam = ths
        tau = 0.1
        sigma = 1.0 / (tau * 72.0)

        def grad2(v):  # gradient of a vector field (B,C,H,W,2) -> (...,4)
            dh = jnp.stack(
                [jnp.diff(v[..., i], axis=-2, append=v[..., -1:, :, i]) for i in range(2)],
                axis=-1,
            )
            dw = jnp.stack(
                [jnp.diff(v[..., i], axis=-1, append=v[..., -1:, i]) for i in range(2)],
                axis=-1,
            )
            return jnp.concatenate([dh, dw], axis=-1)

        from ..optim.prior import _grad_op, _div_op

        def proj_ball(p, alpha):
            n = jnp.sqrt(jnp.sum(p**2, axis=-1, keepdims=True))
            return p / jnp.maximum(1.0, n / alpha)

        def body(_, carry):
            u, w, p, q, u_bar, w_bar = carry
            # dual updates
            p = proj_ball(p + sigma * (_grad_op(u_bar) - w_bar), self.alpha1 * lam)
            q = proj_ball(q + sigma * grad2(w_bar), self.alpha2 * lam)
            # primal updates
            u_new = (u - tau * (-_div_op(p)) + tau * x / 1.0) / (1 + tau)
            # divergence of q back onto the vector field
            fwd = lambda v: grad2(v)
            (qt,) = jax.linear_transpose(
                fwd, transpose_primal(q, w.shape, w.dtype)
            )(q)
            w_new = w - tau * (qt - p)
            u_bar = 2 * u_new - u
            w_bar = 2 * w_new - w
            return (u_new, w_new, p, q, u_bar, w_bar)

        u0 = x
        w0 = jnp.zeros(x.shape + (2,), x.dtype)
        p0 = jnp.zeros(x.shape + (2,), x.dtype)
        q0 = jnp.zeros(x.shape + (4,), x.dtype)
        u, *_ = jax.lax.fori_loop(0, self.n_it_max, body, (u0, w0, p0, q0, u0, w0))
        return u


class WaveletDenoiser(Denoiser):
    """Orthonormal wavelet soft-thresholding (reference models/wavdict.py).

    :Examples:

        >>> import jax, jax.numpy as jnp
        >>> from deepinv_tpu.models import WaveletDenoiser
        >>> den = WaveletDenoiser(wv="db4", level=2)
        >>> x = jnp.zeros((1, 1, 32, 32)).at[:, :, 16:].set(1.0)
        >>> noisy = x + 0.1 * jax.random.normal(jax.random.key(0), x.shape)
        >>> out = den(noisy, 0.1)
        >>> bool(jnp.mean((out - x) ** 2) < jnp.mean((noisy - x) ** 2))
        True
    """

    def __init__(self, wv: str = "db4", level: int = 3, non_linearity: str = "soft",
                 wvdim: int = 2):
        from ..ops.wavelets import WaveletTransform

        self.wt = WaveletTransform(wavelet=wv, level=level, ndim=wvdim)
        self.non_linearity = non_linearity

    # --- reference coefficient-space thresholding API (wavdict.py) -------

    @staticmethod
    def _expand_ths_as(ths, x):
        """Broadcast a scalar / (B,)-shaped threshold over ``x``
        (reference wavdict.py:241)."""
        t = jnp.asarray(ths)
        if t.ndim > 0:
            t = t.reshape((-1,) + (1,) * (x.ndim - 1))
        return t

    def prox_l1(self, x, ths=0.1):
        """Soft-threshold the given coefficient array (reference
        wavdict.py:228 — operates on coefficients, not images)."""
        t = jnp.abs(self._expand_ths_as(ths, x))
        return jnp.maximum(0.0, x - t) + jnp.minimum(0.0, x + t)

    def prox_l0(self, x, ths=0.1):
        """Hard-threshold the given coefficient array (reference
        wavdict.py:253)."""
        t = self._expand_ths_as(ths, x)
        return jnp.where(jnp.abs(x) < t, 0.0, x)

    @staticmethod
    def hard_threshold_topk(c, ths):
        """Keep each band's top-k coefficients (reference wavdict.py:266):
        ``ths`` < 1 is a fraction of the band size, >= 1 an absolute count.
        Static k — jit-compatible."""
        B = c.shape[0]
        flat = jnp.abs(c.reshape(B, -1))
        n = flat.shape[1]
        frac = float(ths) if not hasattr(ths, "ndim") else float(jnp.ravel(ths)[0])
        k = int(frac) if frac >= 1 else max(1, int(frac * n))
        k = min(k, n)
        kth = -jnp.sort(-flat, axis=1)[:, k - 1]
        kth = kth.reshape((B,) + (1,) * (c.ndim - 1))
        return jnp.where(jnp.abs(c) >= kth, c, 0.0)

    def threshold_func(self, x, ths):
        """Dispatch on ``non_linearity`` (reference wavdict.py:314)."""
        if self.non_linearity == "soft":
            return self.prox_l1(x, ths)
        elif self.non_linearity == "hard":
            return self.prox_l0(x, ths)
        elif self.non_linearity == "topk":
            return self.hard_threshold_topk(x, ths)
        raise ValueError(self.non_linearity)

    # reference-preserved typo aliases (wavdict.py:311,329)
    def thresold_func(self, x, ths):
        return self.threshold_func(x, ths)

    def reshape_ths(self, ths, level: int):
        """Normalize ``ths`` to one value per detail band at ``level``
        (reference wavdict.py:401): scalars repeat over the 3 (2D) or 7
        (3D) bands; per-level sequences are indexed by ``level``."""
        numel = 3 if self.wt.ndim == 2 else 7
        if isinstance(ths, (int, float)):
            return [ths] * numel
        t = jnp.asarray(ths)
        if t.ndim == 0:
            return [ths] * numel
        if t.ndim >= 2 and t.shape[-2] >= level:  # (n_levels, numel)
            row = t[..., level - 1, :]
            return [row[..., c] for c in range(numel)]
        if t.shape[-1] == numel:
            return [t[..., c] for c in range(numel)]
        return [t] * numel

    def threshold_2D(self, coeffs, ths):
        """Threshold every 2D detail band (reference wavdict.py:332)."""
        out = [coeffs["coeffs"][0]]
        for level, details in enumerate(coeffs["coeffs"][1:], start=1):
            ths_cur = self.reshape_ths(ths, level)
            out.append(tuple(self.threshold_func(c, ths_cur[i])
                             for i, c in enumerate(details)))
        return {**coeffs, "coeffs": out}

    def thresold_2D(self, coeffs, ths):
        return self.threshold_2D(coeffs, ths)

    def threshold_3D(self, coeffs, ths):
        """Threshold every 3D detail band (reference wavdict.py:342)."""
        return self.threshold_2D(coeffs, ths)

    def threshold_ND(self, coeffs, ths):
        """Dimension dispatch (reference wavdict.py:352)."""
        if self.wt.ndim == 2:
            return self.threshold_2D(coeffs, ths)
        elif self.wt.ndim == 3:
            return self.threshold_3D(coeffs, ths)
        raise ValueError(f"unsupported wavelet dimension {self.wt.ndim}")

    # --- transform plumbing (reference wavdict.py:98-205,365-399) --------

    def dwt(self, x):
        """Wavelet decomposition (reference wavdict.py:98)."""
        return self.wt.dwt2(x)

    def iwt(self, coeffs):
        """Wavelet recomposition (reference wavdict.py:205)."""
        return self.wt.idwt2(coeffs)

    def flatten_coeffs(self, dec):
        """All coefficients as one flat vector (reference wavdict.py:132)."""
        parts = [dec["coeffs"][0].reshape(-1)]
        for details in dec["coeffs"][1:]:
            parts.extend(c.reshape(-1) for c in details)
        return jnp.concatenate(parts)

    def pad_input(self, x):
        """Pad H (and W) to even sizes (reference wavdict.py:365); returns
        ``(padded, padding)``."""
        h, w = x.shape[-2:]
        pb, pr = h % 2, w % 2
        if pb or pr:
            x = jnp.pad(x, ((0, 0),) * (x.ndim - 2) + ((0, pb), (0, pr)))
        return x, (pb, pr)

    def crop_output(self, x, padding):
        """Undo :meth:`pad_input` (reference wavdict.py:390)."""
        pb, pr = padding
        return x[..., : x.shape[-2] - pb, : x.shape[-1] - pr]

    @staticmethod
    def psi(x, wavelet: str = "db2", level: int = 2, dimension: int = 2,
            mode: str = "zero"):
        """Flattened list of wavelet coefficient arrays (reference
        wavdict.py:157 — a static analysis helper)."""
        from ..ops.wavelets import WaveletTransform

        wt = WaveletTransform(wavelet=wavelet, level=level, ndim=dimension)
        dec = wt.dwt2(x)
        out = [dec["coeffs"][0]]
        for details in dec["coeffs"][1:]:
            out.extend(details)
        return out

    def __call__(self, x, sigma=0.1, **kwargs):
        ths = sigma if self.non_linearity == "topk" else jnp.asarray(sigma)
        x_pad, padding = self.pad_input(x)
        t = self.dwt(x_pad)
        t = self.threshold_ND(t, ths)
        return self.crop_output(self.iwt(t), padding)


class WaveletDictDenoiser(Denoiser):
    """Average of per-wavelet denoisers (reference wavdict.py:610)."""

    psi = staticmethod(WaveletDenoiser.psi)

    def __init__(self, list_wv=("db2", "db4", "db8"), level: int = 3, max_iter: int = 10,
                 wvdim: int = 2):
        self.denoisers = [
            WaveletDenoiser(wv=w, level=level, wvdim=wvdim) for w in list_wv
        ]

    def __call__(self, x, sigma=0.1, **kwargs):
        outs = [d(x, sigma) for d in self.denoisers]
        return sum(outs) / len(outs)


class MedianFilter(Denoiser):
    """Window median filter (reference models/median.py:52)."""

    def __init__(self, kernel_size: int = 3):
        self.kernel_size = kernel_size

    def __call__(self, x, sigma=None, **kwargs):
        k = self.kernel_size
        p = k // 2
        xp = jnp.pad(x, [(0, 0), (0, 0), (p, p), (p, p)], mode="reflect")
        H, W = x.shape[-2:]
        shifts = [
            xp[..., i : i + H, j : j + W] for i in range(k) for j in range(k)
        ]
        stack = jnp.stack(shifts, axis=0)
        return jnp.median(stack, axis=0)


class BilateralFilter(Denoiser):
    """Bilateral filter (reference models/bilateral.py:130)."""

    def __init__(self, kernel_size: int = 5, sigma_space: float = 2.0, sigma_color: float = 0.1):
        self.kernel_size = kernel_size
        self.sigma_space = sigma_space
        self.sigma_color = sigma_color

    def __call__(self, x, sigma=None, **kwargs):
        k = self.kernel_size
        p = k // 2
        sc = self.sigma_color if sigma is None else sigma
        xp = jnp.pad(x, [(0, 0), (0, 0), (p, p), (p, p)], mode="reflect")
        H, W = x.shape[-2:]
        num = jnp.zeros_like(x)
        den = jnp.zeros_like(x)
        for i in range(k):
            for j in range(k)  :
                shifted = xp[..., i : i + H, j : j + W]
                w_s = jnp.exp(-((i - p) ** 2 + (j - p) ** 2) / (2 * self.sigma_space**2))
                w_c = jnp.exp(-((shifted - x) ** 2) / (2 * sc**2))
                w = w_s * w_c
                num = num + w * shifted
                den = den + w
        return num / den


class AnscombeDenoiser(Denoiser):
    """Anscombe variance-stabilizing transform around a Gaussian denoiser
    (reference models/anscombe.py:194)."""

    def __init__(self, denoiser, gain: float = 1.0):
        self.denoiser = denoiser
        self.gain = gain

    def __call__(self, x, sigma=None, **kwargs):
        g = self.gain
        # generalized Anscombe transform
        t = 2.0 * jnp.sqrt(jnp.clip(x / g + 3.0 / 8.0, 0.0, None))
        den = self.denoiser(t, 1.0 if sigma is None else sigma)
        # closed-form unbiased inverse
        inv = (
            den**2 / 4.0
            + jnp.sqrt(3.0 / 2.0) / (4.0 * jnp.clip(den, 1e-8, None))
            - 11.0 / (8.0 * jnp.clip(den, 1e-8, None) ** 2)
            + 5.0 * jnp.sqrt(3.0 / 2.0) / (8.0 * jnp.clip(den, 1e-8, None) ** 3)
            - 1.0 / 8.0
        )
        return inv * g


class TVL1Denoiser(_TVOpsMixin, Denoiser):
    """TV-L1 denoiser (reference models/tv.py:221): primal-dual minimization
    of ``||x - y||_1 + ths * TV(x)`` — robust to outliers/salt-pepper."""

    def __init__(self, n_it_max: int = 200, tau: float = 0.25):
        self.n_it_max = n_it_max
        self.tau = tau

    def prox_sigma_g_conj(self, u, lambda2):
        """Anisotropic dual clamp (reference tv.py:238)."""
        return jnp.clip(u, -lambda2, lambda2)

    def __call__(self, y, ths=0.1, **kwargs):
        from ..optim.prior import _grad_op, _div_op

        tau = 0.25
        sigma = 0.25

        def body(_, carry):
            x, p, q, x_bar = carry
            # dual TV variable: projection onto the ths-ball
            p = p + sigma * _grad_op(x_bar)
            pn = jnp.sqrt(jnp.sum(p**2, axis=-1, keepdims=True))
            p = p / jnp.maximum(1.0, pn / ths)
            # dual L1 variable: clamp to [-1, 1] (reference prox_sigma_g_conj)
            q = jnp.clip(q + sigma * (x_bar - y), -1.0, 1.0)
            x_new = x - tau * (-_div_op(p) + q)
            x_bar = 2 * x_new - x
            return (x_new, p, q, x_bar)

        p0 = jnp.zeros(y.shape + (2,), y.dtype)
        q0 = jnp.zeros_like(y)
        x, _, _, _ = jax.lax.fori_loop(0, self.n_it_max, body, (y, p0, q0, y))
        return x


def generalized_anscombe_transform(y, gain: float = 1.0, sigma: float = 0.0, mu: float = 0.0):
    r"""Generalized Anscombe VST for Poisson-Gaussian noise (reference
    models/anscombe helpers): stabilizes ``y = gain*Poisson + N(mu, sigma^2)``
    to approximately unit variance."""
    return (2.0 / gain) * jnp.sqrt(
        jnp.clip(gain * y + 0.375 * gain**2 + sigma**2 - gain * mu, 0.0, None)
    )


def inverse_generalized_anscombe_transform(z, gain: float = 1.0, sigma: float = 0.0, mu: float = 0.0):
    r"""Closed-form unbiased inverse of the generalized Anscombe transform
    (Makitalo & Foi)."""
    z = jnp.clip(z, 1e-8, None)
    ez = (
        0.25 * z**2
        + 0.25 * jnp.sqrt(1.5) / z
        - 11.0 / 8.0 / z**2
        + 5.0 / 8.0 * jnp.sqrt(1.5) / z**3
        - 0.125
        - sigma**2 / gain**2
    )
    return gain * ez + mu
