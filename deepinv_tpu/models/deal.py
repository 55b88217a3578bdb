"""DEAL — Deep Equilibrium Attention Least-squares
(reference deepinv/models/deal.py:15, 1163 LoC; Pourya et al. 2025).

Weight-portable reimplementation of the original architecture:

- :class:`LinearSpline` activations with uniform knots, slope-constrained
  coefficient projection (reference LinearSpline :443) — evaluated with a
  gather + linear interpolation; JAX autodiff reproduces the reference's
  hand-written spline gradients.
- :class:`MultiConv2d` stacked convolutions with zero-mean first-layer
  kernels and Fourier spectral normalization (reference MultiConv2d :625);
  the adjoint is ``jax.linear_transpose`` of the forward — exact.
- the masked-regularizer fixed-point solver: outer mask refresh + inner
  per-sample conjugate gradients on
  ``(H^T H + lambda L^T L) x = H^T y`` scaled by ``1/(1+lambda)``
  (reference _DEALImpl.denoise :1020 / solve_inverse_problem :1097),
  compiled to ``lax.while_loop``.

Published checkpoints (deal_gray.pth / deal_color.pth) load through
``models.convert.port_deal``.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from ..core import Module
from ..core.linalg import transpose_primal
from .base import Reconstructor

__all__ = ["DEAL", "LinearSpline", "MultiConv2d"]


class LinearSpline(Module):
    """Uniform-knot linear-spline activation (reference deal.py:443).

    :param num_activations: independent activation functions (grouped over
        the channel axis).
    :param num_knots: knots on the uniform grid [x_min, x_max].
    :param init: "identity" | "gaussian" | "zero" | float.
    :param slope_min/slope_max: optional slope clamping applied through the
        coefficient projection (reference clipped_coefficients :587).
    :param clamp: zero the first/last slopes (flat extrapolation).
    """

    def __init__(self, num_activations: int, num_knots: int, x_min: float,
                 x_max: float, init="identity", slope_max=None,
                 slope_min=None, clamp: bool = True):
        self.num_activations = int(num_activations)
        self.num_knots = int(num_knots)
        self.x_min = float(x_min)
        self.x_max = float(x_max)
        self.slope_min = slope_min
        self.slope_max = slope_max
        self.clamp = clamp
        grid = jnp.broadcast_to(
            jnp.linspace(x_min, x_max, num_knots), (num_activations, num_knots)
        )
        if isinstance(init, float):
            coeffs = jnp.ones_like(grid) * init
        elif init == "gaussian":
            coeffs = jnp.exp(-(grid**2))
        elif init == "identity":
            coeffs = grid
        elif init == "zero":
            coeffs = grid * 0
        else:
            raise ValueError("init should be in [identity, zero, gaussian].")
        self.coefficients = coeffs

    @property
    def step_size(self):
        return (self.x_max - self.x_min) / (self.num_knots - 1)

    def projected_coefficients(self):
        """Slope-projected coefficients (reference clipped_coefficients)."""
        if self.slope_min is None and self.slope_max is None and not self.clamp:
            return self.coefficients
        cs = self.coefficients
        slopes = (cs[:, 1:] - cs[:, :-1]) / self.step_size
        if self.slope_min is not None or self.slope_max is not None:
            slopes = jnp.clip(slopes, self.slope_min, self.slope_max)
        if self.clamp:
            slopes = slopes.at[:, 0].set(0).at[:, -1].set(0)
        new_cs = jnp.concatenate(
            [jnp.zeros_like(cs[:, :1]),
             jnp.cumsum(slopes, axis=1) * self.step_size], axis=1,
        )
        return new_cs + jnp.mean(cs - new_cs, axis=1, keepdims=True)

    def __call__(self, x):
        """x: (B, C, ...) with C divisible by num_activations."""
        cs = self.projected_coefficients()  # (A, K)
        A, K = cs.shape
        step = self.step_size
        in_shape = x.shape
        C = in_shape[1]
        x = x.reshape(x.shape[0], A, C // A, *x.shape[2:])
        xc = jnp.clip(x, self.x_min, self.x_max - step)
        floored = jnp.floor((xc - self.x_min) / step)
        frac = (x - self.x_min) / step - floored
        idx = floored.astype(jnp.int32)  # (B, A, C/A, ...)
        # gather per activation row
        a_idx = jnp.arange(A).reshape(1, A, *([1] * (x.ndim - 2)))
        a_idx = jnp.broadcast_to(a_idx, idx.shape)
        c0 = cs[a_idx, idx]
        c1 = cs[a_idx, jnp.clip(idx + 1, 0, K - 1)]
        out = c1 * frac + c0 * (1 - frac)
        return out.reshape(in_shape)


class MultiConv2d(Module):
    """Stacked convolutions with zero-mean first kernel and 1/sqrt(L)
    spectral normalization (reference deal.py:625).

    Weights use torch OIHW layout and cross-correlation semantics so
    reference checkpoints load directly.
    """

    def __init__(self, num_channels: Sequence[int] = (1, 64),
                 size_kernels: Sequence[int] = (3,), zero_mean: bool = True,
                 sn_size: int = 256, color: bool = False, key=None):
        key = key if key is not None else jax.random.key(0)
        self.num_channels = tuple(num_channels)
        self.size_kernels = tuple(size_kernels)
        self.zero_mean = zero_mean
        self.sn_size = sn_size
        self.color = color
        self.padding = self.size_kernels[0] // 2
        self.padding_total = sum(k // 2 for k in size_kernels)
        ws = []
        for j in range(len(num_channels) - 1):
            key, sub = jax.random.split(key)
            k = size_kernels[j]
            fan_in = num_channels[j] * k * k
            ws.append(jax.random.uniform(
                sub, (num_channels[j + 1], num_channels[j], k, k),
                minval=-1, maxval=1) / jnp.sqrt(fan_in))
        self.weights = ws

    def _effective_weights(self):
        ws = list(self.weights)
        if self.zero_mean:
            # ZeroMean parametrization on the first layer (deal.py:796)
            ws[0] = ws[0] - jnp.mean(ws[0], axis=(1, 2, 3), keepdims=True)
        return ws

    def _conv_stack(self, x):
        p = self.padding
        for w in self._effective_weights():
            x = jax.lax.conv_general_dilated(
                x, w, (1, 1), [(p, p), (p, p)],
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
            )
        return x

    def convolution(self, x, L):
        return self._conv_stack(x / jnp.sqrt(L))

    def transpose(self, y, L):
        """Exact adjoint of :meth:`convolution` via linear_transpose."""
        B = y.shape[0]
        Cin = self.num_channels[0]
        H, W = y.shape[-2], y.shape[-1]  # same-padding preserves dims
        fwd = lambda v: self._conv_stack(v)
        (xt,) = jax.linear_transpose(
            fwd, transpose_primal(y, (B, Cin, H, W))
        )(y)
        return xt / jnp.sqrt(L)

    def get_kernel_WtW(self):
        """Kernel of W^T W from a centered dirac (reference :790)."""
        pt = self.padding_total
        n = self.num_channels[0]
        dirac = jnp.zeros((1, n, 4 * pt + 1, 4 * pt + 1))
        c = 1 if self.color else 0
        dirac = dirac.at[0, c, 2 * pt, 2 * pt].set(1.0)
        return self.transpose(self._conv_stack(dirac), 1.0)

    def spectral_norm(self):
        """Fourier-mode spectral norm of W^T W (reference :722): the max
        modulus of the FFT of the (zero-padded) normal-operator kernel."""
        kernel = self.get_kernel_WtW()
        padding = (self.sn_size - 1) // 2 - self.padding_total
        padded = jnp.pad(
            kernel, ((0, 0), (0, 0), (padding, padding), (padding, padding))
        )
        fk = jnp.abs(jnp.fft.fft2(padded))
        if self.color:
            return fk[:, 0].max() + fk[:, 1].max() + fk[:, 2].max()
        return fk.max()


def _batched_cg(BtB, b, x0, max_iter, tol):
    """Per-sample conjugate gradients (reference _DEALImpl.cg :947):
    alpha/beta are computed per batch element; converged samples freeze."""
    dims = tuple(range(1, b.ndim))

    def dot(a, c):
        return jnp.sum(a * c, axis=dims, keepdims=True)

    r0 = b - BtB(x0)
    state = (x0, r0, r0, dot(r0, r0), jnp.asarray(0))

    def cond(s):
        _, _, _, rn, i = s
        return jnp.logical_and(i < max_iter, jnp.any(rn.reshape(-1) > tol))

    def body(s):
        x, r, p, rn, i = s
        active = (rn > tol).astype(b.dtype)
        Bp = BtB(p)
        alpha = rn / jnp.clip(dot(p, Bp), 1e-30, None)
        x = x + active * alpha * p
        r = r - active * alpha * Bp
        rn_new = dot(r, r)
        beta = rn_new / jnp.clip(rn, 1e-30, None)
        p = jnp.where(active > 0, r + beta * p, p)
        rn = jnp.where(active > 0, rn_new, rn)
        return (x, r, p, rn, i + 1)

    x, _, _, _, _ = jax.lax.while_loop(cond, body, state)
    return x


class DEAL(Reconstructor):
    r"""DEAL reconstructor (reference deal.py:15) — solves
    ``argmin_x 1/2||Hx - y||^2 + lambda/2 sum_c ||m_c(x) . K_c x||^2``
    by alternating mask refreshes with per-sample CG solves.

    Weight-portable: load published checkpoints with
    ``models.convert.port_deal(DEAL(color=...), torch_state_dict)``.

    :param sigma_denoiser: denoiser noise level (image scale in [0,1];
        multiplied by 255 internally like the reference).
    :param lambda_reg: regularization strength for reconstruction mode.
    :param max_iter: outer fixed-point iterations (reconstruction mode).
    :param color: color (3-channel) or grayscale variant.
    :param clamp_output: clip the output to [0, 1].
    """

    def __init__(self, sigma_denoiser: float = 0.1, lambda_reg: float = 10.0,
                 max_iter: int = 50, color: bool = False,
                 clamp_output: bool = True, pretrained=None, key=None):
        key = key if key is not None else jax.random.key(0)
        self.sigma_denoiser = float(sigma_denoiser)
        self.lambda_reg = float(lambda_reg)
        self.max_iter = int(max_iter)
        self.color = color
        self.clamp_output = clamp_output

        channels = [3, 12, 24, 128] if color else [1, 4, 8, 128]
        self.last_c = channels[-1]
        ks = [9] * (len(channels) - 1)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        self.W1 = MultiConv2d(channels, ks, color=color, key=k1)
        self.M1 = MultiConv2d(channels, ks, color=color, key=k2)
        self.M2 = jax.random.normal(k3, (self.last_c, self.last_c, 3, 3)) * 0.01
        self.M3 = jax.random.normal(k4, (self.last_c, self.last_c, 3, 3)) * 0.01

        self.spline1 = LinearSpline(1, 31, 0, 3, "identity", clamp=False, slope_min=0)
        self.spline2 = LinearSpline(1, 31, 0, 3, "identity", clamp=False, slope_min=0)
        self.spline3 = LinearSpline(1, 31, 0, 3, "gaussian", clamp=False)
        self.spline_lambda = LinearSpline(1, 53, -1, 51, "identity", clamp=False)
        self.spline_scaling = LinearSpline(self.last_c, 14, -1, 51, 3.0, clamp=False)

        if pretrained is not None:
            raise ValueError(
                "zero-egress build: load a checkpoint by passing its torch "
                "state dict through models.convert.port_deal"
            )

    # -- internals (reference _DEALImpl) ----------------------------------
    def _conv3(self, x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )

    def _cal_mask(self, x, L, scaling):
        """Spatially varying mask (reference cal_mask :917)."""
        u = self.spline1(jnp.abs(self.M1.convolution(x, L)))
        u = self.spline2(jnp.abs(self._conv3(u, self.M2)))
        u = self._conv3(u, self.M3)
        u = self.spline3(scaling * jnp.abs(u))
        return jnp.clip(u, 1e-2, 1.0)

    def _Lt_L(self, x, mask, L):
        w = self.W1.convolution(x, L) * (mask**2)
        return self.W1.transpose(w, L)

    def _solve(self, y, H, Ht, sigma255, lmbda, x_init, n_out, n_in,
               eps_in, eps_out):
        L = self.W1.spectral_norm()
        scale_in = jnp.ones((y.shape[0], self.last_c, 1, 1)) * sigma255
        scaling = jnp.exp(self.spline_scaling(scale_in)) / (sigma255 + 1e-5)
        b = Ht(y) / (1 + lmbda)

        def outer_cond(s):
            c_k, c_old, res, i = s
            return jnp.logical_and(i < n_out, res >= eps_out)

        def outer_body(s):
            c_k, c_old, _, i = s
            mask = self._cal_mask(c_k, L, scaling)

            def BtB(v):
                return (Ht(H(v)) + lmbda * self._Lt_L(v, mask, L)) / (1 + lmbda)

            c_new = _batched_cg(BtB, b, c_old, n_in, eps_in)
            res = jnp.linalg.norm(c_new - c_k) / jnp.clip(
                jnp.linalg.norm(c_k), 1e-12, None
            )
            return (c_new, c_new, res, i + 1)

        c0 = x_init
        c_k, _, _, _ = jax.lax.while_loop(
            outer_cond, outer_body,
            (c0, c0, jnp.asarray(jnp.inf), jnp.asarray(0)),
        )
        return c_k

    def mask(self, x, sigma=0.05):
        """Current DEAL spatial mask at ``x`` (reference deal.py:154 — there
        a stateful property holding the last run's mask; here computed
        functionally for a given image and noise level)."""
        sigma255 = jnp.broadcast_to(jnp.asarray(255.0 * sigma, x.dtype),
                                    (x.shape[0],))
        L = self.W1.spectral_norm()
        scale_in = jnp.ones((x.shape[0], self.last_c, 1, 1)) * sigma255
        scaling = jnp.exp(self.spline_scaling(scale_in)) / (sigma255 + 1e-5)
        return self._cal_mask(x, L, scaling)

    def denoise(self, y, sigma):
        """Denoising mode (reference denoise :1020): H = identity,
        lambda = spline_lambda(255 sigma)."""
        sigma255 = jnp.broadcast_to(
            jnp.asarray(255.0 * sigma, y.dtype), (y.shape[0],)
        ).reshape(-1, 1, 1, 1)
        lmbda = self.spline_lambda(sigma255)
        ident = lambda v: v
        out = self._solve(
            y, ident, ident, sigma255, lmbda, jnp.zeros_like(y),
            n_out=60, n_in=200, eps_in=1e-6, eps_out=1e-5,
        )
        return jnp.clip(out, 0.0, 1.0) if self.clamp_output else out

    def solve_inverse_problem(self, y, H, Ht, sigma, lmbda, x_init=None,
                              eps_in: float = 1e-8, eps_out: float = 1e-5):
        """Reconstruction mode (reference solve_inverse_problem :1097)."""
        if x_init is None:
            x_init = Ht(y) * 0
        sigma255 = jnp.full((y.shape[0], 1, 1, 1), sigma, y.dtype)
        out = self._solve(
            y, H, Ht, sigma255, jnp.asarray(lmbda, y.dtype), x_init,
            n_out=self.max_iter, n_in=self.max_iter * 20,
            eps_in=eps_in, eps_out=eps_out,
        )
        return jnp.clip(out, 0.0, 1.0) if self.clamp_output else out

    def __call__(self, y, physics=None, sigma=None, **kwargs):
        from ..physics.base import LinearPhysics

        # model(y, sigma) calling convention: scalar second arg is sigma
        if sigma is None and physics is not None and not isinstance(
            physics, LinearPhysics
        ):
            sigma, physics = physics, None
        is_denoising = physics is None or type(physics).__name__ == "Denoising"
        if is_denoising:
            if physics is None and sigma is None:
                raise ValueError("denoising needs sigma when physics is None")
            sigma_value = sigma if physics is None else self.sigma_denoiser
            return self.denoise(y, sigma_value)
        return self.solve_inverse_problem(
            y, physics.A, physics.A_adjoint,
            sigma=255.0 * self.sigma_denoiser, lmbda=self.lambda_reg,
            x_init=physics.A_adjoint(y),
        )
