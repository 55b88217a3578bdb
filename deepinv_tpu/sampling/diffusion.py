"""Diffusion posterior samplers: DDRM, DiffPIR, DPS
(reference deepinv/sampling/diffusion.py:83,227,516).

Each sampler compiles its full timestep loop to ``lax.scan``; noise schedules
are stacked arrays scanned over, and DDRM's per-pixel case analysis
(diffusion.py:178-220) becomes ``jnp.where`` masks.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core import Module
from ..core.rng import ensure_key
from ..models.base import Reconstructor
from ..optim.data_fidelity import L2

__all__ = ["DDRM", "DiffPIR", "DPS"]


class DDRM(Reconstructor):
    r"""Denoising Diffusion Restoration Models (reference diffusion.py:83).

    Requires a :class:`DecomposablePhysics`. Samples the posterior via the
    spectral-space diffusion of Kawar et al. 2022.

    :Examples:

        >>> import jax, numpy as np, jax.numpy as jnp
        >>> from deepinv_tpu.sampling import DDRM
        >>> from deepinv_tpu.models import MedianFilter
        >>> from deepinv_tpu.physics import Inpainting, GaussianNoise
        >>> physics = Inpainting(img_size=(1, 16, 16), mask=0.6,
        ...                      key=jax.random.key(0),
        ...                      noise_model=GaussianNoise(0.05))
        >>> x = jax.random.uniform(jax.random.key(1), (1, 1, 16, 16))
        >>> y = physics(x, key=jax.random.key(2))
        >>> model = DDRM(MedianFilter(),
        ...              sigmas=np.linspace(1, 0, 20))
        >>> xhat = model(y, physics, key=jax.random.key(3))
        >>> xhat.shape == x.shape and bool(jnp.isfinite(xhat).all())
        True
    """

    def __init__(self, denoiser, sigmas=None, eta: float = 0.85, etab: float = 1.0, eps: float = 1e-6):
        self.denoiser = denoiser
        self.sigmas = jnp.asarray(
            sigmas if sigmas is not None else np.linspace(1, 0, 100), jnp.float32
        )
        self.eta = eta
        self.etab = etab
        self.eps = eps

    def __call__(self, y, physics, key=None, seed: int = 0, **kwargs):
        key = ensure_key(key, seed)
        sigma_noise = (
            physics.noise_model.sigma
            if physics.noise_model is not None and hasattr(physics.noise_model, "sigma")
            else 0.01
        )
        sigma_noise = jnp.asarray(sigma_noise)

        mask = physics.mask
        if isinstance(mask, (int, float)):
            mask = jnp.ones_like(physics.U_adjoint(y)) * mask
        mask = jnp.abs(jnp.broadcast_to(mask, physics.U_adjoint(y).shape))

        c = np.sqrt(1 - self.eta**2)
        y_bar = physics.U_adjoint(y)
        case = mask > sigma_noise
        y_bar = jnp.where(case, y_bar / (mask + self.eps), y_bar)
        nsr = jnp.where(case, sigma_noise / (mask + self.eps), 0.0)

        k0, key = jax.random.split(key)
        s0 = self.sigmas[0]
        mean0 = jnp.where(case, y_bar, 0.0)
        std0 = jnp.where(case, jnp.sqrt(jnp.clip(s0**2 - nsr**2, 0.0, None)), s0)
        x_bar = mean0 + std0 * jax.random.normal(k0, y_bar.shape, y_bar.dtype) / np.sqrt(2.0)
        x = self.denoiser(physics.V(x_bar), s0)

        n_steps = self.sigmas.shape[0] - 1
        keys = jax.random.split(key, n_steps)
        sig_pairs = jnp.stack([self.sigmas[1:], self.sigmas[:-1]], axis=1)

        def body(carry, inp):
            x, x_bar_prev = carry
            k, sig = inp
            s_t, s_prev = sig[0], sig[1]
            x_bar = physics.V_adjoint(x)
            case2 = jnp.logical_and(case, s_t < nsr)
            case3 = jnp.logical_and(case, s_t >= nsr)
            mean = x_bar + c * s_t * (x_bar_prev - x_bar) / jnp.clip(s_prev, self.eps, None)
            mean = jnp.where(case2, x_bar + c * s_t * (y_bar - x_bar) / (nsr + self.eps), mean)
            mean = jnp.where(case3, (1 - self.etab) * x_bar + self.etab * y_bar, mean)
            std = jnp.full_like(x_bar, self.eta * s_t)
            std = jnp.where(
                case3,
                jnp.sqrt(jnp.clip(s_t**2 - (nsr * self.etab) ** 2, 0.0, None)),
                std,
            )
            x_bar_new = mean + std * jax.random.normal(k, x_bar.shape, x_bar.dtype) / np.sqrt(2.0)
            x_new = self.denoiser(physics.V(x_bar_new), jnp.clip(s_t, 1e-4, None))
            return (x_new, x_bar_new), None

        (x, _), _ = jax.lax.scan(body, (x, x_bar), (keys, sig_pairs))
        return x

    forward = __call__


def _ddpm_schedule(beta_start=0.1 / 1000, beta_end=20 / 1000, T=1000):
    betas = np.linspace(beta_start, beta_end, T, dtype=np.float64)
    alphas_cumprod = np.cumprod(1.0 - betas)
    return alphas_cumprod


class DiffPIR(Reconstructor):
    r"""Diffusion PnP Image Restoration (reference diffusion.py:227).

    HQS on the DDPM trajectory with the reference's exact schedules:
    quadratic timestep spacing ``seq = sqrt(linspace(0, T^2, K))``,
    ``rho_t = lambda sigma_n^2 / sigma_t^2``, the
    ``x / (2 sqrt(a_t)) + 0.5`` denoiser renormalization, x0 clamping,
    and renoising to the *next* level ``t_{i-1}`` (diffusion.py:423-508).
    Images in [0, 1] (internally mapped to [-1, 1] like the reference).
    """

    def __init__(self, model, data_fidelity=None, sigma: float = 0.05, max_iter: int = 100, zeta: float = 0.1, lambda_: float = 7.0):
        self.model = model
        self.data_fidelity = data_fidelity if data_fidelity is not None else L2()
        self.sigma = sigma
        self.max_iter = max_iter
        self.zeta = zeta
        self.lambda_ = lambda_

        # host-side schedule tables (static at trace time, not pytree
        # leaves) — reference get_alpha_beta (diffusion.py:324)
        self.beta_start, self.beta_end = 0.1 / 1000, 20 / 1000
        self.num_train_timesteps = 1000
        T = self.num_train_timesteps
        (self._sqrt_1m_acp, self._reduced, self._sqrt_acp,
         self._sqrt_recip_acp, self._sqrt_recipm1_acp,
         self._betas) = self.get_alpha_beta()
        self._T = T

    def get_alpha_beta(self):
        """Alpha/beta sequences mapping noise levels to timesteps
        (reference diffusion.py:323): returns ``(sqrt_1m_alphas_cumprod,
        reduced_alpha_cumprod, sqrt_alphas_cumprod, sqrt_recip_alphas_cumprod,
        sqrt_recipm1_alphas_cumprod, betas)``."""
        betas = np.linspace(self.beta_start, self.beta_end,
                            self.num_train_timesteps, dtype=np.float64)
        acp = np.cumprod(1.0 - betas)
        sqrt_acp = np.sqrt(acp).astype(np.float32)
        sqrt_1m_acp = np.sqrt(1 - acp).astype(np.float32)
        reduced = (sqrt_1m_acp / sqrt_acp).astype(np.float32)
        sqrt_recip = np.sqrt(1.0 / acp).astype(np.float32)
        sqrt_recipm1 = np.sqrt(1.0 / acp - 1.0).astype(np.float32)
        return (sqrt_1m_acp, reduced, sqrt_acp, sqrt_recip, sqrt_recipm1,
                betas.astype(np.float32))

    def get_noise_schedule(self, sigma):
        """``(rhos, sigmas, seq)`` for measurement noise ``sigma``
        (reference diffusion.py:355): sigmas are the reversed reduced-alpha
        noise levels, rhos = lambda sigma^2 / sigma_k^2, seq the quadratic
        timestep subsampling."""
        sigmas, rhos, seq = self._schedule(sigma)
        return rhos, sigmas, seq

    @staticmethod
    def find_nearest(array, value):
        """Argmin of |array - value| (reference diffusion.py:383)."""
        return int(np.abs(np.asarray(array) - value).argmin())

    @staticmethod
    def compute_alpha(betas, t):
        """``alpha_bar_t`` from the beta sequence (reference
        diffusion.py:390)."""
        acp = np.cumprod(1.0 - np.asarray(betas))
        return acp[t]

    def get_alpha_prod(self, beta_start=0.1 / 1000, beta_end=20 / 1000,
                       num_train_timesteps=1000):
        """``(sqrt_recip_alphas_cumprod, sqrt_recipm1_alphas_cumprod)`` used
        to map noise levels to timesteps for pure denoising (reference
        diffusion.py:399)."""
        betas = np.linspace(beta_start, beta_end, num_train_timesteps,
                            dtype=np.float64)
        acp = np.cumprod(1.0 - betas)
        return (np.sqrt(1.0 / acp).astype(np.float32),
                np.sqrt(1.0 / acp - 1.0).astype(np.float32))

    def _schedule(self, sigma_n):
        """Reference get_noise_schedule (diffusion.py:357): sigmas are the
        reversed reduced-alpha noise levels, rhos are indexed by timestep,
        seq is the quadratic subsampling of [0, T)."""
        T, K = self._T, self.max_iter
        sigmas = self._reduced[::-1]  # sigmas[i] = reduced[T-1-i]
        rhos = self.lambda_ * (sigma_n**2) / (self._reduced**2)
        seq = np.sqrt(np.linspace(0.0, float(T) ** 2, K)).astype(np.int32)
        seq[-1] = seq[-1] - 1
        return sigmas, rhos, seq

    def __call__(self, y, physics, key=None, seed: int = 0, x_init=None, **kwargs):
        key = ensure_key(key, seed)
        sigma_n = (
            physics.noise_model.sigma
            if physics.noise_model is not None and hasattr(physics.noise_model, "sigma")
            else self.sigma
        )
        sigma_n = float(np.asarray(sigma_n).reshape(-1)[0])
        sigmas, rhos, seq = self._schedule(sigma_n)

        # per-iteration rows; the final iteration is denoise-only and does
        # not modify x (reference diffusion.py:480 skips the update when
        # seq[i] == seq[-1]), so the scan runs K-1 full iterations
        t_of = lambda s: int(np.abs(self._reduced - sigmas[s]).argmin())
        rows = []
        for i in range(self.max_iter - 1):
            t_i = t_of(seq[i])
            t_im1 = t_of(seq[i + 1])
            rows.append([
                float(sigmas[seq[i]]),          # curr_sigma
                float(self._sqrt_acp[t_i]),
                float(self._sqrt_1m_acp[t_i]),
                float(rhos[t_i]),
                float(self._sqrt_acp[t_im1]),
                float(self._sqrt_1m_acp[t_im1]),
            ])
        sched = jnp.asarray(np.asarray(rows, np.float32))

        x0_in = physics.A_adjoint(y) if x_init is None else x_init
        x = 2 * x0_in - 1

        # noise initialization at the first (largest) level, VP-scaled
        # (reference diffusion.py:466-472)
        k0, key = jax.random.split(key)
        sigma0 = float(sigmas[seq[0]])
        init_std = float(np.sqrt(max(sigma0**2 - 4.0 * self.sigma**2, 0.0)))
        x = (x + init_std * jax.random.normal(k0, x.shape, x.dtype)) * float(
            self._sqrt_acp[-1]
        )

        keys = jax.random.split(key, self.max_iter - 1)
        zeta = self.zeta

        def body(x, inp):
            k, row = inp
            curr_sigma, sa_t, s1m_t, rho_t, sa_p, s1m_p = (
                row[0], row[1], row[2], row[3], row[4], row[5]
            )
            at_sqrt = sa_t
            # denoising step: renormalize to [0, 1] at the x0 scale
            x_aux = x / (2 * at_sqrt) + 0.5
            out = self.model(x_aux, curr_sigma / 2)
            x0 = jnp.clip(2 * out - 1, -1.0, 1.0)
            # data-fidelity prox in [0, 1]
            x0_p = self.data_fidelity.prox(
                x0 / 2 + 0.5, y, physics, gamma=1.0 / (2 * rho_t)
            )
            x0 = 2 * x0_p - 1
            # effective noise + renoise to the NEXT level t_{i-1}
            eps = (x - sa_t * x0) / jnp.clip(s1m_t, 1e-12, None)
            z = jax.random.normal(k, x.shape, x.dtype)
            x_next = sa_p * x0 + s1m_p * (
                np.sqrt(1 - zeta) * eps + np.sqrt(zeta) * z
            )
            return x_next, None

        x, _ = jax.lax.scan(body, x, (keys, sched))
        return x / 2 + 0.5

    forward = __call__


class DPS(Reconstructor):
    r"""Diffusion Posterior Sampling (reference diffusion.py:516).

    DDPM reverse diffusion with likelihood guidance
    ``grad_x ||y - A(D(x_t))||`` computed by autodiff through the denoiser.
    """

    def __init__(self, model, data_fidelity=None, max_iter: int = 100, eta: float = 1.0, guidance_scale: float = 1.0):
        self.model = model
        self.data_fidelity = data_fidelity if data_fidelity is not None else L2()
        self.max_iter = max_iter
        self.eta = eta
        self.guidance_scale = guidance_scale
        acp = _ddpm_schedule()
        self._acp = jnp.asarray(acp, jnp.float32)
        # Precompute the (at, at_next) schedule HERE, while `acp` is still a
        # concrete host array: `max_iter` is static pytree aux but `_acp` is
        # a traced leaf when the sampler is passed as a jit argument, so
        # doing this in __call__ would np.asarray() a tracer.
        steps = np.linspace(len(acp) - 1, 1, max_iter).astype(np.int64)
        at_list = np.asarray(acp)[steps]
        at_next_list = np.concatenate([np.asarray(acp)[steps[1:]], [1.0]])
        self._sched = jnp.asarray(np.stack([at_list, at_next_list], 1), jnp.float32)

    def __call__(self, y, physics, key=None, seed: int = 0, x_init=None, **kwargs):
        key = ensure_key(key, seed)

        if x_init is None:
            k0, key = jax.random.split(key)
            shape = physics.A_adjoint(y).shape
            x = jax.random.normal(k0, shape, y.dtype if not jnp.iscomplexobj(y) else jnp.float32)
        else:
            x = 2 * x_init - 1

        keys = jax.random.split(key, self.max_iter)
        sched = self._sched

        def denoise_x0(xt, at):
            sigma_t = jnp.sqrt(jnp.clip(1 - at, 1e-8, None)) / jnp.sqrt(at)
            x01 = (xt / jnp.sqrt(at) + 1) / 2  # to [0,1]
            x0 = 2 * self.model(x01, sigma_t / 2) - 1
            return x0

        def body(x, inp):
            k, row = inp
            at, at_next = row[0], row[1]

            def loss(xt):
                x0 = denoise_x0(xt, at)
                r = physics.A((x0 + 1) / 2) - y
                return jnp.sqrt(jnp.sum(r**2)), x0

            (norm, x0), g = jax.value_and_grad(loss, has_aux=True)(x)
            eps = (x - jnp.sqrt(at) * x0) / jnp.sqrt(jnp.clip(1 - at, 1e-8, None))
            c1 = self.eta * jnp.sqrt(
                jnp.clip((1 - at / at_next) * (1 - at_next) / jnp.clip(1 - at, 1e-8, None), 0.0, None)
            )
            c2 = jnp.sqrt(jnp.clip(1 - at_next - c1**2, 0.0, None))
            z = jax.random.normal(k, x.shape, x.dtype)
            x_next = (
                jnp.sqrt(at_next) * x0 + c2 * eps + c1 * z - self.guidance_scale * g
            )
            return x_next, x0

        x, x0_hist = jax.lax.scan(body, x, (keys, sched))
        return (x0_hist[-1] + 1) / 2

    forward = __call__

    def score(self, y, physics, x, t, *args, **kwargs):
        """Conditional score ``grad log p_t(x | y)`` (reference
        diffusion_sde.py:188, inherited by DPS): Tweedie score of the
        denoiser minus the guidance gradient ``grad ||y - A(D(x_t))||``."""
        at = self._acp[jnp.asarray(t, jnp.int32)]
        sigma = jnp.sqrt(jnp.clip(1 - at, 1e-8, None)) / jnp.sqrt(at)

        def loss(xt):
            x01 = (xt / jnp.sqrt(at) + 1) / 2
            x0 = 2 * self.model(x01, sigma / 2) - 1
            r = physics.A((x0 + 1) / 2) - y
            return jnp.sqrt(jnp.sum(r**2)), x0

        g, x0 = jax.grad(loss, has_aux=True)(x)
        uncond = (jnp.sqrt(at) * x0 - x) / jnp.clip(1 - at, 1e-8, None)
        return uncond - self.guidance_scale * g
