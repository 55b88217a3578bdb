"""Expected Patch Log-Likelihood prior and Gaussian mixture models
(reference deepinv/optim/epll.py:232, optim/utils.py:137 GaussianMixtureModel).

GMM fitting is full-batch EM in jax (one jitted update per iteration);
EPLL denoising is the half-quadratic splitting scheme of Zoran & Weiss:
MAP component selection + per-component Wiener filtering of all patches,
batched with one einsum over components — MXU-friendly.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from ..core import Module
from ..core.rng import ensure_key

__all__ = ["GaussianMixtureModel", "EPLL", "patch_extractor"]


def patch_extractor(x, patch_size: int, stride: int = 1):
    """Extract overlapping patches: (B, C, H, W) -> (B, N, C*p*p)."""
    B, C, H, W = x.shape
    p = patch_size
    idx_h = jnp.arange(0, H - p + 1, stride)
    idx_w = jnp.arange(0, W - p + 1, stride)

    def get_patch(i, j):
        return jax.lax.dynamic_slice(x, (0, 0, i, j), (B, C, p, p))

    patches = jax.vmap(
        lambda i: jax.vmap(lambda j: get_patch(i, j))(idx_w)
    )(idx_h)  # (nh, nw, B, C, p, p)
    nh, nw = patches.shape[:2]
    patches = jnp.moveaxis(patches.reshape(nh * nw, B, C * p * p), 0, 1)
    return patches, (len(idx_h), len(idx_w))


class GaussianMixtureModel(Module):
    """Full-covariance GMM with EM fitting (reference optim/utils.py:137)."""

    def __init__(self, n_components: int, dimension: int, key=None, seed: int = 0):
        key = ensure_key(key, seed)
        self.mu = jax.random.normal(key, (n_components, dimension)) * 0.1
        self.cov = jnp.tile(jnp.eye(dimension)[None], (n_components, 1, 1))
        self.weights = jnp.ones((n_components,)) / n_components

    @property
    def n_components(self):
        return self.mu.shape[0]

    def _chol(self):
        return jnp.linalg.cholesky(
            self.cov + 1e-5 * jnp.eye(self.cov.shape[-1])[None]
        )

    def log_prob_components(self, x):
        """Per-component log N(x | mu_k, cov_k): (N, d) -> (K, N)."""
        d = x.shape[-1]
        chol = self._chol()

        def one(mu_k, chol_k):
            diff = x - mu_k
            sol = jax.scipy.linalg.solve_triangular(chol_k, diff.T, lower=True)
            maha = jnp.sum(sol**2, axis=0)
            logdet = 2 * jnp.sum(jnp.log(jnp.diagonal(chol_k)))
            return -0.5 * (maha + logdet + d * math.log(2 * math.pi))

        return jax.vmap(one)(self.mu, chol)

    def log_prob(self, x):
        lp = self.log_prob_components(x) + jnp.log(self.weights)[:, None]
        return jax.scipy.special.logsumexp(lp, axis=0)

    def classify(self, x):
        lp = self.log_prob_components(x) + jnp.log(self.weights)[:, None]
        return jnp.argmax(lp, axis=0)

    def fit(self, x, max_iters: int = 50, tol: float = 1e-4, verbose: bool = False, key=None):
        """Full-batch EM; returns the fitted GMM (functional)."""
        x = jnp.asarray(x)
        key = ensure_key(key, 1)
        # k-means++-lite init: random data points as means
        idx = jax.random.choice(key, x.shape[0], (self.n_components,), replace=False)
        gmm = self.replace(mu=x[idx])

        @jax.jit
        def em_step(mu, cov, weights):
            g = self.replace(mu=mu, cov=cov, weights=weights)
            lp = g.log_prob_components(x) + jnp.log(weights)[:, None]
            log_r = lp - jax.scipy.special.logsumexp(lp, axis=0, keepdims=True)
            r = jnp.exp(log_r)  # (K, N)
            nk = jnp.sum(r, axis=1) + 1e-8
            mu_new = (r @ x) / nk[:, None]
            diff = x[None] - mu_new[:, None]  # (K, N, d)
            cov_new = jnp.einsum("kn,knd,kne->kde", r, diff, diff) / nk[:, None, None]
            cov_new = cov_new + 1e-5 * jnp.eye(x.shape[-1])[None]
            w_new = nk / jnp.sum(nk)
            ll = jnp.mean(jax.scipy.special.logsumexp(lp, axis=0))
            return mu_new, cov_new, w_new, ll

        mu, cov, w = gmm.mu, gmm.cov, gmm.weights
        prev = -jnp.inf
        for it in range(max_iters):
            mu, cov, w, ll = em_step(mu, cov, w)
            if verbose:
                print(f"EM iter {it}: loglik {float(ll):.4f}")
            if abs(float(ll) - float(prev)) < tol:
                break
            prev = ll
        return self.replace(mu=mu, cov=cov, weights=w)


class EPLL(Module):
    """EPLL half-quadratic patch denoiser/prior (reference epll.py:232).

    :param gmm: fitted GaussianMixtureModel over patches.
    :param patch_size: patch side length.
    :param betas: HQS penalty schedule (scaled by 1/sigma^2 at call time).
    """

    def __init__(self, gmm: GaussianMixtureModel = None, patch_size: int = 6, channels: int = 1, betas=None, key=None):
        self.patch_size = patch_size
        self.channels = channels
        d = channels * patch_size**2
        self.gmm = gmm if gmm is not None else GaussianMixtureModel(20, d, key=key)
        self.betas = tuple(betas) if betas is not None else (1.0, 4.0, 8.0, 16.0, 32.0)

    def negative_log_likelihood(self, x):
        patches, _ = patch_extractor(x, self.patch_size)
        B, N, d = patches.shape
        lp = self.gmm.log_prob(patches.reshape(B * N, d)).reshape(B, N)
        return -jnp.sum(lp, axis=1)

    def _wiener(self, patches, noise_var):
        """MAP-component Wiener filtering of flattened patches (N, d)."""
        k = self.gmm.classify(patches)
        mu = self.gmm.mu[k]  # (N, d)
        cov = self.gmm.cov[k]  # (N, d, d)
        d = patches.shape[-1]
        A = cov + noise_var * jnp.eye(d)[None]
        rhs = (patches - mu)[..., None]
        sol = jnp.linalg.solve(A, rhs)[..., 0]
        return mu + jnp.einsum("nde,ne->nd", cov, sol)

    def denoise(self, y, sigma: float):
        """EPLL-HQS denoising (reference epll.py reconstruction loop)."""
        p = self.patch_size
        x = y
        for beta_rel in self.betas:
            beta = beta_rel / (sigma**2)
            patches, (nh, nw) = patch_extractor(x, p)
            B, N, d = patches.shape
            cleaned = self._wiener(patches.reshape(B * N, d), 1.0 / beta).reshape(B, N, d)
            # paste-average the cleaned patches
            x = self._paste_average(y, cleaned, (nh, nw), beta, sigma)
        return x

    def _paste_average(self, y, cleaned, grid, beta, sigma):
        p = self.patch_size
        B, C, H, W = y.shape
        nh, nw = grid
        cleaned = cleaned.reshape(B, nh, nw, C, p, p)

        acc = jnp.zeros_like(y)
        cnt = jnp.zeros((1, 1, H, W), y.dtype)
        ones = jnp.ones((1, 1, p, p), y.dtype)

        def body(carry, inp):
            acc, cnt = carry
            i, j = inp
            patch = jax.lax.dynamic_slice(
                cleaned, (0, i, j, 0, 0, 0), (B, 1, 1, C, p, p)
            ).reshape(B, C, p, p)
            acc = jax.lax.dynamic_update_slice(
                acc, jax.lax.dynamic_slice(acc, (0, 0, i, j), (B, C, p, p)) + patch,
                (0, 0, i, j),
            )
            cnt = jax.lax.dynamic_update_slice(
                cnt, jax.lax.dynamic_slice(cnt, (0, 0, i, j), (1, 1, p, p)) + ones,
                (0, 0, i, j),
            )
            return (acc, cnt), None

        ii, jj = jnp.meshgrid(jnp.arange(nh), jnp.arange(nw), indexing="ij")
        (acc, cnt), _ = jax.lax.scan(
            body, (acc, cnt), (ii.reshape(-1), jj.reshape(-1))
        )
        patch_avg = acc / jnp.clip(cnt, 1.0, None)
        # HQS closed form: x = (y/sigma^2 + beta * patch_avg)/(1/sigma^2 + beta)
        return (y / sigma**2 + beta * patch_avg) / (1.0 / sigma**2 + beta)

    def __call__(self, x, sigma=0.05, **kwargs):
        return self.denoise(x, float(sigma) if not hasattr(sigma, "shape") else sigma)
