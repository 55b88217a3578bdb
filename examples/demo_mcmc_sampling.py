"""Uncertainty quantification with MCMC: ULA and SKRock posterior sampling
with online Welford statistics — counterpart of reference
examples/sampling/demo_sampling.py."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import _util

_util.setup()  # CPU by default; DEEPINV_TPU_DEMO_PLATFORM overrides

import jax
import jax.numpy as jnp

from deepinv_tpu.physics import Denoising, GaussianNoise
from deepinv_tpu.optim import L2, ScorePrior
from deepinv_tpu.sampling import ULA, SKRock


class GaussScoreDenoiser:
    """Denoiser of the analytic prior N(mu, tau^2) (gives exact scores)."""

    mu, tau = 0.3, 0.5

    def __call__(self, x, sigma, **kw):
        s2 = jnp.asarray(sigma) ** 2
        return (self.mu * s2 + x * self.tau**2) / (self.tau**2 + s2)


def main():
    sigma_noise = 0.3
    physics = Denoising(noise_model=GaussianNoise(sigma_noise))
    x = jnp.full((1, 1, 16, 16), 0.7)
    y = physics(x, key=jax.random.key(0))

    prior = ScorePrior(GaussScoreDenoiser())
    # analytic posterior mean for the conjugate Gaussian pair
    mu, tau = GaussScoreDenoiser.mu, GaussScoreDenoiser.tau
    post_mean = (mu / tau**2 + y / sigma_noise**2) / (
        1 / tau**2 + 1 / sigma_noise**2)

    for name, sampler in [
        ("ULA", ULA(prior, L2(sigma=sigma_noise), step_size=0.01, sigma=1e-3,
                    max_iter=3000, burnin_ratio=0.3, clip=None)),
        ("SKRock", SKRock(prior, L2(sigma=sigma_noise), step_size=2e-3,
                          sigma=1e-3, max_iter=1500, inner_iter=5,
                          burnin_ratio=0.3, clip=None)),
    ]:
        mean, var = sampler.sample(y, physics, key=jax.random.key(1))
        err = float(jnp.abs(mean - post_mean).max())
        print(f"{name}: max |mean - analytic posterior mean| = {err:.3f}, "
              f"mean posterior std = {float(jnp.sqrt(var).mean()):.3f}")
        assert err < 0.2


if __name__ == "__main__":
    main()
