"""Build a CUSTOM MCMC kernel and plug it into BaseSampling.

Mirrors the reference gallery's sampling ``demo_custom_kernel.py``
(reference sampling/sampling.py:19, sampling_iterators/): subclass
:class:`SamplingIterator`, implement one chain step, and the
:class:`BaseSampling` driver handles burn-in, thinning, and online Welford
mean/variance — the whole chain compiles to one ``lax.scan``.

The custom kernel here is a *preconditioned* ULA step: the likelihood
gradient is rescaled by the diagonal Fisher ``1/(A^T A + eps)`` (exact for
the Denoising/Inpainting-style diagonal operators), which accelerates
mixing for ill-conditioned masks. The posterior is Gaussian, so the chain's
mean/variance can be checked against the analytic answer.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import _util

_util.setup()  # CPU by default; DEEPINV_TPU_DEMO_PLATFORM overrides

import jax
import jax.numpy as jnp

from deepinv_tpu.optim import L2, Tikhonov
from deepinv_tpu.physics import Inpainting, GaussianNoise
from deepinv_tpu.sampling import BaseSampling
from deepinv_tpu.sampling.iterators import SamplingIterator


class PreconditionedULAIterator(SamplingIterator):
    """ULA with a diagonal-Fisher preconditioner M = (diag(A^T A) + eps)^-1:
    ``x+ = x + eta M (grad log p(y|x) + alpha grad log p(x))
    + sqrt(2 eta M) z``."""

    def __call__(self, X, y, physics, data_fidelity, prior, iteration, key):
        x = X["x"]
        eta = self.algo_params["step_size"]
        alpha = self.algo_params.get("alpha", 1.0)
        eps = self.algo_params.get("eps", 0.1)
        # diagonal of A^T A for a masking operator is the mask itself
        diag = physics.A_adjoint(physics.A(jnp.ones_like(x)))
        M = 1.0 / (diag / self.algo_params["sigma2"] + eps)
        glik = -data_fidelity.grad(x, y, physics) / self.algo_params["sigma2"]
        gpri = -alpha * prior.grad(x)
        z = jax.random.normal(key, x.shape, x.dtype)
        x_t = x + eta * M * (glik + gpri) + jnp.sqrt(2 * eta * M) * z
        return {"x": x_t}


def main():
    key = jax.random.key(0)
    sigma, lam = 0.1, 2.0  # noise std, Tikhonov weight

    physics = Inpainting(img_size=(1, 16, 16), mask=0.7,
                         noise_model=GaussianNoise(sigma), key=key)
    x = jax.random.uniform(jax.random.fold_in(key, 1), (1, 1, 16, 16))
    y = physics(x, key=jax.random.fold_in(key, 2))

    kernel = PreconditionedULAIterator(
        {"step_size": 0.05, "alpha": lam, "sigma2": sigma**2, "eps": 1.0})
    sampler = BaseSampling(kernel, data_fidelity=L2(), prior=Tikhonov(),
                           max_iter=12000, burnin_ratio=0.25, thinning=2)
    mean, var = sampler.sample(y, physics, key=jax.random.fold_in(key, 3))

    # analytic Gaussian posterior: precision = m/sigma^2 + lam (per pixel,
    # m the mask), mean = y*m/sigma^2 / precision
    m = physics.A_adjoint(physics.A(jnp.ones_like(mean)))
    prec = m / sigma**2 + lam
    mean_true = physics.A_adjoint(y) / sigma**2 / prec
    var_true = 1.0 / prec

    err_mean = float(jnp.max(jnp.abs(mean - mean_true)))
    err_var = float(jnp.max(jnp.abs(var - var_true) / var_true))
    print(f"posterior mean max err: {err_mean:.4f}")
    print(f"posterior var  max rel err: {err_var:.3f}")
    assert err_mean < 0.15 and err_var < 0.5
    print("custom MCMC kernel OK")


if __name__ == "__main__":
    main()
