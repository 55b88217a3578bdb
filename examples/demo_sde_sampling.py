"""Generative SDE sampling: VE/VP diffusion + flow matching with Euler and
Heun solvers — counterpart of reference examples/sampling/demo_diffusion_sde.py
and demo_flow_matching.py."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import _util

_util.setup()  # CPU by default; DEEPINV_TPU_DEMO_PLATFORM overrides

import jax
import jax.numpy as jnp
import numpy as np

from deepinv_tpu.sampling import (
    VarianceExplodingDiffusion,
    VariancePreservingDiffusion,
    FlowMatching,
    EulerSolver,
    HeunSolver,
)


class ShrinkDenoiser:
    """Analytic MMSE denoiser of the Gaussian image prior N(mu, tau^2)."""

    mu, tau = 0.5, 0.2

    def __call__(self, x, sigma, **kw):
        s2 = jnp.asarray(sigma) ** 2
        return (self.mu * s2 + x * self.tau**2) / (self.tau**2 + s2)


def main():
    den = ShrinkDenoiser()
    shape = (4, 1, 16, 16)
    ts = np.linspace(1.0, 1e-3, 200)

    for name, sde in [
        ("VE", VarianceExplodingDiffusion(den, sigma_min=0.01, sigma_max=5.0)),
        ("VP", VariancePreservingDiffusion(den)),
    ]:
        x0 = sde.prior_sample(shape, jax.random.key(0))
        x = EulerSolver(ts).sample(sde, x0, key=jax.random.key(1))
        # reverse SDE drives samples toward the prior mean mu = 0.5
        print(f"{name} + Euler(200): sample mean = {float(x.mean()):.3f} "
              f"(target 0.5)")
        assert abs(float(x.mean()) - 0.5) < 0.3

    # Heun (2nd order) gets there with far fewer steps
    sde = VarianceExplodingDiffusion(den, sigma_min=0.01, sigma_max=5.0)
    x0 = sde.prior_sample(shape, jax.random.key(2))
    x_heun = HeunSolver(np.linspace(1.0, 1e-3, 40)).sample(
        sde, x0, key=jax.random.key(3))
    print(f"VE + Heun(40): sample mean = {float(x_heun.mean()):.3f}")

    fm = FlowMatching(den, timesteps=np.linspace(1.0, 0.0, 50))
    x_fm = fm.sample(
        jax.random.normal(jax.random.key(4), shape), key=jax.random.key(5))
    print(f"FlowMatching(50): sample mean = {float(x_fm.mean()):.3f}")


if __name__ == "__main__":
    main()
