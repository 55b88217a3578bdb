"""UNSURE: self-supervised denoising with an UNKNOWN noise level.

Mirrors the reference gallery's self-supervised-learning ``demo_unsure.py``
(reference loss/sure.py:95): standard SURE needs the true noise variance;
UNSURE treats it as a Lagrange multiplier learned by gradient ascent on the
Monte-Carlo divergence while the denoiser trains by descent on the loss.
Start the estimate wrong on purpose and watch it converge toward the true
sigma while training improves PSNR.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import _util

_util.setup()  # CPU by default; DEEPINV_TPU_DEMO_PLATFORM overrides

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deepinv_tpu.datasets import random_circles
from deepinv_tpu.loss import SureGaussianLoss, PSNR
from deepinv_tpu.models import DnCNN
from deepinv_tpu.physics import Denoising, GaussianNoise


def main():
    key = jax.random.key(0)
    sigma_true = 0.1
    x = jnp.asarray(np.stack([random_circles(32, seed=s) for s in range(4)]))
    physics = Denoising(noise_model=GaussianNoise(sigma_true))
    y = physics(x, key=key)

    # deliberately wrong initial noise level (half the truth)
    loss = SureGaussianLoss(sigma=0.5 * sigma_true, unsure=True, step_size=1e-3)
    net = DnCNN(1, 1, depth=3, nf=8, key=jax.random.fold_in(key, 1))
    opt = optax.adam(1e-3)
    opt_state = opt.init(net)

    # training loop: the UNSURE sigma update is host-side, so the loss runs
    # eagerly for the sigma step; the network gradient uses the current
    # (frozen) sigma2
    def loss_at(n, s2, k):
        frozen = SureGaussianLoss(sigma=float(np.sqrt(s2)))
        return jnp.mean(frozen(y=y, physics=physics,
                               model=lambda u, p, **kw: n(u, 0.1), key=k))

    sigmas = []
    for i in range(40):
        k = jax.random.fold_in(key, 10 + i)
        # eager UNSURE call updates loss.sigma2
        _ = loss(y=y, physics=physics, model=lambda u, p, **kw: net(u, 0.1), key=k)
        l, g = jax.value_and_grad(
            lambda n: loss_at(n, loss.sigma2, k))(net)
        updates, opt_state = opt.update(g, opt_state, net)
        net = optax.apply_updates(net, updates)
        sigmas.append(float(np.sqrt(loss.sigma2)))

    closest = min(sigmas, key=lambda s: abs(s - sigma_true))
    print(f"sigma trajectory: {sigmas[0]:.4f} -> {sigmas[-1]:.4f} "
          f"(true {sigma_true}; closest visit {closest:.4f})")
    psnr = PSNR(max_pixel=1.0)
    p_in = float(jnp.mean(psnr(y, x)))
    p_out = float(jnp.mean(psnr(net(y, 0.1), x)))
    print(f"PSNR: noisy {p_in:.2f} dB -> {p_out:.2f} dB after 40 joint steps")
    # the ascent responds and sweeps through the true level; reaching the
    # min-max equilibrium (sigma ~ sigma_true with a good denoiser) needs
    # real training budgets — this smoke run only checks the mechanism
    assert abs(closest - sigma_true) < abs(sigmas[0] - sigma_true), \
        "noise-level ascent should sweep toward the true level"
    print("UNSURE OK")


if __name__ == "__main__":
    main()
