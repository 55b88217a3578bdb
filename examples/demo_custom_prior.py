"""Defining a custom prior (counterpart of reference
examples/optimization/demo_custom_prior.py).

A prior only needs a cost ``fn(x)`` — ``grad`` comes free from autodiff
(the reference uses torch autograd the same way, prior.py:18), and any
algorithm consuming gradients (GD, PGD via inner prox, ADMM) accepts it.
We write a Huber total-variation prior (smooth near zero, robust in the
tails) and compare it with Tikhonov and exact TV on inpainting.
"""

# make the repo root importable when run as `python examples/<demo>.py`
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import _util

_util.setup()  # CPU by default; DEEPINV_TPU_DEMO_PLATFORM overrides

import jax
import jax.numpy as jnp

from deepinv_tpu.physics import Inpainting, GaussianNoise
from deepinv_tpu.optim import optim_builder, L2, Tikhonov, TVPrior
from deepinv_tpu.optim.prior import Prior
from deepinv_tpu.loss import PSNR
from deepinv_tpu.datasets import random_circles


class HuberTV(Prior):
    """g(x) = sum_i huber(|(Dx)_i|): quadratic below ``delta``, linear
    above. Only ``fn`` is defined — ``grad`` is jax.grad of it."""

    def __init__(self, delta: float = 0.05):
        self.delta = delta

    def fn(self, x, *args, **kwargs):
        dx = jnp.diff(x, axis=-1, append=x[..., -1:])
        dy = jnp.diff(x, axis=-2, append=x[..., -1:, :])
        mag = jnp.sqrt(dx**2 + dy**2 + 1e-12)
        d = self.delta
        h = jnp.where(mag <= d, 0.5 * mag**2 / d, mag - 0.5 * d)
        return jnp.sum(h.reshape(x.shape[0], -1), axis=1)


def main():
    x = jnp.asarray(random_circles(64, seed=4))[None]
    physics = Inpainting(img_size=(1, 64, 64), mask=0.4,
                         key=jax.random.key(0),
                         noise_model=GaussianNoise(0.05))
    y = physics(x, key=jax.random.key(1))
    psnr = PSNR()

    run = jax.jit(lambda m, yv, p: m(yv, p))
    delta = 0.05
    # GD stability: stepsize < 2 / (1 + lambda * L_prior); Huber-TV has
    # gradient Lipschitz constant ~ 8/delta
    priors = [
        ("Tikhonov", Tikhonov(), 0.1, 0.9),
        ("exact TV", TVPrior(), 0.1, 0.1),
        ("Huber TV (custom)", HuberTV(delta=delta), 0.1,
         1.8 / (1 + 0.1 * 8 / delta)),
    ]
    print(f"measurement PSNR: {float(psnr(y, x)[0]):6.2f} dB")
    for name, prior, lam, step in priors:
        model = optim_builder(
            "GD", data_fidelity=L2(), prior=prior,
            params_algo={"stepsize": step, "lambda": lam, "g_param": 0.05},
            max_iter=400,
        )
        xhat = run(model, y, physics)
        print(f"{name:>18s}: {float(psnr(xhat, x)[0]):6.2f} dB")


if __name__ == "__main__":
    main()
