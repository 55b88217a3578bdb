"""Building a custom optimization algorithm
(counterpart of reference examples/basics/demo_custom_optim.py and
examples/plug-and-play/demo_PnP_custom_optim.py).

Any object implementing the ``OptimIterator`` protocol — one state-dict in,
one state-dict out — plugs into ``optim_builder``/``BaseOptim`` and gets
the whole engine for free: per-iteration parameter schedules, convergence
metrics, and compilation of the full loop into a single ``lax.scan`` XLA
program. Here we write a heavy-ball (momentum) proximal gradient iterator
and compare it with plain PGD on deblurring.
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
import numpy as np

from deepinv_tpu.physics import BlurFFT, GaussianNoise
from deepinv_tpu.ops import gaussian_blur
from deepinv_tpu.optim import optim_builder, L2, PnP
from deepinv_tpu.optim.iterators import OptimIterator
from deepinv_tpu.models import MedianFilter
from deepinv_tpu.loss import PSNR
from deepinv_tpu.datasets import random_circles


class HeavyBallPGDIteration(OptimIterator):
    """Proximal gradient with Polyak momentum: the state carries the
    previous iterate and adds ``momentum * (x_k - x_{k-1})`` before the
    gradient step. State is an arbitrary pytree, so extra variables are
    free — the scan carries them."""

    requires_prox_g = True

    def init_state(self, x_init, y, physics):
        return {"est": (x_init, x_init), "x_prev": x_init,
                "it": jnp.asarray(0)}

    def __call__(self, X, data_fidelity, prior, params, y, physics):
        x, x_prev = X["est"][0], X["x_prev"]
        v = x + params.get("beta", 0.5) * (x - x_prev)
        z = v - params["stepsize"] * data_fidelity.grad(v, y, physics)
        x_new = prior.prox(z, params.get("g_param"),
                           gamma=params["lambda"] * params["stepsize"])
        return {"est": (x_new, z), "x_prev": x, "it": X["it"] + 1}


def main():
    x = jnp.asarray(random_circles(64, seed=1))[None]
    physics = BlurFFT(img_size=(1, 64, 64),
                      filter=gaussian_blur(sigma=1.5),
                      noise_model=GaussianNoise(0.02))
    y = physics(x, key=jax.random.key(0))
    psnr = PSNR()

    prior = PnP(MedianFilter(kernel_size=3))
    common = dict(data_fidelity=L2(), prior=prior, max_iter=20)

    pgd = optim_builder("PGD", params_algo={"stepsize": 1.0, "g_param": 0.1,
                                            "lambda": 1.0}, **common)
    custom = optim_builder(HeavyBallPGDIteration(),
                           params_algo={"stepsize": 1.0, "g_param": 0.1,
                                        "lambda": 1.0, "beta": 0.4}, **common)

    x_pgd = jax.jit(lambda m, yv, p: m(yv, p))(pgd, y, physics)
    x_hb = jax.jit(lambda m, yv, p: m(yv, p))(custom, y, physics)

    print(f"measurement      PSNR: {float(psnr(y, x)[0]):6.2f} dB")
    print(f"PnP-PGD          PSNR: {float(psnr(x_pgd, x)[0]):6.2f} dB")
    print(f"PnP heavy-ball   PSNR: {float(psnr(x_hb, x)[0]):6.2f} dB "
          f"(custom iterator, same engine)")


if __name__ == "__main__":
    main()
