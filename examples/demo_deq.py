"""Deep equilibrium reconstruction: implicit fixed-point network with O(1)
memory backward — counterpart of reference examples/unfolded/demo_DEQ.py."""

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

from deepinv_tpu.core import Module
from deepinv_tpu.physics import Inpainting, GaussianNoise
from deepinv_tpu.unfolded import DEQ_builder
from deepinv_tpu.optim import L2, PnP
from deepinv_tpu.models import DnCNN


class ContractiveDenoiser(Module):
    """0.9 x + 0.1 net(x): keeps the PGD fixed-point map contractive so
    the equilibrium exists even at random initialization (DEQ theory
    requires a contraction; an untrained denoiser alone can expand)."""

    def __init__(self, net):
        self.net = net

    def __call__(self, x, sigma=None, **kw):
        return 0.9 * x + 0.1 * self.net(x, sigma)
from deepinv_tpu.loss.metric import PSNR
from deepinv_tpu.datasets import random_circles


def main(steps=None):
    steps = _util.scale(30, 5) if steps is None else steps
    physics = Inpainting(img_size=(1, 32, 32), mask=0.6,
                         key=jax.random.key(0),
                         noise_model=GaussianNoise(0.02))
    xs = jnp.asarray(np.stack([random_circles(32, seed=i) for i in range(8)]))
    ys = physics(xs, key=jax.random.key(1))

    model = DEQ_builder(
        "PGD", data_fidelity=L2(), prior=PnP(ContractiveDenoiser(DnCNN(1, 1, depth=3, nf=8))),
        params_algo={"stepsize": 0.5, "g_param": 0.05},
        max_iter=_util.scale(30, 8), max_iter_backward=_util.scale(20, 5),
    )
    opt = optax.adam(1e-3)
    state = opt.init(model)

    @jax.jit
    def step(model, state, y, x):
        def loss(m):
            return jnp.mean((m(y, physics) - x) ** 2)

        l, g = jax.value_and_grad(loss)(model)
        updates, state = opt.update(g, state, model)
        model = jax.tree_util.tree_map(lambda p, u: p + u, model, updates)
        return model, state, l

    for i in range(steps):
        model, state, l = step(model, state, ys, xs)
        if i % 10 == 0:
            print(f"step {i}: loss {float(l):.5f}")
    psnr = PSNR()
    xhat = model(ys, physics)
    print(f"trained DEQ PSNR: {float(psnr(xhat, xs).mean()):.2f} dB "
          f"(measurement {float(psnr(ys, xs).mean()):.2f} dB)")


if __name__ == "__main__":
    main()
