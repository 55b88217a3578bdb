"""Vanilla unfolded algorithm for super-resolution
(counterpart of reference examples/unfolded/demo_vanilla_unfolded.py).

``unfolded_builder`` turns a fixed number of PGD iterations into a
trainable network: the per-iteration stepsizes, threshold levels, and the
prior's parameters are pytree leaves, so ``jax.grad`` through the
reconstruction IS unrolled training — no special machinery. The whole
unrolled net compiles to one ``lax.scan`` XLA program.
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
import optax

from deepinv_tpu.physics import Downsampling, GaussianNoise
from deepinv_tpu.ops import gaussian_blur
from deepinv_tpu.unfolded import unfolded_builder
from deepinv_tpu.optim import L2, PnP
from deepinv_tpu.models import DnCNN
from deepinv_tpu.loss import PSNR
from deepinv_tpu.datasets import random_circles


def main(steps=150):
    imgs = np.stack([random_circles(32, seed=i) for i in range(16)])
    x_train, x_test = jnp.asarray(imgs[:12]), jnp.asarray(imgs[12:])

    physics = Downsampling(img_size=(1, 32, 32), factor=2,
                           filter=gaussian_blur(sigma=1.0),
                           noise_model=GaussianNoise(0.01))

    # 5 unrolled PGD iterations; trainable: stepsize/g_param schedules AND
    # the small DnCNN prior weights (everything is one pytree)
    net = unfolded_builder(
        "PGD", data_fidelity=L2(),
        prior=PnP(DnCNN(1, 1, depth=4, nf=8)),
        params_algo={"stepsize": 1.0, "g_param": 0.05, "lambda": 1.0},
        max_iter=5,
    )

    opt = optax.adam(1e-3)
    opt_state = opt.init(net)
    psnr = PSNR()

    @jax.jit
    def train_step(net, opt_state, x, key):
        y = jax.vmap(lambda v, k: physics(v[None], key=k)[0])(
            x, jax.random.split(key, x.shape[0]))

        def loss_fn(net):
            return jnp.mean((net(y, physics) - x) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(net)
        updates, opt_state = opt.update(grads, opt_state, net)
        net = optax.apply_updates(net, updates)
        return net, opt_state, loss

    y_test = physics(x_test, key=jax.random.key(99))
    print(f"initial test PSNR: "
          f"{float(jnp.mean(psnr(net(y_test, physics), x_test))):.2f} dB")

    key = jax.random.key(0)
    for it in range(steps):
        key, k = jax.random.split(key)
        net, opt_state, loss = train_step(net, opt_state, x_train, k)
        if (it + 1) % 50 == 0:
            p = float(jnp.mean(psnr(net(y_test, physics), x_test)))
            print(f"step {it+1:4d}: train loss {float(loss):.5f}  "
                  f"test PSNR {p:.2f} dB")

    print("learned stepsize schedule:",
          np.round(np.asarray(net.params_algo['stepsize']).ravel(), 3))


if __name__ == "__main__":
    main()
