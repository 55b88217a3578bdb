"""Unfolded algorithm with a handcrafted prior
(counterpart of reference examples/unfolded/demo_custom_prior_unfolded.py).

Unrolling does not require a neural prior: here the regularizer is a
hand-written smoothed-TV cost ``g(x) = ||∇x||_2`` and ONLY the
per-iteration stepsizes and regularization weights are trained. The
gradient of ``g`` comes from autodiff, and training backpropagates
through all 10 unrolled gradient-descent iterations (one ``lax.scan``).
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

from deepinv_tpu.physics import Inpainting, GaussianNoise
from deepinv_tpu.unfolded import unfolded_builder
from deepinv_tpu.optim import L2
from deepinv_tpu.optim.prior import Prior
from deepinv_tpu.loss import PSNR
from deepinv_tpu.datasets import random_circles


class SmoothTV(Prior):
    """g(x) = sqrt(sum |grad x|^2) — autodiff supplies the gradient."""

    def fn(self, x, *args, **kwargs):
        dx = jnp.diff(x, axis=-1)
        dy = jnp.diff(x, axis=-2)
        s = jnp.sum((dx**2).reshape(x.shape[0], -1), axis=1)
        s = s + jnp.sum((dy**2).reshape(x.shape[0], -1), axis=1)
        return jnp.sqrt(s + 1e-12)


def main(steps=200):
    imgs = np.stack([random_circles(32, seed=i) for i in range(16)])
    x_train, x_test = jnp.asarray(imgs[:12]), jnp.asarray(imgs[12:])
    physics = Inpainting(img_size=(1, 32, 32), mask=0.5,
                         key=jax.random.key(0),
                         noise_model=GaussianNoise(0.03))

    net = unfolded_builder(
        "GD", data_fidelity=L2(), prior=SmoothTV(),
        params_algo={"stepsize": 1.0, "lambda": 0.5, "g_param": 0.0},
        max_iter=10, trainable_params=("stepsize", "lambda"),
    )

    opt = optax.adam(5e-3)
    opt_state = opt.init(net)
    psnr = PSNR()
    y_test = physics(x_test, key=jax.random.key(9))

    @jax.jit
    def train_step(net, opt_state, key):
        y = physics(x_train, key=key)

        def loss_fn(n):
            return jnp.mean((n(y, physics) - x_train) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(net)
        updates, opt_state = opt.update(grads, opt_state, net)
        return optax.apply_updates(net, updates), opt_state, loss

    print(f"before training: "
          f"{float(jnp.mean(psnr(net(y_test, physics), x_test))):.2f} dB")
    key = jax.random.key(1)
    for it in range(steps):
        key, k = jax.random.split(key)
        net, opt_state, loss = train_step(net, opt_state, k)
    print(f"after {steps} steps: "
          f"{float(jnp.mean(psnr(net(y_test, physics), x_test))):.2f} dB")
    print("learned stepsizes:",
          np.round(np.asarray(net.params_algo["stepsize"]).ravel(), 3))
    print("learned lambdas  :",
          np.round(np.asarray(net.params_algo["lambda"]).ravel(), 3))


if __name__ == "__main__":
    main()
