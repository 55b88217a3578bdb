"""Learned primal-dual reconstruction (PDNet blocks) — counterpart of
reference examples/unfolded/demo_learned_primal_dual.py."""

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

from deepinv_tpu.physics import Tomography
from deepinv_tpu.models import PDNet
from deepinv_tpu.loss.metric import PSNR
from deepinv_tpu.datasets import shepp_logan


def main(steps=None):
    steps = _util.scale(150, 10) if steps is None else steps
    physics = Tomography(img_width=32, angles=24, normalize=True)
    x = jnp.asarray(shepp_logan(32))[None, None]
    xs = jnp.concatenate([x, jnp.roll(x, 3, axis=-1),
                          jnp.roll(x, -3, axis=-2)], 0)
    ys = physics.A(xs)

    model = PDNet(num_iter=5, key=jax.random.key(0))
    opt = optax.adam(1e-3)
    state = opt.init(model)

    @jax.jit
    def step(model, state):
        def loss(m):
            return jnp.mean((m(ys, physics) - xs) ** 2)

        l, g = jax.value_and_grad(loss)(model)
        updates, state = opt.update(g, state, model)
        return jax.tree_util.tree_map(lambda p, u: p + u, model, updates), state, l

    for i in range(steps):
        model, state, l = step(model, state)
    psnr = PSNR()
    xhat = model(ys, physics)
    fbp = physics.A_dagger(ys)
    print(f"FBP: {float(psnr(fbp, xs).mean()):.2f} dB, "
          f"learned PD ({steps} steps): {float(psnr(xhat, xs).mean()):.2f} dB, "
          f"final loss {float(l):.5f}")


if __name__ == "__main__":
    main()
