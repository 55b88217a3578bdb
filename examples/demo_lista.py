"""Unfolded LISTA for compressed sensing — counterpart of reference
examples/unfolded/demo_LISTA.py: learned per-iteration stepsizes and
thresholds of an unfolded ISTA (PGD + L1 prior)."""

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

from deepinv_tpu.physics import CompressedSensing
from deepinv_tpu.unfolded import unfolded_builder
from deepinv_tpu.optim import L2, L1Prior


def main(steps=None):
    steps = _util.scale(50, 8) if steps is None else steps
    n, m = 64, 40
    physics = CompressedSensing(m=m, img_size=(1, 8, 8), key=jax.random.key(0))
    # sparse signals
    rng = np.random.default_rng(0)
    xs = (rng.random((16, 1, 8, 8)) < 0.1).astype(np.float32)
    xs = jnp.asarray(xs * rng.random((16, 1, 8, 8)).astype(np.float32))
    ys = physics.A(xs)

    model = unfolded_builder(
        "PGD", data_fidelity=L2(), prior=L1Prior(),
        params_algo={"stepsize": 0.5, "g_param": 0.01},
        max_iter=8, trainable_params=["stepsize", "g_param"],
    )
    opt = optax.adam(5e-3)
    state = opt.init(model)

    @jax.jit
    def step(model, state):
        def loss(m_):
            return jnp.mean((m_(ys, physics) - xs) ** 2)

        l, g = jax.value_and_grad(loss)(model)
        updates, state = opt.update(g, state, model)
        return jax.tree_util.tree_map(lambda p, u: p + u, model, updates), state, l

    l0 = None
    for i in range(steps):
        model, state, l = step(model, state)
        l0 = l0 if l0 is not None else float(l)
    print(f"LISTA training: loss {l0:.5f} -> {float(l):.5f}")
    assert float(l) < l0


if __name__ == "__main__":
    main()
