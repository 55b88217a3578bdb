"""Constant-memory unfolded training with rematerialization — counterpart
of reference examples/unfolded/demo_unfolded_constant_memory.py. With
``remat=True`` the scan body is checkpointed (jax.checkpoint): activations
are recomputed in the backward pass instead of stored."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import _util

_util.setup()  # CPU by default; DEEPINV_TPU_DEMO_PLATFORM overrides

import jax
import jax.numpy as jnp

from deepinv_tpu.physics import Inpainting, GaussianNoise
from deepinv_tpu.unfolded import unfolded_builder
from deepinv_tpu.optim import L2, PnP
from deepinv_tpu.models import DnCNN
from deepinv_tpu.datasets import random_circles


def main():
    physics = Inpainting(img_size=(1, 32, 32), mask=0.6,
                         key=jax.random.key(0),
                         noise_model=GaussianNoise(0.02))
    x = jnp.asarray(random_circles(32, seed=0))[None]
    y = physics(x, key=jax.random.key(1))

    outs = {}
    for remat in (False, True):
        model = unfolded_builder(
            "PGD", data_fidelity=L2(), prior=PnP(DnCNN(1, 1, depth=3, nf=8)),
            params_algo={"stepsize": 1.0, "g_param": 0.05},
            max_iter=24, remat=remat,
        )
        g = jax.jit(jax.grad(lambda m: jnp.mean((m(y, physics) - x) ** 2)))(model)
        outs[remat] = g
        # compiled memory estimate for the gradient computation
        from deepinv_tpu.utils import compiled_cost

        cost = compiled_cost(
            lambda m: jnp.mean((model.replace and m)(y, physics) - x) ** 2
            if False else jax.grad(
                lambda mm: jnp.mean((mm(y, physics) - x) ** 2))(m),
            model,
        )
        print(f"remat={remat}: temp bytes ~ {cost.get('bytes accessed', 'n/a')}")
    # gradients agree: remat changes memory, not math
    import numpy as np

    leaves_a = jax.tree_util.tree_leaves(outs[False])
    leaves_b = jax.tree_util.tree_leaves(outs[True])
    err = max(float(jnp.abs(a - b).max()) for a, b in zip(leaves_a, leaves_b)
              if hasattr(a, "dtype"))
    print(f"max grad difference remat vs plain: {err:.2e}")
    assert err < 1e-4


if __name__ == "__main__":
    main()
