"""Mesh-parallel PnP over stacked operators + spatially sharded denoiser
(counterpart of reference examples/distributed/demo_pnp_distributed.py).

Run with a virtual mesh:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 python examples/demo_distributed_pnp.py
"""

# make the repo root importable when run as `python examples/<demo>.py`
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import _util

_util.setup()  # CPU by default; DEEPINV_TPU_DEMO_PLATFORM overrides

# this demo is about multi-device execution: run it on a virtual 8-device CPU
# mesh so it demonstrates the collectives even on a single-chip (or no-TPU) host
if "--xla_force_host_platform_device_count" not in _os.environ.get("XLA_FLAGS", ""):
    _os.environ["XLA_FLAGS"] = (
        _os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from deepinv_tpu.parallel import DistributedContext, distribute
from deepinv_tpu.physics import Blur
from deepinv_tpu.ops import gaussian_blur
from deepinv_tpu.optim import L2
from deepinv_tpu.models import MedianFilter
from deepinv_tpu.datasets import random_circles


def main():
    n_dev = len(jax.devices())
    ctx = DistributedContext(axis_names=("op",))
    plist = [
        Blur(filter=gaussian_blur(sigma=1.0, psf_size=(7, 7)), padding="circular")
        for _ in range(n_dev)
    ]
    dphys = distribute(plist, ctx)
    dfid = distribute(L2(), ctx)

    x = jnp.asarray(random_circles(64, seed=0))[None]
    y = dphys.A(x)
    z = jnp.zeros_like(x)
    den = MedianFilter(3)
    # the stacked adjoint sums n_dev sub-adjoints, so ||A^T A|| ~ n_dev:
    # scale the stepsize accordingly or PGD diverges
    step = 0.9 / n_dev
    for _ in range(20):
        z = z - step * dfid.grad(z, y, dphys)
        z = den(z)
    mse = float(np.mean((np.asarray(z) - np.asarray(x)) ** 2))
    mse0 = float(np.mean(np.asarray(x) ** 2))
    print(f"mse: {mse:.4f} (vs zero-init {mse0:.4f})")
    assert mse < 0.5 * mse0, "distributed PGD should reduce the error"


if __name__ == "__main__":
    main()
