"""Spatially sharded denoising on a device mesh
(counterpart of reference examples/distributed/demo_denoiser_distributed.py).

Images too large for one device are split across the mesh: each device
denoises its slab, exchanging ``overlap`` halo rows with neighbors over
ICI (``lax.ppermute`` — the TPU analogue of the reference's
OverlapTilingStrategy, strategies.py:292) so tile seams vanish. The
imaging counterpart of context/sequence parallelism.

Run with a virtual mesh:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 python examples/demo_denoiser_distributed.py
"""

# make the repo root importable when run as `python examples/<demo>.py`
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import _util

_util.setup()  # CPU by default; DEEPINV_TPU_DEMO_PLATFORM overrides

if "--xla_force_host_platform_device_count" not in _os.environ.get("XLA_FLAGS", ""):
    _os.environ["XLA_FLAGS"] = (
        _os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from deepinv_tpu.parallel import DistributedContext, distribute
from deepinv_tpu.models import MedianFilter
from deepinv_tpu.datasets import random_circles


def main():
    n_dev = len(jax.devices())
    ctx = DistributedContext(axis_names=("sp",))
    print(f"mesh: {n_dev} devices on spatial axis 'sp'")

    # a "large" image: 512 rows -> 64 rows per device on an 8-device mesh
    x = jnp.asarray(random_circles(512, seed=1))[None]
    noisy = x + 0.15 * jax.random.normal(jax.random.key(0), x.shape)

    den = MedianFilter(kernel_size=5)
    dden_halo = distribute(den, ctx, tiling_strategy="overlap_tiling",
                           overlap=8)
    dden_basic = distribute(den, ctx, tiling_strategy="basic")

    ref = den(noisy, 0.15)                 # single-device ground truth
    out_halo = dden_halo(noisy, 0.15)      # sharded + halo exchange
    out_basic = dden_basic(noisy, 0.15)    # sharded, no halo (seams!)

    err_halo = float(jnp.abs(out_halo - ref).max())
    err_basic = float(jnp.abs(out_basic - ref).max())
    print(f"halo tiling  : max dev vs single-device {err_halo:.2e}")
    print(f"basic tiling : max dev vs single-device {err_basic:.2e} "
          f"(boundary seams, as expected)")
    assert err_halo < 1e-5 < err_basic

    # micro-batching: a 12-image batch processed in chunks of 4 per device
    batch = jnp.repeat(noisy, 12, axis=0)
    dden_mb = distribute(den, ctx, overlap=8, max_batch_size=4)
    out_mb = dden_mb(batch, 0.15)
    print(f"max_batch_size=4 on batch {tuple(batch.shape)} -> "
          f"{tuple(out_mb.shape)}, matches: "
          f"{float(jnp.abs(out_mb[0] - ref[0]).max()):.2e}")


if __name__ == "__main__":
    main()
