"""Batched reconstruction throughput — the single biggest TPU lever.

Batch-1 reconstruction leaves most of a TPU idle: weights stream from
HBM once per image and the MXU under-fills. Batching the SAME compiled
program amortizes both (measured on a v5e: PnP-HQS+DRUNet deblurring
goes from MFU 0.55 at B=1 to 0.71 at B=16, 434+ images/s/chip —
docs/tpu.md "Batch: the biggest single lever"). This demo shows the
pattern: one jitted reconstructor, two batch shapes, throughput per
image compared; everything else (physics, solver, params) is unchanged.

Run: python examples/demo_batched_throughput.py
"""

import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import _util

_util.setup()

import numpy as np
import jax
import jax.numpy as jnp

from deepinv_tpu.physics import BlurFFT, GaussianNoise
from deepinv_tpu.ops import gaussian_blur
from deepinv_tpu.optim import optim_builder, L2, PnP
from deepinv_tpu.models import MedianFilter
from deepinv_tpu.loss.metric import PSNR
from deepinv_tpu.datasets import shepp_logan

H = 32 if _util.fast() else 64
N_ITER = 4 if _util.fast() else 16
BATCHES = (1, 4) if _util.fast() else (1, 8)

# one physics + one reconstructor, reused across batch sizes ------------
physics = BlurFFT(img_size=(1, H, H), filter=gaussian_blur(sigma=1.0),
                  noise_model=GaussianNoise(0.01))
model = optim_builder("HQS", data_fidelity=L2(),
                      prior=PnP(MedianFilter()),
                      params_algo={"stepsize": 1.0, "g_param": 0.05},
                      max_iter=N_ITER)
recon = jax.jit(lambda m, yv, p: m(yv, p))

base = jnp.asarray(shepp_logan(H))[None, None]
psnr = PSNR()

for B in BATCHES:
    # a batch is just a leading axis — same program per shape, one
    # compile each; parameters (weights, masks) never retrigger compiles
    x = jnp.concatenate([jnp.roll(base, s, axis=-1) for s in range(B)])
    y = physics(x, key=jax.random.key(1))

    out = recon(model, y, physics)           # compile + warm up
    _ = np.asarray(jax.device_get(out)).ravel()[:1]

    t0 = time.perf_counter()
    reps = 3
    for _r in range(reps):
        out = recon(model, y, physics)
        _ = np.asarray(jax.device_get(out)).ravel()[:1]
    dt = (time.perf_counter() - t0) / reps

    p = float(jnp.mean(psnr(out, x)))
    print(f"B={B:2d}: {B / dt:8.1f} images/s   "
          f"({dt * 1e3:6.1f} ms/batch, {N_ITER} PnP iters)  PSNR {p:5.2f}")

print()
print("On real accelerators the per-image throughput climbs with batch")
print("until the chip saturates (v5e: ~B=8-16 for 256px reconstruction,")
print("measured table in docs/tpu.md). Per-image LATENCY rises, so serve")
print("interactive requests at B=1 and bulk workloads batched — the same")
print("jitted function handles both after one compile per shape.")
