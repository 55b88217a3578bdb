"""Benchmark: PnP-HQS DRUNet deblurring iteration throughput on one chip.

This is BASELINE.json config #1 (PnP-HQS Gaussian deblurring, Blur physics +
DRUNet prior): the hot loop is one closed-form FFT prox + one DRUNet forward
per iteration, compiled as a single ``lax.scan`` XLA program.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is measured against the PyTorch reference running the
identical workload (deepinv BlurFFT + DRUNet(pretrained=None) + HQS,
8 iterations, 1x3x256x256) on this host's CPU with 8 torch threads:
0.385 it/s (measured 2026-08-16; see BASELINE.md). The north-star target is
5x an A100 running the torch reference; an A100 runs this workload at
roughly 100x the CPU figure, so vs_baseline > ~500 clears that bar.
"""

import json
import time

import jax
import jax.numpy as jnp

from deepinv_tpu.physics import BlurFFT, GaussianNoise
from deepinv_tpu.ops import gaussian_blur
from deepinv_tpu.optim import optim_builder, L2, PnP
from deepinv_tpu.models import DRUNet

TORCH_CPU_REFERENCE_ITS = 0.385  # measured: reference PnP-HQS(DRUNet) it/s
N_ITER = 8
SHAPE = (1, 3, 256, 256)


def main():
    key = jax.random.key(0)
    x = jax.jit(lambda k: jax.random.uniform(k, SHAPE))(key)
    physics = BlurFFT(
        img_size=SHAPE[1:],
        filter=gaussian_blur(sigma=1.5),
        noise_model=GaussianNoise(0.01),
    )
    y = jax.jit(lambda p, v, k: p(v, key=k))(physics, x, jax.random.key(1))

    denoiser = DRUNet(pretrained=None)  # standard nc=(64,128,256,512), nb=4
    model = optim_builder(
        "HQS",
        data_fidelity=L2(),
        prior=PnP(denoiser),
        params_algo={"stepsize": 2.0, "g_param": 0.02},
        max_iter=N_ITER,
    )

    # Slope-based timing: the axon tunnel adds ~40-70 ms of dispatch noise
    # per call, so we measure the *marginal* cost per iteration by comparing
    # an N_ITER-iteration recon with a 4x longer one (min over repeats).
    import numpy as np

    def build(iters):
        m = optim_builder(
            "HQS",
            data_fidelity=L2(),
            prior=PnP(denoiser),
            params_algo={"stepsize": 2.0, "g_param": 0.02},
            max_iter=iters,
        )
        f = jax.jit(lambda mm, yv, p: mm(yv, p))
        _ = np.asarray(jax.device_get(f(m, y, physics))).ravel()[:1]
        def timed():
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                o = f(m, y, physics)
                _ = np.asarray(jax.device_get(o)).ravel()[:1]
                ts.append(time.perf_counter() - t0)
            return min(ts)
        return timed()

    t_short = build(N_ITER)
    t_long = build(N_ITER * 4)
    dt = (t_long - t_short) / (N_ITER * 3)

    its = 1.0 / dt
    print(
        json.dumps(
            {
                "metric": "pnp_hqs_drunet_deblur_256px_iters_per_sec_chip",
                "value": round(its, 2),
                "unit": "iter/s",
                "vs_baseline": round(its / TORCH_CPU_REFERENCE_ITS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
