"""Extended conv shape sweep with noise-robust timing.

Programs are sized so the long run is ~300ms >> the 40-70ms axon dispatch
noise; slope between 1x and 4x cancels fixed overhead.

Usage: python scripts/bench_conv_sol2.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp
import numpy as np
from jax import lax

CASES = [
    (256, 64, 3),    # DRUNet scale0 as-is
    (128, 256, 2),   # scale0 via s2d
    (128, 128, 3),   # scale1 as-is
    (64, 512, 2),    # scale1 via s2d
    (64, 256, 3),    # scale2
    (32, 512, 3),    # scale3
    (128, 256, 3),   # probe
    (256, 64, 3),    # repeat of case 1 -> noise gauge
]


def time_stack(H, C, k, iters):
    key = jax.random.key(0)
    x = jax.jit(lambda kk: jax.random.uniform(kk, (1, H, H, C), jnp.bfloat16))(key)
    w = jax.jit(lambda kk: (jax.random.normal(kk, (k, k, C, C), jnp.bfloat16) * 0.05))(key)
    pad = (k - 1) // 2

    def step(v):
        o = lax.conv_general_dilated(
            v, w, (1, 1), [(pad, k - 1 - pad)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16)
        return jax.nn.relu(o)

    f = jax.jit(lambda v, n=iters: lax.scan(
        lambda c, _: (step(c), None), v, None, length=n)[0])
    _ = np.asarray(jax.device_get(f(x))).ravel()[:1]
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        o = f(x)
        _ = np.asarray(jax.device_get(o)).ravel()[:1]
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    for H, C, k in CASES:
        flops = 2 * k * k * C * C * H * H
        t_est = flops / (0.3 * 197e12)  # assume 30% MXU for sizing
        n = max(64, int(0.075 / t_est))  # long run ~4n*t_est = 300ms
        t = (time_stack(H, C, k, 4 * n) - time_stack(H, C, k, n)) / (3 * n)
        print(f"{H}px C={C} k={k} (n={n}): {t*1e6:7.1f} us/conv  "
              f"{flops/t/1e12:5.1f} TF/s ({flops/t/197e12*100:4.1f}% MXU)",
              flush=True)


if __name__ == "__main__":
    main()
