"""Per-conv speed-of-light microbench: N identical 3x3 convs chained.

Establishes what one XLA conv costs at each DRUNet scale on this chip, to
compare DRUNet's measured time against the sum of its conv inventory
(the 'XLA-conv roofline').

Usage: python scripts/bench_conv_sol.py
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

CASES = [  # (H, C) mirroring DRUNet scales at 256 px
    (256, 64),
    (128, 128),
    (64, 256),
    (32, 512),
]
N = 24


def time_stack(H, C, relu, iters):
    k = jax.random.key(0)
    x = jax.jit(lambda k: jax.random.uniform(k, (1, H, H, C), jnp.bfloat16))(k)
    w = jax.jit(lambda k: (jax.random.normal(k, (3, 3, C, C), jnp.bfloat16)
                           * 0.05))(k)

    def step(v):
        o = lax.conv_general_dilated(
            v, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16)
        return jax.nn.relu(o) if relu else o

    f = jax.jit(lambda v: lax.scan(lambda c, _: (step(c), None), v, None,
                                   length=iters)[0])
    _ = np.asarray(jax.device_get(f(x))).ravel()[:1]
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        o = f(x)
        _ = np.asarray(jax.device_get(o)).ravel()[:1]
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    for H, C in CASES:
        t = (time_stack(H, C, True, 4 * N) - time_stack(H, C, True, N)) / (3 * N)
        flops = 2 * 9 * C * C * H * H
        mb = 2 * (H * H * C * 2) / 1e6  # read+write activation, bf16
        print(f"{H}px C={C}: {t*1e6:7.1f} us/conv  "
              f"{flops/t/1e12:5.1f} TF/s ({flops/t/197e12*100:4.1f}% MXU)  "
              f"{mb/t/1e3:6.0f} GB/s act-traffic")


if __name__ == "__main__":
    main()
