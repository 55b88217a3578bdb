"""Extended conv shape sweep: find fast shapes for a space-to-depth DRUNet.

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

# (H, Cin, Cout, k): candidates
CASES = [
    (256, 64, 64, 3),    # DRUNet scale0 as-is
    (128, 256, 256, 2),  # scale0 via s2d (4x ch, 2x2 kernel)
    (128, 128, 128, 3),  # scale1 as-is
    (64, 512, 512, 2),   # scale1 via s2d
    (64, 256, 256, 3),   # scale2 as-is (fast baseline)
    (32, 512, 512, 3),   # scale3 as-is (redo with bigger N)
    (128, 256, 256, 3),  # probe: is C the driver at 128px?
    (256, 128, 128, 3),  # probe: 256px with C=128
]
N = 48


def time_stack(H, Cin, Cout, k, iters):
    assert Cin == Cout
    key = jax.random.key(0)
    x = jax.jit(lambda kk: jax.random.uniform(kk, (1, H, H, Cin), jnp.bfloat16))(key)
    w = jax.jit(lambda kk: (jax.random.normal(kk, (k, k, Cin, Cout), jnp.bfloat16) * 0.05))(key)
    pad = (k - 1) // 2

    def step(v):
        o = lax.conv_general_dilated(
            v, w, (1, 1), [(pad, k - 1 - pad)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16)
        return jax.nn.relu(o)

    f = jax.jit(lambda v: lax.scan(lambda c, _: (step(c), None), v, None,
                                   length=iters)[0])
    _ = np.asarray(jax.device_get(f(x))).ravel()[:1]
    ts = []
    for _ in range(8):
        t0 = time.perf_counter()
        o = f(x)
        _ = np.asarray(jax.device_get(o)).ravel()[:1]
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    for H, Cin, Cout, k in CASES:
        t = (time_stack(H, Cin, Cout, k, 4 * N)
             - time_stack(H, Cin, Cout, k, N)) / (3 * N)
        flops = 2 * k * k * Cin * Cout * H * H
        print(f"{H}px C={Cin} k={k}: {t*1e6:7.1f} us/conv  "
              f"{flops/t/1e12:5.1f} TF/s ({flops/t/197e12*100:4.1f}% MXU)")


if __name__ == "__main__":
    main()
