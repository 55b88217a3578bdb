"""Round 2 of s2d candidates, noise-robust (large n, run alone).

A. W-fold: (256,128) C=128 k=3x3  (exact 1-D fold, 2x FLOPs, full lanes)
B. 2D-fold: 128^2 C=256 k=3x3     (exact 2-D fold, 4x FLOPs)
C. phase pair: 2x [128^2 C256->C128 k=2x3] (exact, 2.67x FLOPs)
D. baseline re-measure: 256^2 C=64 k=3

Usage: python scripts/bench_s2d2.py
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


def conv(v, w, pad, stride=(1, 1)):
    return lax.conv_general_dilated(
        v, w, stride, pad, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16)


def slope(step, x, n):
    def run(k):
        f = jax.jit(lambda v: lax.scan(lambda c, _: (step(c), None), v,
                                       None, length=k)[0])
        _ = np.asarray(jax.device_get(f(x))).ravel()[:1]
        ts = []
        for _ in range(10):
            t0 = time.perf_counter()
            o = f(x)
            _ = np.asarray(jax.device_get(o)).ravel()[:1]
            ts.append(time.perf_counter() - t0)
        return min(ts)
    return (run(4 * n) - run(n)) / (3 * n)


def main():
    key = jax.random.key(0)
    mk = lambda shape, scale=0.05: jax.jit(
        lambda k: jax.random.normal(k, shape, jnp.bfloat16) * scale)(key)

    # D baseline
    x = jax.jit(lambda k: jax.random.uniform(k, (1, 256, 256, 64),
                                             jnp.bfloat16))(key)
    w = mk((3, 3, 64, 64))
    t = slope(lambda v: jax.nn.relu(conv(v, w, [(1, 1), (1, 1)])), x, 768)
    print(f"D baseline 256^2 C64 k3:     {t*1e6:7.1f} us ({4.83e9/t/1e12:5.1f} TF/s)", flush=True)

    # A W-fold
    xa = jax.jit(lambda k: jax.random.uniform(k, (1, 256, 128, 128),
                                              jnp.bfloat16))(key)
    wa = mk((3, 3, 128, 128))
    t = slope(lambda v: jax.nn.relu(conv(v, wa, [(1, 1), (1, 1)])), xa, 512)
    print(f"A W-fold (256,128) C128 k3:  {t*1e6:7.1f} us ({9.66e9/t/1e12:5.1f} TF/s raw, eq {4.83e9/t/1e12:.1f})", flush=True)

    # B 2D-fold
    xb = jax.jit(lambda k: jax.random.uniform(k, (1, 128, 128, 256),
                                              jnp.bfloat16))(key)
    wb = mk((3, 3, 256, 256), 0.02)
    t = slope(lambda v: jax.nn.relu(conv(v, wb, [(1, 1), (1, 1)])), xb, 384)
    print(f"B 2D-fold 128^2 C256 k3:     {t*1e6:7.1f} us ({19.3e9/t/1e12:5.1f} TF/s raw)", flush=True)

    # C phase pair
    wc1 = mk((2, 3, 256, 128), 0.02)
    wc2 = mk((2, 3, 256, 128), 0.02)

    def pair(v):
        o1 = conv(v, wc1, [(1, 0), (1, 1)])
        o2 = conv(v, wc2, [(0, 1), (1, 1)])
        return jax.nn.relu(jnp.concatenate([o1, o2], axis=-1))

    t = slope(pair, xb, 384)
    print(f"C phase-pair 2x k=2x3:       {t*1e6:7.1f} us ({12.9e9/t/1e12:5.1f} TF/s raw)", flush=True)


if __name__ == "__main__":
    main()
