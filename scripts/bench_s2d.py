"""Candidates for an exact space-to-depth rewrite of DRUNet scale-0 convs.

1. baseline: 3x3 C64->C64 @256^2 (what DRUNet does today, ~147us, 16x/fwd)
2. orig->s2d: 4x4 stride-2 C64->C256 @256^2->128^2 (phase-stacked output;
   exact with 9/16-dense kernels)
3. s2d->s2d: 3x3 C256->C256 @128^2 (block-space conv; exact with 4/9-dense)
4. (2) followed by depth-to-space back to 256^2 C64 (measures d2s cost)

Usage: python scripts/bench_s2d.py
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


def timeit(step, x, n):
    f = jax.jit(lambda v, k=n: lax.scan(lambda c, _: (step(c), None), v,
                                        None, length=k)[0])
    _ = np.asarray(jax.device_get(f(x))).ravel()[:1]
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        o = f(x)
        _ = np.asarray(jax.device_get(o)).ravel()[:1]
        ts.append(time.perf_counter() - t0)
    return min(ts)


def slope(step, x, n):
    return (timeit(step, x, 4 * n) - timeit(step, x, n)) / (3 * n)


def main():
    key = jax.random.key(0)
    x64 = jax.jit(lambda k: jax.random.uniform(k, (1, 256, 256, 64),
                                               jnp.bfloat16))(key)
    x256 = jax.jit(lambda k: jax.random.uniform(k, (1, 128, 128, 256),
                                                jnp.bfloat16))(key)
    w33 = jax.jit(lambda k: jax.random.normal(k, (3, 3, 64, 64),
                                              jnp.bfloat16) * 0.05)(key)
    w44 = jax.jit(lambda k: jax.random.normal(k, (4, 4, 64, 256),
                                              jnp.bfloat16) * 0.05)(key)
    w33b = jax.jit(lambda k: jax.random.normal(k, (3, 3, 256, 256),
                                               jnp.bfloat16) * 0.02)(key)
    wback = jax.jit(lambda k: jax.random.normal(k, (4, 4, 64, 256),
                                                jnp.bfloat16) * 0.05)(key)

    def base(v):
        o = lax.conv_general_dilated(v, w33, (1, 1), [(1, 1), (1, 1)],
                                     dimension_numbers=("NHWC", "HWIO", "NHWC"),
                                     preferred_element_type=jnp.bfloat16)
        return jax.nn.relu(o)

    def to_s2d(v):  # 256^2x64 -> 128^2x256
        return lax.conv_general_dilated(v, w44, (2, 2), [(1, 1), (1, 1)],
                                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                                        preferred_element_type=jnp.bfloat16)

    def d2s(v):  # 128^2x256 -> 256^2x64
        B, H, W, C = v.shape
        v = v.reshape(B, H, W, 2, 2, 64)
        v = jnp.transpose(v, (0, 1, 3, 2, 4, 5))
        return v.reshape(B, H * 2, W * 2, 64)

    def s2d_chain(v):  # keeps 256^2x64 shape: conv->s2d-out->d2s->relu
        return jax.nn.relu(d2s(to_s2d(v)))

    def blockconv(v):  # s2d -> s2d 3x3
        o = lax.conv_general_dilated(v, w33b, (1, 1), [(1, 1), (1, 1)],
                                     dimension_numbers=("NHWC", "HWIO", "NHWC"),
                                     preferred_element_type=jnp.bfloat16)
        return jax.nn.relu(o)

    n = 512
    t = slope(base, x64, n)
    print(f"1. baseline 3x3 C64 @256^2:        {t*1e6:7.1f} us  "
          f"({4.83e9/t/1e12:5.1f} TF/s)")
    t = slope(s2d_chain, x64, n)
    print(f"2. 4x4s2 C64->C256 (+d2s, exact):  {t*1e6:7.1f} us  "
          f"({8.59e9/t/1e12:5.1f} TF/s raw)")
    t = slope(blockconv, x256, max(64, n // 4))
    print(f"3. 3x3 block-space C256 @128^2:    {t*1e6:7.1f} us  "
          f"({19.3e9/t/1e12:5.1f} TF/s raw)")


if __name__ == "__main__":
    main()
