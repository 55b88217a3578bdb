"""A/B DRUNet forward variants (layout x accum policy) on the attached TPU.

Usage: python scripts/bench_conv_variants.py [nchw|nhwc] [native|f32]
Runs ONE variant per process (flags must be set before the model is traced,
and the compile cache keys on the HLO so separate processes are cleanest).
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

import numpy as np

from deepinv_tpu.models import layers

layers.CONV_LAYOUT = sys.argv[1] if len(sys.argv) > 1 else "nchw"
layers.CONV_ACCUM = sys.argv[2] if len(sys.argv) > 2 else "native"

from deepinv_tpu.models import DRUNet, autocast
from deepinv_tpu.utils.profiling import compiled_cost

N = 16


def main():
    x = jax.jit(lambda k: jax.random.uniform(k, (1, 3, 256, 256)))(
        jax.random.key(0))
    den = autocast(DRUNet(pretrained=None))

    def run(iters):
        f = jax.jit(lambda v: jax.lax.scan(
            lambda c, _: (den(c, 0.02), None), v, None, length=iters)[0])
        _ = np.asarray(jax.device_get(f(x))).ravel()[:1]
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            o = f(x)
            _ = np.asarray(jax.device_get(o)).ravel()[:1]
            ts.append(time.perf_counter() - t0)
        return min(ts)

    dt = (run(4 * N) - run(N)) / (3 * N)
    c = compiled_cost(lambda v: den(v, 0.02), x)
    print(f"layout={layers.CONV_LAYOUT} accum={layers.CONV_ACCUM}: "
          f"{dt*1e3:.3f} ms ({1/dt:.1f} it/s), "
          f"{c.get('flops', 0)/1e9:.1f} GF, "
          f"{c.get('bytes accessed', 0)/1e6:.0f} MB")


if __name__ == "__main__":
    main()
