"""Bisect the fused-DRUNet integration regression: time the full folded
forward with the Pallas resblock chain enabled on neither / down-only /
up-only / both scale-0 chains."""

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

from deepinv_tpu.models import DRUNet, autocast

N = 32


def slope_time(step, x0):
    def run(iters):
        f = jax.jit(lambda v: jax.lax.scan(
            lambda carry, _: (step(carry), None), v, None, length=iters)[0])
        _ = np.asarray(jax.device_get(f(x0))).ravel()[:1]
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            o = f(x0)
            _ = np.asarray(jax.device_get(o)).ravel()[:1]
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (run(4 * N) - run(N)) / (3 * N)


def main():
    den = DRUNet(pretrained=None)
    net = autocast(den)
    x = jax.random.uniform(jax.random.key(1), (1, 3, 256, 256))
    modes = os.environ.get("BISECT_MODES", "0,down,up,1,sandwich").split(",")
    for mode in modes:
        os.environ["DEEPINV_TPU_FUSED_DRUNET"] = mode
        dt = slope_time(lambda v: net(v, 0.02), x)
        print(f"mode={mode:8s}  {dt*1e3:8.3f} ms/forward", flush=True)


if __name__ == "__main__":
    main()
