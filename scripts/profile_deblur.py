"""Per-phase profile of the flagship deblur (PnP-HQS DRUNet) iteration.

Decomposes one HQS iteration into its phases and slope-times each as its own
lax.scan program on the attached TPU, so we know where the non-MXU time goes
(VERDICT r2 weak #1). Prints a table + XLA cost analysis (FLOPs, bytes).

Usage: python scripts/profile_deblur.py [--dtype bf16|f32]
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

from deepinv_tpu.physics import BlurFFT, GaussianNoise
from deepinv_tpu.ops import gaussian_blur
from deepinv_tpu.models import DRUNet, autocast
from deepinv_tpu.utils.profiling import compiled_cost

DTYPE = "f32" if "--dtype" in sys.argv and "f32" in sys.argv else "bf16"
N = 16


def slope_time(step, x0, *ctx):
    """Marginal seconds/iter of `step` via scan-length slope (N vs 4N).

    ``ctx`` (physics, y, ...) is passed as jit arguments — captured complex
    arrays fail constant-embedding on the axon backend.
    """

    def run(iters):
        f = jax.jit(lambda v, *c: jax.lax.scan(
            lambda carry, _: (step(carry, *c), None), v, None,
            length=iters)[0])
        _ = np.asarray(jax.device_get(f(x0, *ctx))).ravel()[:1]
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            o = f(x0, *ctx)
            _ = np.asarray(jax.device_get(o)).ravel()[:1]
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (run(4 * N) - run(N)) / (3 * N)


def main():
    shape = (1, 3, 256, 256)
    key = jax.random.key(0)
    x = jax.jit(lambda k: jax.random.uniform(k, shape))(key)
    physics = BlurFFT(img_size=shape[1:], filter=gaussian_blur(sigma=1.5),
                      noise_model=GaussianNoise(0.01))
    y = jax.jit(lambda p, v, k: p(v, key=k))(physics, x, jax.random.key(1))
    den = DRUNet(pretrained=None)
    if DTYPE == "bf16":
        den = autocast(den)

    sigma = 0.02
    gamma = 2.0

    phases = {
        "denoiser (DRUNet fwd)": lambda v, p, yy: den(v, sigma),
        "prox_l2 (FFT closed form)": lambda v, p, yy: p.prox_l2(v, yy, gamma),
        "full HQS iter": lambda v, p, yy: den(p.prox_l2(v, yy, gamma), sigma),
    }

    print(f"dtype={DTYPE}  shape={shape}")
    rows = {}
    for name, fn in phases.items():
        dt = slope_time(fn, x, physics, y)
        rows[name] = dt
        print(f"{name:32s} {dt*1e3:8.3f} ms/iter  ({1/dt:8.1f} it/s)")

    c = compiled_cost(lambda v: den(v, sigma), x)
    print(f"\nDRUNet XLA cost: {c.get('flops', 0)/1e9:.1f} GF, "
          f"{c.get('bytes accessed', 0)/1e6:.0f} MB accessed")
    cfull = compiled_cost(
        lambda v, p, yy: den(p.prox_l2(v, yy, gamma), sigma), x, physics, y)
    print(f"full iter XLA cost: {cfull.get('flops', 0)/1e9:.1f} GF, "
          f"{cfull.get('bytes accessed', 0)/1e6:.0f} MB accessed")
    dt = rows["full HQS iter"]
    print(f"implied sustained: {cfull.get('flops', 0)/dt/1e12:.1f} TF/s")


if __name__ == "__main__":
    main()
