"""Per-stage profile of the (folded) DRUNet forward on the attached TPU.

Times the full forward vs a variant with the scale-0 resblocks removed, and
each scale's resblock chain in isolation, to size the win available from a
Pallas VMEM-resident fused resblock chain (VERDICT r3 next-step #1).
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

from deepinv_tpu.models import DRUNet, autocast
from deepinv_tpu.models.drunet import _ACTS

N = 16


def slope_time(step, x0, *ctx):
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
    den = DRUNet(pretrained=None)
    act = _ACTS["R"]
    net = autocast(den)

    x = jax.random.uniform(jax.random.key(0), (1, 3, 256, 256))

    dt_full = slope_time(lambda v: net(v, 0.02), x)
    print(f"full forward          {dt_full*1e3:8.3f} ms")

    # isolated per-scale resblock chains (bf16, plain NCHW)
    import functools

    def chain(blocks, v):
        for blk in blocks:
            v = v + blk.conv2(act(blk.conv1(v)))
        return v

    stages = {
        "scale0 down (4rb 64ch@256^2)": (den.m_down1[:-1], (1, 64, 256, 256)),
        "scale0 up   (4rb 64ch@256^2)": (den.m_up1[1:], (1, 64, 256, 256)),
        "scale1 down (4rb 128ch@128^2)": (den.m_down2[:-1], (1, 128, 128, 128)),
        "scale1 up   (4rb 128ch@128^2)": (den.m_up2[1:], (1, 128, 128, 128)),
        "scale2 down (4rb 256ch@64^2)": (den.m_down3[:-1], (1, 256, 64, 64)),
        "scale3 body (4rb 512ch@32^2)": (den.m_body, (1, 512, 32, 32)),
    }
    tot = 0.0
    for name, (blocks, shape) in stages.items():
        v = jax.random.normal(jax.random.key(1), shape, jnp.bfloat16)
        dt = slope_time(functools.partial(chain, list(blocks)), v)
        tot += dt
        print(f"{name:32s} {dt*1e3:8.3f} ms")
    print(f"sum of isolated chains (scale2-up not counted): {tot*1e3:.3f} ms")


if __name__ == "__main__":
    main()
