"""Isolated bench: scale-0 resblock chain — XLA folded convs vs the Pallas
VMEM-resident fused kernel (ops/pallas/resblock_chain.py), plus the full
folded DRUNet forward both ways. Slope-timed (marginal cost per iteration
between N and 4N scan programs; tunnel dispatch jitter cancels)."""

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
from deepinv_tpu.models.drunet_fold import _conv3_folded
from deepinv_tpu.ops.pallas.resblock_chain import fused_resblock_chain_folded

N = 32


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
    blocks = list(den.m_down1[:-1])
    R = len(blocks)
    w1s = jnp.stack([b.conv1.weight for b in blocks])
    w2s = jnp.stack([b.conv2.weight for b in blocks])

    H, G = 256, 128
    vf = jax.random.normal(jax.random.key(0), (1, H, G, 128), jnp.bfloat16)

    def xla_chain(v, w1s, w2s):
        for r in range(R):
            t = jnp.maximum(_conv3_folded(v, w1s[r]), 0)
            v = v + _conv3_folded(t, w2s[r])
        return v

    def pallas_chain(v, w1s, w2s):
        return fused_resblock_chain_folded(v, w1s, w2s)

    dt_x = slope_time(xla_chain, vf, w1s, w2s)
    print(f"xla folded chain ({R} rb)    {dt_x*1e3:8.3f} ms")
    dt_p = slope_time(pallas_chain, vf, w1s, w2s)
    print(f"pallas fused chain ({R} rb)  {dt_p*1e3:8.3f} ms  ({dt_x/dt_p:.2f}x)")

    # useful GF: R * 2 convs * 2*H*(2G)*64*64*9
    gf = R * 2 * 2 * H * 2 * G * 64 * 64 * 9 / 1e9
    print(f"useful {gf:.1f} GF -> xla {gf/dt_x/1e3:.0f} (x2 issued) "
          f"pallas {gf/dt_p/1e3:.0f} (x1.33 issued) GF/s useful")

    # full forward, both ways
    x = jax.random.uniform(jax.random.key(1), (1, 3, 256, 256))
    net = autocast(den)
    os.environ["DEEPINV_TPU_FUSED_DRUNET"] = "0"
    dt_u = slope_time(lambda v: net(v, 0.02), x)
    print(f"full forward unfused        {dt_u*1e3:8.3f} ms")
    os.environ["DEEPINV_TPU_FUSED_DRUNET"] = "1"
    dt_f = slope_time(lambda v: net(v, 0.02), x)
    print(f"full forward fused          {dt_f*1e3:8.3f} ms  ({dt_u/dt_f:.2f}x)")


if __name__ == "__main__":
    main()
