"""Does the mere PRESENCE of a pallas_call in a program change XLA's layout
choices for unrelated NHWC convs? Times 4 NHWC resblocks alone vs the same
resblocks + a fused Pallas resblock chain on an *independent* input."""

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

from deepinv_tpu.models import DRUNet
from deepinv_tpu.models.drunet_fold import _conv3_nhwc
from deepinv_tpu.ops.pallas.resblock_chain import fused_resblock_chain_folded

N = 32


def slope_time(step, *args):
    def run(iters):
        f = jax.jit(lambda v, *c: jax.lax.scan(
            lambda carry, _: (step(carry, *c), None), v, None,
            length=iters)[0])
        _ = np.asarray(jax.device_get(f(*args))).ravel()[:1]
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            o = f(*args)
            _ = np.asarray(jax.device_get(o)).ravel()[:1]
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (run(4 * N) - run(N)) / (3 * N)


def main():
    den = DRUNet(pretrained=None)
    up2 = list(den.m_up2[1:])
    blocks = list(den.m_up1[1:])
    w1s = jnp.stack([b.conv1.weight for b in blocks])
    w2s = jnp.stack([b.conv2.weight for b in blocks])
    relu = lambda t: jnp.maximum(t, 0)

    def nhwc_blocks(v):
        for blk in up2:
            v = v + _conv3_nhwc(relu(_conv3_nhwc(v, blk.conv1.weight)),
                                blk.conv2.weight)
        return v

    v1 = jax.random.normal(jax.random.key(0), (1, 128, 128, 128), jnp.bfloat16)
    u = jax.random.normal(jax.random.key(1), (1, 256, 128, 128), jnp.bfloat16)

    dt = slope_time(lambda v: v + jnp.mean(nhwc_blocks(v)).astype(v.dtype), v1)
    print(f"nhwc blocks alone           {dt*1e3:8.3f} ms")

    def with_pallas(v, u):
        a = jnp.mean(nhwc_blocks(v)).astype(v.dtype)
        b = jnp.mean(fused_resblock_chain_folded(
            u, w1s, w2s).astype(jnp.float32)).astype(v.dtype)
        return v + a + b

    dt = slope_time(with_pallas, v1, u)
    print(f"nhwc blocks + pallas (indep){dt*1e3:8.3f} ms")

    dt = slope_time(lambda uu: uu + jnp.mean(fused_resblock_chain_folded(
        uu, w1s, w2s).astype(jnp.float32)).astype(uu.dtype), u)
    print(f"pallas chain alone          {dt*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
