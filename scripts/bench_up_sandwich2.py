"""Extended drill-down: scale1-up NHWC resblocks -> up_to_fold -> scale0-up
chain -> tail, XLA vs Pallas chain — looking for the graph interaction that
makes the fused up-chain +1.1 ms in the full forward but 4.7x faster in
isolation. Also checks numerical parity of the full fused forward."""

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
from deepinv_tpu.models.drunet_fold import (_conv3_folded, _conv3_nhwc,
                                            _up_to_fold)
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
    blocks = list(den.m_up1[1:])
    w1s = jnp.stack([b.conv1.weight for b in blocks])
    w2s = jnp.stack([b.conv2.weight for b in blocks])
    w_up0 = den.m_up1[0].weight
    w_tail = den.m_tail.weight
    up2 = list(den.m_up2)  # [0] transpose conv 256->128, [1:] resblocks

    relu = lambda t: jnp.maximum(t, 0)

    def xla_chain(v):
        for r in range(w1s.shape[0]):
            v = v + _conv3_folded(relu(_conv3_folded(v, w1s[r])), w2s[r])
        return v

    def pallas_chain(v):
        return fused_resblock_chain_folded(v, w1s, w2s)

    # inputs: scale1 pre-chain activations + scale-0/1 skips
    v1 = jax.random.normal(jax.random.key(0), (1, 128, 128, 128), jnp.bfloat16)
    x1 = jax.random.normal(jax.random.key(1), (1, 256, 128, 128), jnp.bfloat16)

    def extended(chain):
        def step(v1, x1):
            v = v1
            for blk in up2[1:]:
                v = v + _conv3_nhwc(relu(_conv3_nhwc(v, blk.conv1.weight)),
                                    blk.conv2.weight)
            v = _up_to_fold(v, w_up0)
            v = chain(v)
            o = _conv3_folded(v + x1, w_tail)
            return v1 + jnp.mean(o).astype(v1.dtype)
        return step

    dt_x = slope_time(extended(xla_chain), v1, x1)
    print(f"extended sandwich XLA     {dt_x*1e3:8.3f} ms")
    dt_p = slope_time(extended(pallas_chain), v1, x1)
    print(f"extended sandwich Pallas  {dt_p*1e3:8.3f} ms  ({dt_x/dt_p:.2f}x)")

    # full-forward numerical parity fused vs unfused (bf16 tolerance)
    net = autocast(den)
    x = jax.random.uniform(jax.random.key(2), (1, 3, 256, 256))
    os.environ["DEEPINV_TPU_FUSED_DRUNET"] = "0"
    ref = np.asarray(jax.jit(lambda v: net(v, 0.02))(x), np.float32)
    os.environ["DEEPINV_TPU_FUSED_DRUNET"] = "1"
    out = np.asarray(jax.jit(lambda v: net(v, 0.05 * 0 + 0.02))(x), np.float32)
    err = np.max(np.abs(out - ref))
    print(f"full forward fused-vs-unfused max abs err: {err:.3e}")


if __name__ == "__main__":
    main()
