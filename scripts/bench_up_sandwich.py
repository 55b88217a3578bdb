"""Drill-down: the scale-0 UP chain in its graph context.

Times `up_to_fold -> resblock chain -> +skip -> tail conv` with the chain as
(a) XLA folded convs, (b) the Pallas fused kernel — to localize the +1.1 ms
regression the fused up-chain causes in the full DRUNet forward."""

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
from deepinv_tpu.models.drunet_fold import (_conv3_folded, _up_to_fold)
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
    w_up = den.m_up1[0].weight
    w_tail = den.m_tail.weight

    relu = lambda t: jnp.maximum(t, 0)

    def xla_chain(v):
        for r in range(w1s.shape[0]):
            v = v + _conv3_folded(relu(_conv3_folded(v, w1s[r])), w2s[r])
        return v

    def pallas_chain(v):
        return fused_resblock_chain_folded(v, w1s, w2s)

    # inputs: scale1 activations + the scale0 skip x1
    v128 = jax.random.normal(jax.random.key(0), (1, 128, 128, 128), jnp.bfloat16)
    x1 = jax.random.normal(jax.random.key(1), (1, 256, 128, 128), jnp.bfloat16)

    def sandwich(chain):
        def f(v128, x1):
            v = _up_to_fold(v128, w_up)
            v = chain(v)
            return _conv3_folded(v + x1, w_tail)
        return f

    # carry must match input shape for the scan: wrap so output reduces back
    def scanable(chain):
        f = sandwich(chain)
        def step(v128, x1):
            o = f(v128, x1)  # (1, 256, 128, 8ch out) -> reduce to v128 shape
            return v128 + jnp.mean(o).astype(v128.dtype)
        return step

    dt_x = slope_time(scanable(xla_chain), v128, x1)
    print(f"up sandwich XLA     {dt_x*1e3:8.3f} ms")
    dt_p = slope_time(scanable(pallas_chain), v128, x1)
    print(f"up sandwich Pallas  {dt_p*1e3:8.3f} ms  ({dt_x/dt_p:.2f}x)")

    # chain alone on the same folded input (sanity, matches bench_resblock)
    vf = jax.random.normal(jax.random.key(2), (1, 256, 128, 128), jnp.bfloat16)
    dt_cx = slope_time(lambda v: v + jnp.mean(xla_chain(v)).astype(v.dtype), vf)
    dt_cp = slope_time(lambda v: v + jnp.mean(pallas_chain(v)).astype(v.dtype), vf)
    print(f"chain alone XLA     {dt_cx*1e3:8.3f} ms")
    print(f"chain alone Pallas  {dt_cp*1e3:8.3f} ms  ({dt_cx/dt_cp:.2f}x)")


if __name__ == "__main__":
    main()
