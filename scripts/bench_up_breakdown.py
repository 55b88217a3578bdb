"""Drill into the fused up-chain regression + parity on real TPU.

1. parity of the Mosaic resblock kernel vs the f32 XLA chain at the real
   shape (1, 256, 128, 128) — interpret-mode tests only covered 16x8;
2. times: the up_to_fold producer alone, the Pallas chain on a precomputed
   input, producer->chain, producer->barrier->chain — locating the +1.6 ms
   the sandwich shows when the producer feeds the pallas_call.
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

from deepinv_tpu.models import DRUNet
from deepinv_tpu.models.drunet_fold import _up_to_fold
from deepinv_tpu.ops.pallas.resblock_chain import (_lax_resblocks_f32,
                                                   fused_resblock_chain_folded)

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

    # ---- 1. Mosaic parity at the real shape --------------------------------
    vf = jax.random.normal(jax.random.key(0), (1, 256, 128, 128),
                           jnp.bfloat16) * 0.5
    got = jax.jit(lambda v: fused_resblock_chain_folded(v, w1s, w2s))(vf)
    want = jax.jit(_lax_resblocks_f32)(vf, w1s, w2s)
    g = np.asarray(got, np.float32)
    w = np.asarray(want, np.float32)
    scale = np.abs(w).max()
    print(f"parity @256x128: maxerr {np.abs(g - w).max():.4e} "
          f"(scale {scale:.3f}, rel {np.abs(g - w).max() / scale:.4e})")

    # ---- 2. boundary timing variants ---------------------------------------
    v1 = jax.random.normal(jax.random.key(1), (1, 128, 128, 128),
                           jnp.bfloat16)
    red = lambda o: jnp.mean(o.astype(jnp.float32))

    def t(name, fn, *args):
        dt = slope_time(fn, *args)
        print(f"{name:42s} {dt*1e3:8.3f} ms")
        return dt

    t("up_to_fold alone", lambda v: v + red(
        _up_to_fold(v, w_up0)).astype(v.dtype), v1)

    t("chain alone (precomputed input)", lambda u: u + red(
        fused_resblock_chain_folded(u, w1s, w2s)).astype(u.dtype), vf)

    t("up_to_fold -> chain", lambda v: v + red(
        fused_resblock_chain_folded(_up_to_fold(v, w_up0), w1s, w2s)
    ).astype(v.dtype), v1)

    t("up_to_fold -> barrier -> chain", lambda v: v + red(
        fused_resblock_chain_folded(
            jax.lax.optimization_barrier(_up_to_fold(v, w_up0)),
            w1s, w2s)).astype(v.dtype), v1)

    def xla_chain(u):
        from deepinv_tpu.models.drunet_fold import _conv3_folded
        for r in range(w1s.shape[0]):
            u = u + _conv3_folded(
                jnp.maximum(_conv3_folded(u, w1s[r]), 0), w2s[r])
        return u

    t("up_to_fold -> XLA chain", lambda v: v + red(
        xla_chain(_up_to_fold(v, w_up0))).astype(v.dtype), v1)




def main2():
    """Incremental sandwich: find which addition triggers the cliff."""
    den = DRUNet(pretrained=None)
    blocks = list(den.m_up1[1:])
    w1s = jnp.stack([b.conv1.weight for b in blocks])
    w2s = jnp.stack([b.conv2.weight for b in blocks])
    w_up0 = den.m_up1[0].weight
    w_tail = den.m_tail.weight
    up2 = list(den.m_up2)

    from deepinv_tpu.models.drunet_fold import _conv3_folded, _conv3_nhwc

    relu = lambda t: jnp.maximum(t, 0)
    v1 = jax.random.normal(jax.random.key(1), (1, 128, 128, 128),
                           jnp.bfloat16)
    x1 = jax.random.normal(jax.random.key(2), (1, 256, 128, 128),
                           jnp.bfloat16)
    red = lambda o: jnp.mean(o.astype(jnp.float32))

    def rbs(v):
        for blk in up2[1:]:
            v = v + _conv3_nhwc(relu(_conv3_nhwc(v, blk.conv1.weight)),
                                blk.conv2.weight)
        return v

    def t(name, fn, *args):
        dt = slope_time(fn, *args)
        print(f"{name:46s} {dt*1e3:8.3f} ms")

    chain = lambda u: fused_resblock_chain_folded(u, w1s, w2s)

    t("A rbs -> up_to_fold -> chain", lambda v: v + red(
        chain(_up_to_fold(rbs(v), w_up0))).astype(v.dtype), v1)

    t("B up_to_fold -> chain -> tail(+x1)", lambda v, xx: v + red(
        _conv3_folded(chain(_up_to_fold(v, w_up0)) + xx, w_tail)
    ).astype(v.dtype), v1, x1)

    t("C rbs -> up_to_fold -> chain -> tail(+x1)", lambda v, xx: v + red(
        _conv3_folded(chain(_up_to_fold(rbs(v), w_up0)) + xx, w_tail)
    ).astype(v.dtype), v1, x1)

    t("C' same but XLA chain", lambda v, xx: v + red(
        _conv3_folded((lambda u: [u := u + _conv3_folded(
            relu(_conv3_folded(u, w1s[r])), w2s[r]) for r in range(4)][-1])(
            _up_to_fold(rbs(v), w_up0)) + xx, w_tail)
    ).astype(v.dtype), v1, x1)


if __name__ == "__main__":
    import sys as _s
    main2() if "--inc" in _s.argv else main()
