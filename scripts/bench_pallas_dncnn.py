"""Experiment: fused Pallas DnCNN middle-chain (18x conv3x3+ReLU, 64ch).

Motivation (scripts/profile_pgd.py): the mri/ct bench iterations are 100%
DnCNN-bound at ~42 TF/s (21% MFU) because C=64 convs map to K=64/N=64
matmuls — 1/4 of the 128x128 MXU. This kernel packs PIXEL PAIRS along the
lane dimension: each output row holds 2 adjacent pixels x 64ch = 128 lanes,
and the im2col window for a pair is 3x4x64 = 256 lanes split per-dy into
K=256 matmuls. 1.33x redundant FLOPs at ~full MXU utilization = ~148 TF/s
ceiling vs 49 for the naive mapping. All 18 layers run in one pallas_call
with both ping-pong activations resident in VMEM (~42 MB; v5e has ~100
usable) — zero HBM round-trips between layers.

Usage:
  python scripts/bench_pallas_dncnn.py check   # CPU interpret-mode numerics
  python scripts/bench_pallas_dncnn.py tpu     # numerics + slope timing
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "check" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
else:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L = 18          # fused layers
C = 64          # channels
CH = 32         # rows per in-kernel chunk


def pack_weights(ws):
    """(L,64,64,3,3) OIHW -> (L,3,2,128,128) pixel-pair packed matmuls.

    Group g holds cols (2g, 2g+1): lanes [a_g(64) | b_g(64)]. Output pixel 0
    (col 2g) sees window cols [b_{g-1}, a_g, b_g]; pixel 1 (col 2g+1) sees
    [a_g, b_g, a_{g+1}]. Per dy this splits into two K=128/N=128 matmuls:
    own = [a_g | b_g] @ W_mid and neighbor n = [b_{g-1} | a_{g+1}] @ W_side.
    """
    Lw = ws.shape[0]
    out = np.zeros((Lw, 3, 2, 128, 128), np.float32)
    wn = np.transpose(np.asarray(ws, np.float32), (0, 3, 4, 2, 1))  # L,dy,kx,ci,co
    out[:, :, 0, 0:64, 0:64] = wn[:, :, 1]      # a_g -> pix0 (kx=1)
    out[:, :, 0, 64:128, 0:64] = wn[:, :, 2]    # b_g -> pix0 (kx=2)
    out[:, :, 0, 0:64, 64:128] = wn[:, :, 0]    # a_g -> pix1 (kx=0)
    out[:, :, 0, 64:128, 64:128] = wn[:, :, 1]  # b_g -> pix1 (kx=1)
    out[:, :, 1, 0:64, 0:64] = wn[:, :, 0]      # b_{g-1} -> pix0 (kx=0)
    out[:, :, 1, 64:128, 64:128] = wn[:, :, 2]  # a_{g+1} -> pix1 (kx=2)
    return jnp.asarray(out, jnp.bfloat16)


def _rot64(v):
    """Rotate bf16 lanes by 64 (half-register swap). Mosaic's rotate only
    supports 32-bit data, so bitcast to int32 (sublane-pair packing — lane
    indexing is unchanged) and rotate there."""
    return pltpu.bitcast(
        pltpu.roll(pltpu.bitcast(v, jnp.int32), 64, axis=2), jnp.bfloat16)


def _dot(a, w):
    return lax.dot_general(a, w, (((2,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)


def _layer(src, dst, wl, bias, H, G):
    """One conv3x3+relu layer on guard-padded activations: src has zero
    guard row 0/H+1 and zero guard group 0/G+1, so neighbor access is a
    static offset slice — no rolls along the group dim, no boundary masks."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (CH, G, 128), 2)
    for c in range(H // CH):
        r0 = c * CH
        acc = jnp.zeros((CH, G, 128), jnp.float32)
        for dy in range(3):
            xa = src[r0 + dy:r0 + dy + CH]          # (CH, G+2, 128)
            own = xa[:, 1:G + 1]
            # n_g = [b_{g-1} | a_{g+1}]
            n = jnp.where(lane < 64, _rot64(xa[:, 0:G]),
                          _rot64(xa[:, 2:G + 2]))
            acc = acc + _dot(own, wl[dy, 0]) + _dot(n, wl[dy, 1])
        y = jnp.maximum(acc + bias, 0.0).astype(jnp.bfloat16)
        dst[1 + r0:1 + r0 + CH, 1:G + 1] = y


def _chain_kernel(x_ref, w_ref, b_ref, o_ref, a_ref, c_ref):
    H, G = o_ref.shape[0], o_ref.shape[1]
    a_ref[:] = x_ref[:]
    c_ref[:] = jnp.zeros((H + 2, G + 2, 128), jnp.bfloat16)

    def pair(p, _):
        l0 = 2 * p
        _layer(a_ref, c_ref, w_ref[l0], b_ref[pl.ds(l0, 1)][:, None, :],
               H, G)
        _layer(c_ref, a_ref, w_ref[l0 + 1],
               b_ref[pl.ds(l0 + 1, 1)][:, None, :], H, G)
        return 0

    lax.fori_loop(0, L // 2, pair, 0)
    o_ref[:] = a_ref[1:H + 1, 1:G + 1]


def fused_chain(xp, wp, bp, *, interpret=False):
    """xp: (H+2, G+2, 128) bf16 guard-padded packed activations."""
    Hp, Gp, _ = xp.shape
    H, G = Hp - 2, Gp - 2
    return pl.pallas_call(
        _chain_kernel,
        out_shape=jax.ShapeDtypeStruct((H, G, 128), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((Hp, Gp, 128), jnp.bfloat16),
                        pltpu.VMEM((Hp, Gp, 128), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, wp, bp)


def pack_x(h):
    """(1,64,H,W) -> guard-padded packed (H+2, W//2+2, 128)."""
    _, _, H, W = h.shape
    xp = jnp.transpose(h[0], (1, 2, 0)).reshape(H, W // 2, 128)
    return jnp.pad(xp, ((1, 1), (1, 1), (0, 0)))


def unpack_x(o, Hh, W):
    return jnp.transpose(o.reshape(Hh, W, 64), (2, 0, 1))[None]


def ref_chain(h, ws, bs):
    for l in range(ws.shape[0]):
        h = lax.conv_general_dilated(
            h, ws[l].astype(h.dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.float32)
        h = jnp.maximum(h + bs[l].astype(jnp.float32)[None, :, None, None],
                        0.0).astype(h.dtype)
    return h


def main():
    H = W = 256
    rng = np.random.default_rng(0)
    ws = jnp.asarray(rng.normal(0, 0.08, (L, C, C, 3, 3)), jnp.float32)
    bs = jnp.asarray(rng.normal(0, 0.02, (L, C)), jnp.float32)
    h = jnp.asarray(rng.normal(0, 1, (1, C, H, W)), jnp.bfloat16)

    wp = pack_weights(ws)
    bp = jnp.concatenate([bs, bs], axis=1)          # (L,128): 2 pixels x 64ch

    interp = "check" in sys.argv

    @jax.jit
    def run_fused(hh, wpp, bpp):
        return unpack_x(fused_chain(pack_x(hh), wpp, bpp,
                                    interpret=interp), H, W)

    @jax.jit
    def run_ref(hh, wss, bss):
        return ref_chain(hh, wss, bss)

    got = np.asarray(run_fused(h, wp, bp), np.float32)
    want = np.asarray(run_ref(h, ws, bs), np.float32)
    err = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-9)
    print(f"max rel err vs lax reference: {err:.3e}")
    assert err < 5e-2, "numerics mismatch"

    if interp:
        print("interpret-mode check OK")
        return

    def slope(f, *a):
        def run(n):
            g = jax.jit(lambda v, *c: lax.scan(
                lambda carry, _: (f(carry, *c), None), v, None, length=n)[0])
            _ = np.asarray(g(h, *a)).ravel()[:1]
            ts = []
            for _ in range(8):
                t0 = time.perf_counter()
                o = g(h, *a)
                _ = np.asarray(o).ravel()[:1]
                ts.append(time.perf_counter() - t0)
            return min(ts)
        return (run(512) - run(128)) / 384

    flops = 2 * L * H * W * C * C * 9
    dt_ref = slope(lambda v, a, b: run_ref(v, a, b).astype(jnp.bfloat16),
                   ws, bs)
    dt_fus = slope(lambda v, a, b: run_fused(v, a, b), wp, bp)
    print(f"lax conv chain : {dt_ref*1e3:7.3f} ms  {flops/dt_ref/1e12:6.1f} TF/s")
    print(f"pallas fused   : {dt_fus*1e3:7.3f} ms  {flops/dt_fus/1e12:6.1f} TF/s"
          f"   ({dt_ref/dt_fus:.2f}x)")


if __name__ == "__main__":
    main()
