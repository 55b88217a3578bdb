"""Pallas TPU kernel: fused chain of residual blocks at 64 channels.

DRUNet's scale-0 stages (4 resblocks of ``h + conv2(relu(conv1(h)))`` at
C=64, full resolution — reference deepinv/models/drunet.py:200-210,310) are
~2.0 ms of the 2.9 ms flagship forward on a v5e at 1x3x256x256
(scripts/profile_drunet_stages.py): XLA runs the C=64 convs at 1/4 MXU
utilization and round-trips every activation through HBM.

This reuses :mod:`.conv_chain`'s pixel-pair lane packing — which is exactly
the W-fold layout ``f = q*64 + c`` that :mod:`...models.drunet_fold` already
keeps scale-0 activations in, so the kernel slots into the folded forward
with no extra layout traffic — and its VMEM-resident ping-pong buffers, with
two per-block layers:

- layer 1: packed 3x3 conv + ReLU,  ``a -> c``
- layer 2: packed 3x3 conv + residual add of ``a``'s interior, written back
  into ``a`` (single f32 accumulate, one bf16 rounding per conv, matching
  the ``CONV_ACCUM='native'`` policy of the XLA path).

Backward: ``jax.custom_vjp`` re-running the pure-XLA chain in f32 under
autodiff (rematerialized), like :func:`.conv_chain.fused_conv3x3_relu_chain`.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .conv_chain import (C, _chunk_rows, _dot, _layer, _pack_weights,
                         fused_disabled)

__all__ = ["fused_resblock_chain_folded", "can_fuse_resblocks",
           "fused_up_resblock_chain_folded", "can_fuse_up_resblocks",
           "fused_up_sandwich_folded", "can_fuse_sandwich"]


def _resblock_kernel(x_ref, w1_ref, w2_ref, o_ref, a_ref, c_ref, *,
                     n_blocks, ch):
    # input arrives guard-padded: measured faster than padding in-kernel
    # (in-kernel interior writes cost more than XLA's fused pad producer —
    # scripts/bench_fused_bisect.py, 2.72 vs 2.94 ms down-chain)
    H, G = o_ref.shape[0], o_ref.shape[1]
    a_ref[:] = x_ref[:]
    c_ref[:] = jnp.zeros(c_ref.shape, jnp.bfloat16)

    def blk(r, _):
        _layer(a_ref, c_ref, w1_ref[r], None, H, G, ch, relu=True)
        _layer(c_ref, a_ref, w2_ref[r], None, H, G, ch,
               relu=False, residual=True)
        return 0

    lax.fori_loop(0, n_blocks, blk, 0)
    o_ref[:] = a_ref[1:H + 1, 1:G + 1]


def _up_resblock_kernel(x_ref, wm_ref, w1_ref, w2_ref, o_ref, a_ref, c_ref,
                        *, n_blocks, ch, chp):
    """Up-projection prologue + resblock chain, one VMEM-resident kernel.

    The prologue computes the 2x2-stride-2 transposed conv as two per-
    H-phase matmuls and writes the H-interleaved, W-folded result straight
    into the guard-padded scratch — the XLA side hands over a plain NHWC
    tensor. Doing the stack/reshape interleave in XLA in front of a
    ``pallas_call`` made layout assignment materialize two ~8 MB relayout
    copies per iteration (+0.9 ms, scripts/dump_up_hlo.py); in VMEM the
    interleave is address arithmetic.
    """
    H, G = o_ref.shape[0], o_ref.shape[1]
    H2 = H // 2
    a_ref[:] = jnp.zeros(a_ref.shape, jnp.bfloat16)
    c_ref[:] = jnp.zeros(c_ref.shape, jnp.bfloat16)
    for c in range(H2 // chp):
        k0 = c * chp
        xa = x_ref[k0:k0 + chp]                      # (chp, J=G, Ci)
        y0 = _dot(xa, wm_ref[0])                     # f32 (chp, G, 128)
        y1 = _dot(xa, wm_ref[1])
        inter = jnp.stack([y0, y1], axis=1).reshape(2 * chp, G, 128)
        a_ref[1 + 2 * k0:1 + 2 * k0 + 2 * chp, 1:G + 1] = (
            inter.astype(jnp.bfloat16))

    def blk(r, _):
        _layer(a_ref, c_ref, w1_ref[r], None, H, G, ch, relu=True)
        _layer(c_ref, a_ref, w2_ref[r], None, H, G, ch,
               relu=False, residual=True)
        return 0

    lax.fori_loop(0, n_blocks, blk, 0)
    o_ref[:] = a_ref[1:H + 1, 1:G + 1]


def _up_resblock_kernel2(x0_ref, x1_ref, w1_ref, w2_ref, o_ref, a_ref,
                         c_ref, *, n_blocks, ch):
    """Variant 2: the up-projection matmuls stay in XLA (one dot per
    H-phase — no interleave on the XLA side), the kernel interleaves the
    two phase planes row-by-row in VMEM. Inputs arrive column-guard-padded
    ``(H/2, G+2, 128)``; row copies are full-row (column-aligned) stores.
    """
    H, Gp = o_ref.shape[0], o_ref.shape[1] + 2
    G = Gp - 2
    H2 = H // 2
    z = jnp.zeros((1, Gp, 128), jnp.bfloat16)
    a_ref[0:1] = z
    a_ref[H + 1:H + 2] = z
    c_ref[:] = jnp.zeros(c_ref.shape, jnp.bfloat16)
    for k in range(H2):
        a_ref[1 + 2 * k:2 + 2 * k] = x0_ref[k:k + 1]
        a_ref[2 + 2 * k:3 + 2 * k] = x1_ref[k:k + 1]

    def blk(r, _):
        _layer(a_ref, c_ref, w1_ref[r], None, H, G, ch, relu=True)
        _layer(c_ref, a_ref, w2_ref[r], None, H, G, ch,
               relu=False, residual=True)
        return 0

    lax.fori_loop(0, n_blocks, blk, 0)
    o_ref[:] = a_ref[1:H + 1, 1:G + 1]


def _unfold(vf):
    """(1, H, G, 128) folded -> (1, 64, H, 2G) NCHW."""
    _, H, G, F = vf.shape
    v = vf.reshape(1, H, G, 2, C).reshape(1, H, 2 * G, C)
    return jnp.transpose(v, (0, 3, 1, 2))


def _fold(x):
    """(1, 64, H, W) NCHW -> (1, H, W/2, 128) folded, f = q*64 + c."""
    _, _, H, W = x.shape
    v = jnp.transpose(x, (0, 2, 3, 1)).reshape(1, H, W // 2, 2 * C)
    return v


def _lax_resblocks_f32(vf, w1s, w2s):
    """Pure-XLA f32 reference of the same chain on the folded tensor;
    used for the custom_vjp backward and the parity tests."""
    h = _unfold(vf).astype(jnp.float32)
    for r in range(w1s.shape[0]):
        t = lax.conv_general_dilated(
            h, w1s[r].astype(jnp.float32), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        t = jnp.maximum(t, 0.0)
        h = h + lax.conv_general_dilated(
            t, w2s[r].astype(jnp.float32), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return _fold(h)


def can_fuse_resblocks(vf, n_blocks: int) -> bool:
    """Whether the fused resblock kernel supports this (shape, chain) on
    the current backend — folded 128 lanes, >=1 block, per-image VMEM fit.
    Any batch: B>1 runs the per-image kernel under ``lax.map`` (the kernel
    is already MXU-saturating on one image)."""
    if fused_disabled():
        return False
    if os.environ.get("DEEPINV_TPU_FUSED_DRUNET", "1") == "0":
        return False
    if jax.default_backend() == "cpu":
        return False
    if vf.ndim != 4 or vf.shape[0] < 1 or vf.shape[-1] != 2 * C:
        return False
    _, H, G, _ = vf.shape
    if n_blocks < 1 or H < 8:
        return False
    vmem = 2 * (H + 2) * (G + 2) * 128 * 2
    return vmem < 80 * 1024 * 1024


def resblock_chain_cost(H: int, G: int, n_blocks: int):
    """Analytic (flops, HBM bytes) of ONE folded image through the fused
    resblock chain — the numbers ``_fused_fwd_impl`` records."""
    flops = n_blocks * 2 * (2 * H * (2 * G) * C * C * 9)
    bytes_ = (((H + 2) * (G + 2) + H * G) * 128 * 2
              + 2 * n_blocks * 3 * 2 * 128 * 128 * 2)
    return flops, bytes_


def batched_fused_resblock_chain(vf, w1s, w2s):
    """Apply :func:`fused_resblock_chain_folded` to a batch: direct call
    at B=1, sequential per-image kernel calls (``lax.map``) otherwise —
    the extra ``(B-1)x`` analytic cost is recorded here because XLA's
    cost analysis counts the map body once."""
    if vf.shape[0] == 1:
        return fused_resblock_chain_folded(vf, w1s, w2s)
    from ...utils.profiling import record_pallas_cost

    f1, b1 = resblock_chain_cost(vf.shape[1], vf.shape[2], int(w1s.shape[0]))
    record_pallas_cost((vf.shape[0] - 1) * f1, (vf.shape[0] - 1) * b1)
    return jax.lax.map(
        lambda vi: fused_resblock_chain_folded(vi[None], w1s, w2s)[0], vf)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_resblock_chain_folded(vf, w1s, w2s, interpret=False):
    """Run ``R`` fused residual blocks on a W-folded scale-0 tensor.

    :param vf: folded activations ``(1, H, W/2, 128)``, lane ``q*64 + c``
        for pixel phase ``q = w % 2`` (:func:`...models.drunet_fold._fold_w`).
    :param w1s: stacked OIHW conv1 weights ``(R, 64, 64, 3, 3)``.
    :param w2s: stacked OIHW conv2 weights ``(R, 64, 64, 3, 3)``.
    :return: ``(1, H, W/2, 128)`` bf16, = fold(h + conv2(relu(conv1(h))))
        applied R times to unfold(vf).
    """
    return _fused_fwd_impl(vf, w1s, w2s, interpret)


def _fused_fwd_impl(vf, w1s, w2s, interpret):
    _, H, G, _ = vf.shape
    ch = _chunk_rows(H)
    R = w1s.shape[0]

    # analytic cost for compiled_cost (XLA can't see inside pallas_call):
    # 2 convs of 3x3 C=64 at H x 2G per block + real HBM traffic.
    from ...utils.profiling import record_pallas_cost

    record_pallas_cost(
        R * 2 * (2 * H * (2 * G) * C * C * 9),
        ((H + 2) * (G + 2) + H * G) * 128 * 2
        + 2 * R * 3 * 2 * 128 * 128 * 2)
    wp1 = _pack_weights(w1s)
    wp2 = _pack_weights(w2s)
    xp = jnp.pad(vf[0].astype(jnp.bfloat16), ((1, 1), (1, 1), (0, 0)))
    o = pl.pallas_call(
        functools.partial(_resblock_kernel, n_blocks=w1s.shape[0], ch=ch),
        out_shape=jax.ShapeDtypeStruct((H, G, 128), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((H + 2, G + 2, 128), jnp.bfloat16),
                        pltpu.VMEM((H + 2, G + 2, 128), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, wp1, wp2)
    return o[None]


def _fwd(vf, w1s, w2s, interpret):
    return _fused_fwd_impl(vf, w1s, w2s, interpret), (vf, w1s, w2s)


def _bwd(interpret, res, g):
    vf, w1s, w2s = res
    _, vjp = jax.vjp(_lax_resblocks_f32, vf, w1s, w2s)
    dv, dw1, dw2 = vjp(g.astype(jnp.float32))
    return dv.astype(vf.dtype), dw1.astype(w1s.dtype), dw2.astype(w2s.dtype)


fused_resblock_chain_folded.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# up-projection + resblock chain (the DRUNet scale-0 up path in one kernel)
# ---------------------------------------------------------------------------


def _up_wm(w_iohw, dtype):
    """(Ci, Co, 2, 2) transposed-conv weight -> (2, Ci, 2Co) per-H-phase
    matmul matrices with folded output lane ``f = pj*Co + co``
    (models/drunet_fold._up_to_fold)."""
    Ci, Co = w_iohw.shape[:2]
    wm = jnp.transpose(w_iohw.astype(dtype), (2, 0, 3, 1))  # (ph, Ci, pj, Co)
    return wm.reshape(2, Ci, 2 * Co)


def _lax_up_resblocks_f32(v, w_iohw, w1s, w2s):
    """Pure-XLA f32 reference: up-projection (exact transposed conv,
    kernel == stride) + the folded resblock chain."""
    B, H2, J, Ci = v.shape
    Co = w_iohw.shape[1]
    wm = _up_wm(w_iohw, jnp.float32)
    flat = v.astype(jnp.float32).reshape(B * H2 * J, Ci)
    o0 = (flat @ wm[0]).reshape(B, H2, J, 2 * Co)
    o1 = (flat @ wm[1]).reshape(B, H2, J, 2 * Co)
    vf = jnp.stack([o0, o1], axis=2).reshape(B, 2 * H2, J, 2 * Co)
    return _lax_resblocks_f32(vf, w1s, w2s)


def can_fuse_up_resblocks(v, w_iohw, n_blocks: int) -> bool:
    """Gate for the fused up-projection chain: B=1, 64 output channels
    (128 folded lanes), even row count, VMEM fit."""
    if fused_disabled():
        return False
    if os.environ.get("DEEPINV_TPU_FUSED_DRUNET", "1") == "0":
        return False
    if jax.default_backend() == "cpu":
        return False
    if v.ndim != 4 or v.shape[0] != 1 or w_iohw.shape[1] != C:
        return False
    _, H2, J, Ci = v.shape
    if n_blocks < 1 or H2 < 8 or H2 % 8 or w_iohw.shape[0] != Ci:
        return False
    vmem = (2 * (2 * H2 + 2) * (J + 2) * 128 + H2 * J * Ci) * 2
    return vmem < 80 * 1024 * 1024


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_up_resblock_chain_folded(v, w_iohw, w1s, w2s, interpret=False):
    """Transposed-conv upsample (2x2, stride 2) + ``R`` residual blocks on
    the W-folded scale-0 tensor, as ONE VMEM-resident Pallas kernel.

    :param v: scale-1 activations ``(1, H/2, W/2, Ci)`` NHWC (the skip add
        ``v + x2`` already applied).
    :param w_iohw: transposed-conv weight ``(Ci, 64, 2, 2)``
        (reference deepinv/models/drunet.py up_conv).
    :param w1s: stacked OIHW conv1 weights ``(R, 64, 64, 3, 3)``.
    :param w2s: stacked OIHW conv2 weights ``(R, 64, 64, 3, 3)``.
    :return: ``(1, H, W/2, 128)`` bf16 folded activations.
    """
    if os.environ.get("DEEPINV_TPU_UP_KERNEL", "2") == "2":
        return _fused_up_fwd_impl2(v, w_iohw, w1s, w2s, interpret)
    return _fused_up_fwd_impl(v, w_iohw, w1s, w2s, interpret)


def _fused_up_fwd_impl(v, w_iohw, w1s, w2s, interpret):
    _, H2, J, Ci = v.shape
    H, G = 2 * H2, J
    ch = _chunk_rows(H)
    chp = _chunk_rows(H2)
    R = w1s.shape[0]

    from ...utils.profiling import record_pallas_cost

    record_pallas_cost(
        2 * H2 * J * Ci * 2 * 128 + R * 2 * (2 * H * (2 * G) * C * C * 9),
        (H2 * J * Ci + H * G * 128) * 2
        + 2 * Ci * 128 * 2 + 2 * R * 3 * 2 * 128 * 128 * 2)
    wm = _up_wm(w_iohw, jnp.bfloat16)
    wp1 = _pack_weights(w1s)
    wp2 = _pack_weights(w2s)
    xp = v[0].astype(jnp.bfloat16)
    o = pl.pallas_call(
        functools.partial(_up_resblock_kernel, n_blocks=R, ch=ch, chp=chp),
        out_shape=jax.ShapeDtypeStruct((H, G, 128), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((H + 2, G + 2, 128), jnp.bfloat16),
                        pltpu.VMEM((H + 2, G + 2, 128), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, wm, wp1, wp2)
    return o[None]


def _fused_up_fwd_impl2(v, w_iohw, w1s, w2s, interpret):
    """Variant-2 forward: per-phase XLA dots feed the interleaving kernel.
    Selected by DEEPINV_TPU_UP_KERNEL=2 (default; =1 for the in-kernel-dot
    prologue variant)."""
    B, H2, J, Ci = v.shape
    H, G = 2 * H2, J
    ch = _chunk_rows(H)
    R = w1s.shape[0]

    from ...utils.profiling import record_pallas_cost

    record_pallas_cost(
        R * 2 * (2 * H * (2 * G) * C * C * 9),
        2 * (H2 * (G + 2) + H * G // 2) * 128 * 2
        + 2 * R * 3 * 2 * 128 * 128 * 2)
    wm = _up_wm(w_iohw, jnp.bfloat16)
    flat = v[0].astype(jnp.bfloat16).reshape(H2 * J, Ci)
    o0 = (flat @ wm[0]).reshape(H2, J, 2 * C).astype(jnp.bfloat16)
    o1 = (flat @ wm[1]).reshape(H2, J, 2 * C).astype(jnp.bfloat16)
    o0 = jnp.pad(o0, ((0, 0), (1, 1), (0, 0)))
    o1 = jnp.pad(o1, ((0, 0), (1, 1), (0, 0)))
    wp1 = _pack_weights(w1s)
    wp2 = _pack_weights(w2s)
    o = pl.pallas_call(
        functools.partial(_up_resblock_kernel2, n_blocks=R, ch=ch),
        out_shape=jax.ShapeDtypeStruct((H, G, 128), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((H + 2, G + 2, 128), jnp.bfloat16),
                        pltpu.VMEM((H + 2, G + 2, 128), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(o0, o1, wp1, wp2)
    return o[None]


def _up_fwd(v, w_iohw, w1s, w2s, interpret):
    impl = (_fused_up_fwd_impl2
            if os.environ.get("DEEPINV_TPU_UP_KERNEL", "2") == "2"
            else _fused_up_fwd_impl)
    return impl(v, w_iohw, w1s, w2s, interpret), (v, w_iohw, w1s, w2s)


def _up_bwd(interpret, res, g):
    v, w_iohw, w1s, w2s = res
    _, vjp = jax.vjp(_lax_up_resblocks_f32, v, w_iohw, w1s, w2s)
    dv, dw, dw1, dw2 = vjp(g.astype(jnp.float32))
    return (dv.astype(v.dtype), dw.astype(w_iohw.dtype),
            dw1.astype(w1s.dtype), dw2.astype(w2s.dtype))


fused_up_resblock_chain_folded.defvjp(_up_fwd, _up_bwd)


# ---------------------------------------------------------------------------
# scale-1 <-> scale-0 "sandwich" (the whole DRUNet up tail in one kernel)
# ---------------------------------------------------------------------------
#
# r4's bisect showed every conv/dot-produced operand of a pallas_call pays
# XLA relayout copies proportional to the operand's size (BASELINE.md
# "DRUNet fused scale-0 resblocks"). The up-chain kernel's operands were
# the 4+8 MB scale-1 tensors -> ~1 ms of copies erased the kernel win.
# This kernel moves the boundary so the only conv-produced operand is the
# 2 MB scale-2 tensor: it runs up2-projection + the 4 scale-1 resblocks +
# the skip down-projection (recomputed from the Pallas-produced down-chain
# output, which needs no relayout) + up1-projection + the 4 scale-0
# resblocks, all VMEM-resident.


def _pack_nhwc_taps(ws):
    """(R, Co, Ci, 3, 3) OIHW -> (R, 3, 3, Ci, Co) bf16 per-tap matrices."""
    return jnp.transpose(ws.astype(jnp.bfloat16), (0, 3, 4, 2, 1))


def _layer_nhwc(src, dst, wt, H, G, ch, relu=True, residual=False):
    """Plain 3x3 NHWC conv layer ``src -> dst`` at 128 channels (one dot
    per tap), both buffers guard-padded ``(H+2, G+2, 128)``."""
    for c in range(H // ch):
        r0 = c * ch
        acc = jnp.zeros((ch, G, 128), jnp.float32)
        for dy in range(3):
            xa = src[r0 + dy:r0 + dy + ch]          # (ch, G+2, 128)
            for dx in range(3):
                acc = acc + _dot(xa[:, dx:dx + G], wt[dy, dx])
        if residual:
            acc = acc + dst[1 + r0:1 + r0 + ch, 1:G + 1].astype(jnp.float32)
        if relu:
            acc = jnp.maximum(acc, 0.0)
        dst[1 + r0:1 + r0 + ch, 1:G + 1] = acc.astype(jnp.bfloat16)


def _sandwich_kernel(s2_ref, vd_ref, wup2_ref, w1s1_ref, w2s1_ref, wd_ref,
                     wm1_ref, wp1_ref, wp2_ref, o_ref,
                     a1_ref, c1_ref, a0_ref, c0_ref, *,
                     n1, n0, ch1, ch0, chp2, chp1):
    H0, G = o_ref.shape[0], o_ref.shape[1]
    H1 = H0 // 2
    H2s = H1 // 2
    W2s = G // 2
    a1_ref[:] = jnp.zeros(a1_ref.shape, jnp.bfloat16)
    c1_ref[:] = jnp.zeros(c1_ref.shape, jnp.bfloat16)

    # 1. up2 projection: scale-2 NHWC -> scale-1 NHWC, H and W interleaves
    # both done in-register (4 phase matmuls per chunk)
    for c in range(H2s // chp2):
        k0 = c * chp2
        xa = s2_ref[k0:k0 + chp2]                       # (chp2, W2s, Ci2)
        rows = []
        for ph in range(2):
            y0 = _dot(xa, wup2_ref[ph, 0])              # (chp2, W2s, 128)
            y1 = _dot(xa, wup2_ref[ph, 1])
            w_int = jnp.stack([y0, y1], axis=2).reshape(chp2, 2 * W2s, 128)
            rows.append(w_int)
        h_int = jnp.stack(rows, axis=1).reshape(2 * chp2, G, 128)
        a1_ref[1 + 2 * k0:1 + 2 * k0 + 2 * chp2, 1:G + 1] = (
            h_int.astype(jnp.bfloat16))

    # 2. scale-1 resblock chain (C=128 NHWC)
    def blk1(r, _):
        _layer_nhwc(a1_ref, c1_ref, w1s1_ref[r], H1, G, ch1, relu=True)
        _layer_nhwc(c1_ref, a1_ref, w2s1_ref[r], H1, G, ch1,
                    relu=False, residual=True)
        return 0

    lax.fori_loop(0, n1, blk1, 0)

    # 3. skip add: x2 = down-projection of the (Pallas-produced) folded
    # down-chain output, recomputed in-kernel (2 dots per chunk)
    for c in range(H1 // chp1):
        k0 = c * chp1
        rows = vd_ref[2 * k0:2 * k0 + 2 * chp1]         # (2chp1, G, 128)
        pairs = rows.reshape(chp1, 2, G, 128)
        acc = (_dot(pairs[:, 0], wd_ref[0]) + _dot(pairs[:, 1], wd_ref[1])
               + a1_ref[1 + k0:1 + k0 + chp1, 1:G + 1].astype(jnp.float32))
        a1_ref[1 + k0:1 + k0 + chp1, 1:G + 1] = acc.astype(jnp.bfloat16)

    # 4. up1 projection into the folded scale-0 buffer
    a0_ref[:] = jnp.zeros(a0_ref.shape, jnp.bfloat16)
    c0_ref[:] = jnp.zeros(c0_ref.shape, jnp.bfloat16)
    for c in range(H1 // chp1):
        k0 = c * chp1
        xa = a1_ref[1 + k0:1 + k0 + chp1, 1:G + 1]      # (chp1, G, 128)
        y0 = _dot(xa, wm1_ref[0])
        y1 = _dot(xa, wm1_ref[1])
        inter = jnp.stack([y0, y1], axis=1).reshape(2 * chp1, G, 128)
        a0_ref[1 + 2 * k0:1 + 2 * k0 + 2 * chp1, 1:G + 1] = (
            inter.astype(jnp.bfloat16))

    # 5. scale-0 folded resblock chain
    def blk0(r, _):
        _layer(a0_ref, c0_ref, wp1_ref[r], None, H0, G, ch0, relu=True)
        _layer(c0_ref, a0_ref, wp2_ref[r], None, H0, G, ch0,
               relu=False, residual=True)
        return 0

    lax.fori_loop(0, n0, blk0, 0)
    o_ref[:] = a0_ref[1:H0 + 1, 1:G + 1]


def _lax_sandwich_f32(s2, vd, w_up2, w1s1, w2s1, w_down, w_up1, w1s, w2s):
    """Pure-XLA f32 reference of the sandwich (used for custom_vjp backward
    and parity tests): up2 transposed conv (kernel==stride) + scale-1
    resblocks + folded down-projection skip + up1 + scale-0 chain."""
    B, H2s, W2s, Ci2 = s2.shape
    Co1 = w_up2.shape[1]
    s2f = s2.astype(jnp.float32)
    w = w_up2.astype(jnp.float32)                  # (Ci2, Co1, 2, 2)
    wm = jnp.transpose(w, (0, 2, 3, 1)).reshape(Ci2, 4 * Co1)
    o = s2f.reshape(B * H2s * W2s, Ci2) @ wm
    o = o.reshape(B, H2s, W2s, 2, 2, Co1)
    o = jnp.transpose(o, (0, 1, 3, 2, 4, 5)).reshape(B, 2 * H2s, 2 * W2s, Co1)
    h = jnp.transpose(o, (0, 3, 1, 2))             # NCHW scale-1
    for r in range(w1s1.shape[0]):
        t = lax.conv_general_dilated(
            h, w1s1[r].astype(jnp.float32), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        t = jnp.maximum(t, 0.0)
        h = h + lax.conv_general_dilated(
            t, w2s1[r].astype(jnp.float32), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
    v1 = jnp.transpose(h, (0, 2, 3, 1))            # NHWC scale-1
    # skip: x2 = folded down-projection of the down-chain output
    Co = w_down.shape[0]
    wdt = jnp.transpose(w_down.astype(jnp.float32), (2, 3, 1, 0))
    wd = wdt.reshape(2, wdt.shape[1] * wdt.shape[2], Co)   # (dh, 2Ci, Co)
    vdf = vd.astype(jnp.float32)
    pairs = vdf.reshape(B, vdf.shape[1] // 2, 2, vdf.shape[2], vdf.shape[3])
    x2 = jnp.einsum("bhjf,fc->bhjc", pairs[:, :, 0], wd[0]) + \
        jnp.einsum("bhjf,fc->bhjc", pairs[:, :, 1], wd[1])
    return _lax_up_resblocks_f32(v1 + x2, w_up1, w1s, w2s)


def can_fuse_sandwich(s2, vd, w_up2, n1: int, n0: int) -> bool:
    """Gate for the sandwich kernel: B=1, scale-1 C=128 (full lanes),
    scale-0 C=64 folded, consistent shapes, VMEM fit."""
    if fused_disabled():
        return False
    if jax.default_backend() == "cpu":
        return False
    if s2.ndim != 4 or vd.ndim != 4 or s2.shape[0] != 1 or vd.shape[0] != 1:
        return False
    _, H2s, W2s, Ci2 = s2.shape
    _, H0, G, F = vd.shape
    if F != 2 * C or w_up2.shape[1] != 2 * C or w_up2.shape[0] != Ci2:
        return False
    if H0 != 4 * H2s or G != 2 * W2s or n1 < 1 or n0 < 1 or H2s % 2:
        return False
    vmem = (2 * (2 * H2s + 2) * (G + 2) * 128          # scale-1 ping-pong
            + 2 * (H0 + 2) * (G + 2) * 128             # scale-0 ping-pong
            + H2s * W2s * Ci2 + H0 * G * 128) * 2      # operands
    return vmem < 80 * 1024 * 1024


def sandwich_cost(H0: int, G: int, Ci2: int, n1: int, n0: int):
    """Analytic (flops, HBM bytes) of the sandwich kernel."""
    H1 = H0 // 2
    proj = (2 * H1 * G * 128 * Ci2            # up2 (4 phase matmuls)
            + 2 * H1 * G * 128 * 128 * 2      # skip down-projection
            + 2 * H1 * G * 128 * 128 * 2)     # up1 (2 phase matmuls)
    chain1 = n1 * 2 * (2 * H1 * G * 128 * 128 * 9)
    chain0 = n0 * 2 * (2 * H0 * (2 * G) * C * C * 9)
    flops = proj + chain1 + chain0
    bytes_ = ((H1 // 2) * (G // 2) * Ci2 + 2 * H0 * G * 128) * 2 \
        + (4 * Ci2 * 128 + (n1 + n0) * 2 * 9 * 128 * 128 + 4 * 128 * 128) * 2
    return flops, bytes_


@functools.partial(jax.custom_vjp, nondiff_argnums=(9,))
def fused_up_sandwich_folded(s2, vd, w_up2, w1s1, w2s1, w_down, w_up1,
                             w1s, w2s, interpret=False):
    """DRUNet's whole up tail as ONE Pallas kernel.

    :param s2: scale-2 activations ``(1, H/4, W/4, Ci2)`` NHWC (the skip
        add ``v + x3`` already applied) — the kernel's only conv-produced
        operand (2 MB at the flagship shape).
    :param vd: W-folded scale-0 down-chain output ``(1, H, W/2, 128)``
        (Pallas-produced when the down chain is fused: default layout, no
        relayout copies).
    :param w_up2: scale-2->1 transposed-conv weight ``(Ci2, 128, 2, 2)``.
    :param w1s1 / w2s1: stacked scale-1 resblock weights ``(R1,128,128,3,3)``.
    :param w_down: scale-0->1 strided-conv weight ``(128, 64, 2, 2)`` (the
        skip ``x2`` is recomputed in-kernel from ``vd``).
    :param w_up1: scale-1->0 transposed-conv weight ``(128, 64, 2, 2)``.
    :param w1s / w2s: stacked scale-0 resblock weights ``(R0, 64, 64, 3, 3)``.
    :return: ``(1, H, W/2, 128)`` bf16 folded activations (pre-tail).
    """
    return _sandwich_fwd_impl(s2, vd, w_up2, w1s1, w2s1, w_down, w_up1,
                              w1s, w2s, interpret)


def _sandwich_fwd_impl(s2, vd, w_up2, w1s1, w2s1, w_down, w_up1, w1s, w2s,
                       interpret):
    _, H2s, W2s, Ci2 = s2.shape
    _, H0, G, _ = vd.shape
    H1 = H0 // 2
    R1, R0 = w1s1.shape[0], w1s.shape[0]

    from ...utils.profiling import record_pallas_cost

    record_pallas_cost(*sandwich_cost(H0, G, Ci2, R1, R0))

    wup2 = jnp.transpose(w_up2.astype(jnp.bfloat16), (2, 3, 0, 1))
    wp1s1 = _pack_nhwc_taps(w1s1)
    wp2s1 = _pack_nhwc_taps(w2s1)
    wdt = jnp.transpose(w_down.astype(jnp.bfloat16), (2, 3, 1, 0))
    wd = wdt.reshape(2, wdt.shape[1] * wdt.shape[2], wdt.shape[3])
    wm1 = _up_wm(w_up1, jnp.bfloat16)
    wp1 = _pack_weights(w1s)
    wp2 = _pack_weights(w2s)

    o = pl.pallas_call(
        functools.partial(
            _sandwich_kernel, n1=R1, n0=R0, ch1=_chunk_rows(H1),
            ch0=_chunk_rows(H0), chp2=_chunk_rows(H2s), chp1=_chunk_rows(H1)),
        out_shape=jax.ShapeDtypeStruct((H0, G, 128), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 9,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((H1 + 2, G + 2, 128), jnp.bfloat16),
                        pltpu.VMEM((H1 + 2, G + 2, 128), jnp.bfloat16),
                        pltpu.VMEM((H0 + 2, G + 2, 128), jnp.bfloat16),
                        pltpu.VMEM((H0 + 2, G + 2, 128), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(s2[0].astype(jnp.bfloat16), vd[0].astype(jnp.bfloat16),
      wup2, wp1s1, wp2s1, wd, wm1, wp1, wp2)
    return o[None]


def _sandwich_fwd(s2, vd, w_up2, w1s1, w2s1, w_down, w_up1, w1s, w2s,
                  interpret):
    out = _sandwich_fwd_impl(s2, vd, w_up2, w1s1, w2s1, w_down, w_up1,
                             w1s, w2s, interpret)
    return out, (s2, vd, w_up2, w1s1, w2s1, w_down, w_up1, w1s, w2s)


def _sandwich_bwd(interpret, res, g):
    s2, vd, w_up2, w1s1, w2s1, w_down, w_up1, w1s, w2s = res
    _, vjp = jax.vjp(_lax_sandwich_f32, s2, vd, w_up2, w1s1, w2s1, w_down,
                     w_up1, w1s, w2s)
    grads = vjp(g.astype(jnp.float32))
    return tuple(gi.astype(a.dtype) for gi, a in
                 zip(grads, (s2, vd, w_up2, w1s1, w2s1, w_down, w_up1,
                             w1s, w2s)))


fused_up_sandwich_folded.defvjp(_sandwich_fwd, _sandwich_bwd)
