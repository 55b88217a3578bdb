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
           "fused_up_resblock_chain_folded", "can_fuse_up_resblocks"]


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
