"""W-folded DRUNet forward — a TPU layout transform of the scale-0 stage.

Why: at batch 1 the scale-0 convs (C=64 @ HxW) dominate DRUNet's wall clock
but run at <20% MXU utilization on a v5e: 64 channels fill only half of the
128 MXU lanes, and the (8,128) vector tiling wastes half of every load.
Measured interleaved on the v5e (scripts/bench_s2d2.py / bench_conv_sol.py):
a 3x3 C=64 conv @256^2 costs ~140-235us, while the SAME math expressed on a
W-folded tensor (H, W/2, 2C=128 channels) costs ~0.7x despite doing 2x the
raw MXU FLOPs (the folded kernel is block-3-wide with structural zeros).

The transform is exact (a permutation of the same multiply-accumulates):

- activations at scale 0 live as NHWC ``(B, H, W/2, 2C)`` with folded
  channel index ``f = q*C + c`` for pixel phase ``q = w % 2``;
- a 3x3 conv becomes a 3x3 block-space conv whose folded kernel scatters
  the 9 original taps into (Dj, q_in, q_out) slots (6/18 zero);
- the strided 2x2 downsampling conv consumes the fold exactly as a
  ``(2, 1)``-kernel ``(2, 1)``-strided conv;
- the 2x2-stride-2 transposed convolutions (all scales) are computed as
  phase-split 1x1 convs + interleave, avoiding XLA's zero-dilated lowering
  that wastes 3/4 of the MXU work;
- ReLU / residual adds / skip adds are elementwise and fold-invariant.

Weights stay in the torch-compatible OIHW tree (weight porting untouched);
folded kernels are built on the fly (tiny tensors, fused into the graph).

Reference architecture: deepinv/models/drunet.py:200-210.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["forward_unet_folded"]


def _fold_w(x_nchw):
    """(B, C, H, W) -> NHWC folded (B, H, W/2, 2C), f = q*C + c."""
    B, C, H, W = x_nchw.shape
    v = jnp.transpose(x_nchw, (0, 2, 3, 1))  # (B,H,W,C)
    v = v.reshape(B, H, W // 2, 2, C)
    return v.reshape(B, H, W // 2, 2 * C)


def _unfold_w(v):
    """Inverse of :func:`_fold_w`: (B, H, J, 2C) -> (B, C, H, 2J)."""
    B, H, J, F = v.shape
    C = F // 2
    v = v.reshape(B, H, J, 2, C).reshape(B, H, 2 * J, C)
    return jnp.transpose(v, (0, 3, 1, 2))


# (output phase) -> [(dw, Dj_index, q_in)] for the folded 3x3 kernel:
# original tap at w-offset dw-1 lands in block offset Dj-1, input phase q.
_FOLD3_TABLE = {
    0: [(0, 0, 1), (1, 1, 0), (2, 1, 1)],
    1: [(0, 1, 0), (1, 1, 1), (2, 2, 0)],
}


def _fold_conv3_kernel(w_oihw):
    """OIHW (Co, Ci, 3, 3) -> folded HWIO (3, 3, 2Ci, 2Co).

    Built from concatenations only (no scatters), so XLA's loop-invariant
    code motion hoists the fold out of `lax.scan` bodies that close over
    the weights.
    """
    Co, Ci = w_oihw.shape[:2]
    w = jnp.transpose(w_oihw, (2, 3, 1, 0))  # (3,3,Ci,Co) HWIO, w[:, dw]
    z = jnp.zeros((3, Ci, Co), w.dtype)

    def blk(q0p0, q0p1, q1p0, q1p1):
        # (3, 2Ci, 2Co) block for one Dj column; rows = q_in, cols = p_out
        top = jnp.concatenate([q0p0, q0p1], axis=2)
        bot = jnp.concatenate([q1p0, q1p1], axis=2)
        return jnp.concatenate([top, bot], axis=1)

    b0 = blk(z, z, w[:, 0], z)                      # Dj = -1
    b1 = blk(w[:, 1], w[:, 0], w[:, 2], w[:, 1])    # Dj = 0
    b2 = blk(z, w[:, 2], z, z)                      # Dj = +1
    return jnp.stack([b0, b1, b2], axis=1)          # (3, 3, 2Ci, 2Co)


def _conv(v, w, pad, strides=(1, 1)):
    return lax.conv_general_dilated(
        v, w.astype(v.dtype), strides, pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=v.dtype,
    )


def _conv3_folded(v, w_oihw):
    """Folded-space 3x3 conv: (B, H, J, 2Ci) -> (B, H, J, 2Co)."""
    return _conv(v, _fold_conv3_kernel(w_oihw), [(1, 1), (1, 1)])


def _conv3_nhwc(v, w_oihw):
    return _conv(v, jnp.transpose(w_oihw, (2, 3, 1, 0)), [(1, 1), (1, 1)])


def _down_from_fold(v, w_oihw):
    """Strided 2x2 downsample consuming the fold: (B, H, J, 2Ci) ->
    (B, H/2, J, Co). Kernel (2, 1) stride (2, 1); W decimation is the fold."""
    Co, Ci = w_oihw.shape[:2]
    # Wd[dh, 0, q*Ci+ci, co] = w[co, ci, dh, q]
    w = jnp.transpose(w_oihw, (2, 3, 1, 0))  # (2,2,Ci,Co) = [dh, q, ci, co]
    wd = w.reshape(2, 1, 2 * Ci, Co)  # flattens (q, ci) -> q*Ci + ci
    return _conv(v, wd, [(0, 0), (0, 0)], strides=(2, 1))


def _down_nhwc(v, w_oihw):
    """Plain 2x2 stride-2 conv, NHWC."""
    return _conv(v, jnp.transpose(w_oihw, (2, 3, 1, 0)),
                 [(0, 0), (0, 0)], strides=(2, 2))


def _up_nhwc(v, w_iohw):
    """2x2-stride-2 transposed conv as 4 phase 1x1 matmuls + interleave:
    (B, H, W, Ci) -> (B, 2H, 2W, Co). Exact (kernel == stride: no overlap)."""
    B, H, W, Ci = v.shape
    Co = w_iohw.shape[1]
    w = w_iohw.astype(v.dtype)  # (Ci, Co, 2, 2)
    # one matmul to all 4 phases at once: (B,H,W,Ci) x (Ci, 4Co)
    wm = jnp.transpose(w, (0, 2, 3, 1)).reshape(Ci, 4 * Co)
    o = v.reshape(B * H * W, Ci) @ wm  # (BHW, 4Co)
    o = o.reshape(B, H, W, 2, 2, Co)
    o = jnp.transpose(o, (0, 1, 3, 2, 4, 5))  # (B,H,ph,W,pw,Co)
    return o.reshape(B, 2 * H, 2 * W, Co)


def _up_to_fold(v, w_iohw):
    """Transposed conv whose output stays W-folded: (B, H, J, Ci) ->
    (B, 2H, J, 2Co) with f = pj*Co + co."""
    B, H, J, Ci = v.shape
    Co = w_iohw.shape[1]
    w = w_iohw.astype(v.dtype)  # (Ci, Co, ph, pj)
    # (Ci, ph, pj, Co) -> per H-phase matrices of shape (Ci, 2Co)
    wm = jnp.transpose(w, (0, 2, 3, 1)).reshape(Ci, 2, 2 * Co)
    flat = v.reshape(B * H * J, Ci)
    o0 = (flat @ wm[:, 0]).reshape(B, H, J, 2 * Co)
    o1 = (flat @ wm[:, 1]).reshape(B, H, J, 2 * Co)
    o = jnp.stack([o0, o1], axis=2)  # (B, H, ph, J, 2Co)
    return o.reshape(B, 2 * H, J, 2 * Co)


def forward_unet_folded(net, x0_nchw, act):
    """Equivalent of ``DRUNet.forward_unet`` with W-folded scale 0.

    :param net: a :class:`deepinv_tpu.models.DRUNet` (bias-free convs).
    :param x0_nchw: (B, Cin+1, H, W) input (image + noise map), W even.
    :param act: elementwise activation function.
    """

    def resblock_folded(v, blk):
        return v + _conv3_folded(act(_conv3_folded(v, blk.conv1.weight)),
                                 blk.conv2.weight)

    def _fusible(mode, tag, v, blocks):
        # default "down": only the down chain fuses. The up chain's fused
        # kernel is 1.7-4.7x faster in ISOLATION, but any variant of it in
        # the full graph costs +1.0-1.1 ms: XLA's layout assignment
        # materializes ~8 MB relayout copies around the pallas_call when
        # scale-1 conv outputs feed it (three kernel variants measured,
        # scripts/bench_fused_bisect.py + dump_up_hlo.py; BASELINE.md
        # "DRUNet fused scale-0 resblocks").
        # "sandwich" implies the down chain fuses too: the sandwich kernel
        # consumes the down-chain output as a Pallas-produced operand (the
        # whole point of moving the boundary).
        ok_mode = (mode in ("1", "both", tag)
                   or (mode == "sandwich" and tag in ("down", "sandwich")))
        return (
            ok_mode
            and v.dtype == jnp.bfloat16
            and all(b.act_mode == "R" and b.conv1.bias is None
                    and b.conv2.bias is None for b in blocks)
        )

    def resblock_chain_folded(v, blocks, tag):
        """Scale-0 resblock chain. With bf16 activations (the
        ``models.autocast`` inference path) and ReLU blocks it runs as one
        VMEM-resident Pallas kernel — measured 1.7x over the XLA folded
        chain in isolation (ops/pallas/resblock_chain.py); anywhere else,
        folded convs. ``tag`` ('down'/'up') allows bisecting via the
        DEEPINV_TPU_FUSED_DRUNET env var."""
        import os

        from ..ops.pallas.resblock_chain import (batched_fused_resblock_chain,
                                                 can_fuse_resblocks)

        mode = os.environ.get("DEEPINV_TPU_FUSED_DRUNET", "down")
        blocks = list(blocks)
        if (_fusible(mode, tag, v, blocks)
                and can_fuse_resblocks(v, len(blocks))):
            w1s = jnp.stack([b.conv1.weight for b in blocks])
            w2s = jnp.stack([b.conv2.weight for b in blocks])
            return batched_fused_resblock_chain(v, w1s, w2s)
        for blk in blocks:
            v = resblock_folded(v, blk)
        return v

    def up_resblock_chain(v_skip, w_up, blocks):
        """Scale-0 up path: transposed-conv upsample emitting the folded
        layout + resblock chain. Fusible case runs as ONE Pallas kernel
        (up-projection prologue + chain) — keeping the H-interleave inside
        VMEM avoids the ~8 MB relayout copies XLA's layout assignment
        inserts when the interleave feeds a pallas_call operand
        (scripts/dump_up_hlo.py)."""
        import os

        from ..ops.pallas.resblock_chain import (
            can_fuse_up_resblocks, fused_up_resblock_chain_folded)

        mode = os.environ.get("DEEPINV_TPU_FUSED_DRUNET", "down")
        blocks = list(blocks)
        if (_fusible(mode, "up", v_skip, blocks)
                and can_fuse_up_resblocks(v_skip, w_up, len(blocks))):
            w1s = jnp.stack([b.conv1.weight for b in blocks])
            w2s = jnp.stack([b.conv2.weight for b in blocks])
            return fused_up_resblock_chain_folded(v_skip, w_up, w1s, w2s)
        v = _up_to_fold(v_skip, w_up)
        return resblock_chain_folded(v, blocks, "up")

    def resblock_nhwc(v, blk):
        return v + _conv3_nhwc(act(_conv3_nhwc(v, blk.conv1.weight)),
                               blk.conv2.weight)

    # head + scale0 down (folded)
    xf = _fold_w(x0_nchw)
    x1 = _conv3_folded(xf, net.m_head.weight)
    d0 = resblock_chain_folded(x1, net.m_down1[:-1], 'down')
    x2 = _down_from_fold(d0, net.m_down1[-1].weight)  # (B, H/2, J, nc1) NHWC

    # scale1..2 down (plain NHWC)
    v = x2
    for blk in net.m_down2[:-1]:
        v = resblock_nhwc(v, blk)
    x3 = _down_nhwc(v, net.m_down2[-1].weight)
    v = x3
    for blk in net.m_down3[:-1]:
        v = resblock_nhwc(v, blk)
    x4 = _down_nhwc(v, net.m_down3[-1].weight)

    # body
    v = x4
    for blk in net.m_body:
        v = resblock_nhwc(v, blk)

    # up path
    v = _up_nhwc(v + x4, net.m_up3[0].weight)
    for blk in net.m_up3[1:]:
        v = resblock_nhwc(v, blk)

    import os as _os

    from ..ops.pallas.resblock_chain import (can_fuse_sandwich,
                                             fused_up_sandwich_folded)

    _mode = _os.environ.get("DEEPINV_TPU_FUSED_DRUNET", "down")
    s2 = v + x3
    up1_blocks = list(net.m_up1[1:])
    up2_blocks = list(net.m_up2[1:])
    if (_mode == "sandwich"
            and _fusible("sandwich", "sandwich", s2, up1_blocks + up2_blocks)
            and can_fuse_sandwich(s2, d0, net.m_up2[0].weight,
                                  len(up2_blocks), len(up1_blocks))):
        # the whole up tail (up2 projection, scale-1 chain, skip
        # down-projection recomputed from the Pallas-produced d0, up1
        # projection, scale-0 chain) as ONE kernel: the only conv-produced
        # operand is the 2 MB s2 tensor, sidestepping the r4 relayout wall
        # (BASELINE.md "DRUNet fused scale-0 resblocks").
        v = fused_up_sandwich_folded(
            s2, d0, net.m_up2[0].weight,
            jnp.stack([b.conv1.weight for b in up2_blocks]),
            jnp.stack([b.conv2.weight for b in up2_blocks]),
            net.m_down1[-1].weight, net.m_up1[0].weight,
            jnp.stack([b.conv1.weight for b in up1_blocks]),
            jnp.stack([b.conv2.weight for b in up1_blocks]))
    else:
        v = _up_nhwc(s2, net.m_up2[0].weight)
        for blk in up2_blocks:
            v = resblock_nhwc(v, blk)
        # scale0 up: emit directly into the folded layout
        v = up_resblock_chain(v + x2, net.m_up1[0].weight, net.m_up1[1:])

    out = _conv3_folded(v + x1, net.m_tail.weight)
    return _unfold_w(out)
