"""Pallas TPU kernel: fused chain of 3x3 conv + ReLU layers at 64 channels.

Why this exists (measured on a v5e, scripts/bench_pallas_dncnn.py): XLA maps
64-channel 3x3 convs to K=64/N=64 matmuls — 1/4 of the 128x128 MXU — and
round-trips every activation through HBM between layers. The DnCNN middle
chain (18 such layers) therefore runs at ~45 TF/s and dominates the PnP-PGD
mri/ct iterations end-to-end (scripts/profile_pgd.py: 2.1 ms of a 2.0 ms
iteration).

This kernel fixes both at once:

- **Pixel-pair lane packing**: group ``g`` holds image columns ``(2g, 2g+1)``
  as 2x64 = 128 lanes. Per kernel row ``dy`` the conv splits into two
  K=128/N=128 matmuls: ``own = [a_g | b_g] @ W_mid`` plus the neighbor
  vector ``n = [b_{g-1} | a_{g+1}] @ W_side``. 1.33x redundant FLOPs at
  ~full MXU utilization beats 1x at 25%.
- **VMEM-resident chain**: both ping-pong activation buffers live in VMEM
  for all layers — one HBM read of the input, one write of the output,
  zero inter-layer traffic.

Measured: 0.665 ms vs 1.944 ms for the XLA lax.conv chain (2.92x, 130 TF/s
= 66% MFU) on 18 layers x 64ch x 256x256.

Guard-padding replaces boundary logic: activations carry one zero guard row
top/bottom and one zero guard group left/right, so neighbor access is a
static offset slice (Mosaic rejects bf16 rotates and concats of
offset-layout operands; the only rotate — the half-lane swap for ``n`` —
is done in int32 via ``pltpu.bitcast``).

Backward: ``jax.custom_vjp`` re-running the pure-XLA chain under autodiff
(rematerialized; identical math to float rounding).

Reference parity: this accelerates ``deepinv.models.DnCNN``'s hidden layers
(reference models/dncnn.py:121-138) without semantic change.
"""

from __future__ import annotations

import contextlib
import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_conv3x3_relu_chain", "can_fuse_chain"]

C = 64  # channel width the packing is built for


def _pack_weights(ws):
    """(L,64,64,3,3) OIHW -> (L,3,2,128,128) bf16 packed matmul weights.

    ``[l, dy, 0]`` is W_mid (own pair), ``[l, dy, 1]`` is W_side (neighbor
    vector ``[b_{g-1} | a_{g+1}]``); see module docstring.
    """
    wn = jnp.transpose(ws.astype(jnp.float32), (0, 3, 4, 2, 1))  # L,dy,kx,ci,co
    z = jnp.zeros(wn.shape[:2] + (64, 64), jnp.float32)
    mid = jnp.concatenate([
        jnp.concatenate([wn[:, :, 1], wn[:, :, 0]], axis=-1),   # a_g -> pix0/pix1
        jnp.concatenate([wn[:, :, 2], wn[:, :, 1]], axis=-1),   # b_g -> pix0/pix1
    ], axis=-2)
    side = jnp.concatenate([
        jnp.concatenate([wn[:, :, 0], z], axis=-1),             # b_{g-1} -> pix0
        jnp.concatenate([z, wn[:, :, 2]], axis=-1),             # a_{g+1} -> pix1
    ], axis=-2)
    return jnp.stack([mid, side], axis=2).astype(jnp.bfloat16)


def _rot64(v):
    """Rotate bf16 lanes by 64 via int32 bitcast (sublane-pair packing
    leaves lane indexing unchanged; Mosaic's rotate is 32-bit only)."""
    return pltpu.bitcast(
        pltpu.roll(pltpu.bitcast(v, jnp.int32), 64, axis=2), jnp.bfloat16)


def _dot(a, w):
    return lax.dot_general(a, w, (((2,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)


def _layer(src, dst, wl, bias, H, G, ch, relu=True, residual=False):
    """One packed 3x3 conv layer ``src -> dst`` (both guard-padded).

    ``relu=False`` emits the raw conv; ``residual=True`` adds ``dst``'s
    current interior (the resblock skip) before the single bf16 rounding —
    the resblock pattern writes ``h + conv2(relu(conv1(h)))`` back into the
    buffer that held ``h``.
    """
    lane = lax.broadcasted_iota(jnp.int32, (ch, G, 128), 2)
    for c in range(H // ch):
        r0 = c * ch
        acc = jnp.zeros((ch, G, 128), jnp.float32)
        for dy in range(3):
            xa = src[r0 + dy:r0 + dy + ch]          # (ch, G+2, 128)
            own = xa[:, 1:G + 1]
            n = jnp.where(lane < 64, _rot64(xa[:, 0:G]),
                          _rot64(xa[:, 2:G + 2]))
            acc = acc + _dot(own, wl[dy, 0]) + _dot(n, wl[dy, 1])
        if bias is not None:
            acc = acc + bias
        if residual:
            acc = acc + dst[1 + r0:1 + r0 + ch, 1:G + 1].astype(jnp.float32)
        if relu:
            acc = jnp.maximum(acc, 0.0)
        dst[1 + r0:1 + r0 + ch, 1:G + 1] = acc.astype(jnp.bfloat16)


def _chain_kernel(x_ref, w_ref, b_ref, o_ref, a_ref, c_ref, *, n_pairs, ch):
    H, G = o_ref.shape[0], o_ref.shape[1]
    a_ref[:] = x_ref[:]
    c_ref[:] = jnp.zeros(c_ref.shape, jnp.bfloat16)

    def pair(p, _):
        l0 = 2 * p
        _layer(a_ref, c_ref, w_ref[l0], b_ref[pl.ds(l0, 1)][:, None, :],
               H, G, ch)
        _layer(c_ref, a_ref, w_ref[l0 + 1],
               b_ref[pl.ds(l0 + 1, 1)][:, None, :], H, G, ch)
        return 0

    lax.fori_loop(0, n_pairs, pair, 0)
    o_ref[:] = a_ref[1:H + 1, 1:G + 1]


def _chain_kernel_stash(x_ref, w_ref, b_ref, o_ref, acts_ref, a_ref, c_ref,
                        sems, *, n_pairs, ch):
    """Forward chain that also stashes every layer's (guard-padded, folded)
    activation to HBM by async DMA overlapped with the next layer's compute
    — the training-mode forward: the backward pass then needs no forward
    recompute (``acts_ref`` lives in ``pltpu.ANY``/HBM; VMEM only ever holds
    the two ping-pong buffers)."""
    H, G = o_ref.shape[0], o_ref.shape[1]
    a_ref[:] = x_ref[:]
    c_ref[:] = jnp.zeros(c_ref.shape, jnp.bfloat16)

    def pair(p, _):
        l0 = 2 * p

        # c is about to be overwritten: wait for its stash from pair p-1
        @pl.when(p > 0)
        def _():
            pltpu.make_async_copy(c_ref, acts_ref.at[l0 - 2], sems.at[0]).wait()

        _layer(a_ref, c_ref, w_ref[l0], b_ref[pl.ds(l0, 1)][:, None, :],
               H, G, ch)
        pltpu.make_async_copy(c_ref, acts_ref.at[l0], sems.at[0]).start()

        @pl.when(p > 0)
        def _():
            pltpu.make_async_copy(a_ref, acts_ref.at[l0 - 1], sems.at[1]).wait()

        _layer(c_ref, a_ref, w_ref[l0 + 1],
               b_ref[pl.ds(l0 + 1, 1)][:, None, :], H, G, ch)
        pltpu.make_async_copy(a_ref, acts_ref.at[l0 + 1], sems.at[1]).start()
        return 0

    lax.fori_loop(0, n_pairs, pair, 0)
    Le = 2 * n_pairs
    pltpu.make_async_copy(c_ref, acts_ref.at[Le - 2], sems.at[0]).wait()
    pltpu.make_async_copy(a_ref, acts_ref.at[Le - 1], sems.at[1]).wait()
    o_ref[:] = a_ref[1:H + 1, 1:G + 1]


def _chunk_rows(H):
    for ch in (32, 16, 8, 4, 2, 1):
        if H % ch == 0:
            return ch
    return 1


def _lax_chain(h, ws, bs):
    """Pure-XLA reference of the same chain (bf16 compute, f32 accumulate);
    used for the custom_vjp backward and as the general fallback."""
    h = h.astype(jnp.bfloat16)
    for l in range(ws.shape[0]):
        h = lax.conv_general_dilated(
            h, ws[l].astype(h.dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.float32)
        h = jnp.maximum(h + bs[l].astype(jnp.float32)[None, :, None, None],
                        0.0).astype(jnp.bfloat16)
    return h


def _lax_chain_f32(h, ws, bs):
    """f32 version of the chain for the custom_vjp backward — avoids
    mixed-dtype conv transposes and is the more accurate derivative."""
    h = h.astype(jnp.float32)
    for l in range(ws.shape[0]):
        h = lax.conv_general_dilated(
            h, ws[l].astype(jnp.float32), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        h = jnp.maximum(h + bs[l].astype(jnp.float32)[None, :, None, None],
                        0.0)
    return h


# trace-time switch: training steps trace with fused chains disabled —
# measured on the v5e (scripts/bench_train_chain.py, 2026-08-19): the fused
# forward wins 2.6-3x for inference, but under grad the stash-based custom
# backward runs 20.8 ms vs 8.7 ms for plain XLA bf16 autodiff (the
# handwritten dW convs hit slow TPU paths), so the Trainer's jitted step
# traces the pure-XLA chain instead.
_FUSED_DISABLED = False


@contextlib.contextmanager
def fused_chains_disabled():
    """Trace-time context: every ``can_fuse_*`` gate returns False inside
    (used by the Trainer around its train step — see module note)."""
    global _FUSED_DISABLED
    prev, _FUSED_DISABLED = _FUSED_DISABLED, True
    try:
        yield
    finally:
        _FUSED_DISABLED = prev


def fused_disabled() -> bool:
    return _FUSED_DISABLED


def can_fuse_chain(x, n_layers: int) -> bool:
    """Whether the fused kernel supports this (shape, chain) on the current
    backend — 64 channels, even W, >=2 layers, per-image buffers fit in
    VMEM. Any batch size: B>1 runs the per-image kernel under ``lax.map``
    (the kernel already sustains ~66% MXU utilization on ONE image, so
    sequential per-image calls lose almost nothing to batch parallelism)."""
    if _FUSED_DISABLED:
        return False
    if os.environ.get("DEEPINV_TPU_FUSED_DNCNN", "1") == "0":
        return False
    if jax.default_backend() == "cpu":
        return False
    if x.ndim != 4 or x.shape[0] < 1 or x.shape[1] != C:
        return False
    _, _, H, W = x.shape
    if n_layers < 2 or W % 2 or H < 8:
        return False
    vmem = 2 * (H + 2) * (W // 2 + 2) * 128 * 2
    return vmem < 80 * 1024 * 1024


def chain_cost(H: int, W: int, n_layers: int):
    """Analytic (flops, HBM bytes) of ONE image through the fused chain —
    the numbers ``_fused_fwd_impl`` records via ``record_pallas_cost``.
    Callers that wrap the kernel in a ``lax.map`` over batch record the
    extra ``(B-1)x`` themselves (XLA's cost analysis counts a scan body
    once, so the in-map trace only records one image's worth)."""
    Le = n_layers - (n_layers % 2)
    G = W // 2
    flops = Le * 2 * H * W * C * C * 9
    bytes_ = (((H + 2) * (G + 2) + H * G) * 128 * 2
              + Le * 3 * 2 * 128 * 128 * 2 + Le * 128 * 4)
    return flops, bytes_


def batched_fused_chain(h, ws, bs):
    """Apply :func:`fused_conv3x3_relu_chain` to a batch: direct call at
    B=1, sequential per-image kernel calls (``lax.map``) otherwise."""
    if h.shape[0] == 1:
        return fused_conv3x3_relu_chain(h, ws, bs)
    from ...utils.profiling import record_pallas_cost

    f1, b1 = chain_cost(h.shape[2], h.shape[3], int(ws.shape[0]))
    record_pallas_cost((h.shape[0] - 1) * f1, (h.shape[0] - 1) * b1)
    return jax.lax.map(
        lambda hi: fused_conv3x3_relu_chain(hi[None], ws, bs)[0], h)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_conv3x3_relu_chain(h, ws, bs, interpret=False):
    """Run ``L`` fused (conv3x3 pad1 + bias + ReLU) layers at 64 channels.

    :param h: activations ``(1, 64, H, W)``; computed in bf16.
    :param ws: stacked OIHW weights ``(L, 64, 64, 3, 3)``.
    :param bs: stacked biases ``(L, 64)``.
    :return: ``(1, 64, H, W)`` bf16.

    Odd ``L``: the even prefix runs fused, the last layer via XLA.
    """
    return _fused_fwd_impl(h, ws, bs, interpret)


def _fused_fwd_impl(h, ws, bs, interpret):
    Lw = ws.shape[0]
    Le = Lw - (Lw % 2)
    _, _, H, W = h.shape
    G = W // 2
    ch = _chunk_rows(H)

    # analytic cost for compiled_cost (XLA can't see inside pallas_call):
    # useful conv flops (2*H*W*Ci*Co*9 per layer, XLA's own convention) and
    # the kernel's real HBM traffic (one activation read + write + weights).
    from ...utils.profiling import record_pallas_cost

    record_pallas_cost(
        Le * 2 * H * W * C * C * 9,
        ((H + 2) * (G + 2) + H * G) * 128 * 2
        + Le * 3 * 2 * 128 * 128 * 2 + Le * 128 * 4)

    wp = _pack_weights(ws[:Le])
    bp = jnp.concatenate([bs[:Le], bs[:Le]], axis=1).astype(jnp.float32)

    xp = jnp.transpose(h[0].astype(jnp.bfloat16), (1, 2, 0)).reshape(H, G, 128)
    xp = jnp.pad(xp, ((1, 1), (1, 1), (0, 0)))
    o = pl.pallas_call(
        functools.partial(_chain_kernel, n_pairs=Le // 2, ch=ch),
        out_shape=jax.ShapeDtypeStruct((H, G, 128), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((H + 2, G + 2, 128), jnp.bfloat16),
                        pltpu.VMEM((H + 2, G + 2, 128), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, wp, bp)
    out = jnp.transpose(o.reshape(H, W, C), (2, 0, 1))[None]
    if Le < Lw:
        out = _lax_chain(out, ws[Le:], bs[Le:])
    return out


def _fused_fwd_stash_impl(h, ws, bs, interpret):
    """Training-mode forward: fused chain + per-layer activation stash.

    Returns ``(out, acts)`` with ``acts`` of shape ``(Le, H+2, G+2, 128)``
    (guard-padded folded layout): ``acts[l]`` is layer ``l``'s output — the
    input of layer ``l+1`` and the ReLU mask of layer ``l``'s backward.
    """
    Lw = ws.shape[0]
    Le = Lw - (Lw % 2)
    _, _, H, W = h.shape
    G = W // 2
    ch = _chunk_rows(H)
    # HBM slices must be tile-aligned (Mosaic: sublane dim % 8 == 0), so the
    # guard-padded column count is rounded up; the extra columns are dead
    Gp = -(-(G + 2) // 8) * 8

    from ...utils.profiling import record_pallas_cost

    record_pallas_cost(
        Le * 2 * H * W * C * C * 9,
        ((H + 2) * Gp * (Le + 1) + H * G) * 128 * 2
        + Le * 3 * 2 * 128 * 128 * 2 + Le * 128 * 4)

    wp = _pack_weights(ws[:Le])
    bp = jnp.concatenate([bs[:Le], bs[:Le]], axis=1).astype(jnp.float32)
    xp = jnp.transpose(h[0].astype(jnp.bfloat16), (1, 2, 0)).reshape(H, G, 128)
    xp = jnp.pad(xp, ((1, 1), (1, Gp - G - 1), (0, 0)))
    out, acts = pl.pallas_call(
        functools.partial(_chain_kernel_stash, n_pairs=Le // 2, ch=ch),
        out_shape=(
            jax.ShapeDtypeStruct((H, G, 128), jnp.bfloat16),
            jax.ShapeDtypeStruct((Le, H + 2, Gp, 128), jnp.bfloat16),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # HBM: DMA'd per layer
        ),
        scratch_shapes=[pltpu.VMEM((H + 2, Gp, 128), jnp.bfloat16),
                        pltpu.VMEM((H + 2, Gp, 128), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA((2,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, wp, bp)
    o = jnp.transpose(out.reshape(H, W, C), (2, 0, 1))[None]
    return o, acts


def _acts_to_nhwc(acts, H, W):
    """(L, H+2, G+2, 128) padded-folded -> (L, H, W, 64) NHWC — a pure
    reshape (the fold interleaves adjacent columns), no transpose."""
    G = W // 2
    inner = acts[:, 1:H + 1, 1:G + 1]
    return inner.reshape(acts.shape[0], H, G, 2, C).reshape(
        acts.shape[0], H, W, C)


def _fwd(h, ws, bs, interpret):
    Lw = ws.shape[0]
    if Lw % 2:
        # odd tail layer runs (and is differentiated) in XLA; only the even
        # prefix uses the fused path
        out_even, acts = _fused_fwd_stash_impl(h, ws, bs, interpret)
        return _lax_chain(out_even, ws[Lw - 1:], bs[Lw - 1:]), \
            (h, ws, bs, acts, out_even)
    out, acts = _fused_fwd_stash_impl(h, ws, bs, interpret)
    return out, (h, ws, bs, acts, None)


def _conv_nhwc(x, w_hwio):
    return lax.conv_general_dilated(
        x, w_hwio, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


def _bwd(interpret, res, g):
    """Backward from the stashed activations — no forward recompute.

    bf16 activation-gradient chain (matching the forward's precision
    policy: one bf16 rounding per conv, f32 accumulation); weight/bias
    gradients accumulate in f32.
    """
    h, ws, bs, acts, out_even = res
    Lw = ws.shape[0]
    Le = Lw - (Lw % 2)
    _, _, H, W = h.shape

    g = g.astype(jnp.float32)
    if Lw % 2:
        # peel the odd XLA tail layer with plain autodiff (single layer)
        _, vjp = jax.vjp(
            lambda hh, ww, bb: _lax_chain_f32(hh, ww, bb),
            out_even.astype(jnp.float32), ws[Le:], bs[Le:])
        g, dws_tail, dbs_tail = vjp(g)

    # NHWC views of the stash; layer l's input is acts[l-1] (h for l=0)
    a_nhwc = _acts_to_nhwc(acts, H, W)  # (Le, H, W, 64) bf16
    h_nhwc = jnp.transpose(h[0].astype(jnp.bfloat16), (1, 2, 0))[None]
    d = jnp.transpose(g[0], (1, 2, 0))[None].astype(jnp.bfloat16)  # NHWC

    dws = []
    dbs = []
    for l in range(Le - 1, -1, -1):
        mask = a_nhwc[l][None] > 0  # relu' of layer l's pre-activation
        d = jnp.where(mask, d, 0)
        dbs.append(jnp.sum(d.astype(jnp.float32), axis=(0, 1, 2)))
        x_in = h_nhwc if l == 0 else a_nhwc[l - 1][None]
        # dW[ky,kx,i,o] via conv with batch as the contraction:
        # lhs (I,H,W,B), rhs (H,W,B,O), padding 1 -> (I,3,3,O)
        dw = lax.conv_general_dilated(
            jnp.transpose(x_in, (3, 1, 2, 0)),
            jnp.transpose(d, (1, 2, 0, 3)),
            (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        dws.append(jnp.transpose(dw, (3, 0, 1, 2)))  # -> OIHW
        # cotangent of layer input: conv with flipped, I/O-swapped kernel
        w_hwio = jnp.transpose(ws[l], (2, 3, 1, 0)).astype(jnp.bfloat16)
        w_t = jnp.swapaxes(jnp.flip(w_hwio, (0, 1)), 2, 3)
        d = _conv_nhwc(d, w_t).astype(jnp.bfloat16)

    dws = jnp.stack(dws[::-1])
    dbs = jnp.stack(dbs[::-1])
    if Lw % 2:
        dws = jnp.concatenate([dws, dws_tail.astype(dws.dtype)])
        dbs = jnp.concatenate([dbs, dbs_tail.astype(dbs.dtype)])
    dh = jnp.transpose(d.astype(jnp.float32), (0, 3, 1, 2))
    return dh.astype(h.dtype), dws.astype(ws.dtype), dbs.astype(bs.dtype)


fused_conv3x3_relu_chain.defvjp(_fwd, _bwd)
