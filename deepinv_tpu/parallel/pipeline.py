"""Pipeline parallelism over a ``pp`` mesh axis (GPipe microbatching).

The reference has no pipeline story (its distributed layer is a
gather/scatter operator split — deepinv/distributed/distrib_framework.py);
on TPU pods, pipelining is the natural way to scale *deep homogeneous
stacks*: chunks of unrolled PnP/PGD iterations (unfolded.py), diffusion
sampler steps, or repeated conv blocks. Each device holds one stage's
parameters; microbatch carries flow device-to-device over ICI via
``lax.ppermute`` while all stages compute concurrently.

Only homogeneity is assumed: every stage must accept and return the same
carry pytree structure (true for unrolled iterations by construction).
The schedule is the classic GPipe fill-drain: ``M + S - 1`` ticks for
``M`` microbatches over ``S`` stages, bubble fraction ``(S-1)/(M+S-1)``.

The loop is a statically-bounded ``fori_loop`` (lowers to ``scan``), so the
whole pipeline is reverse-mode differentiable — training through it works.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

# vma (varying-manual-axes) tracking stays ON: device-local adjoints are
# derived with primals that inherit the cotangent's vma
# (core.linalg.transpose_primal), so no spurious psum is transposed in.
from jax import shard_map

from ..core import Module
from .context import DistributedContext

__all__ = ["pipeline", "PipelineParallel"]


def pipeline(stage_params, stage_apply, carries, ctx: DistributedContext,
             pp_axis: str = "pp"):
    """Run microbatch carries through a pipeline of stages.

    :param stage_params: parameter pytree whose leaves are stacked on a
        leading stage axis of size S (= mesh size of ``pp_axis``); leaf i
        parameterizes stage i. Sharded one-stage-per-device.
    :param stage_apply: ``(params_i, carry) -> carry`` — one pipeline stage.
    :param carries: input pytree stacked on a leading microbatch axis M.
    :param ctx: mesh context providing ``pp_axis``.
    :param pp_axis: mesh axis name for the pipeline.
    :return: output carries, stacked on the leading microbatch axis M.
    """
    mesh = ctx.mesh
    S = ctx.axis_size(pp_axis)
    if S == 1:
        def body(c):
            for i in range(jax.tree_util.tree_leaves(stage_params)[0].shape[0]):
                c = stage_apply(jax.tree_util.tree_map(lambda p: p[i], stage_params), c)
            return c
        return jax.vmap(body)(carries)

    M = jax.tree_util.tree_leaves(carries)[0].shape[0]
    tmap = jax.tree_util.tree_map

    def local(params, carries_local):
        params_i = tmap(lambda p: p[0], params)  # this device's stage
        idx = lax.axis_index(pp_axis)
        # the loop carry becomes device-varying after one tick (params vary
        # over pp); start it varying so the fori_loop carry type is stable
        zero = tmap(
            lambda c: lax.pcast(jnp.zeros_like(c[0]), pp_axis, to="varying"),
            carries_local)
        outbuf0 = tmap(
            lambda c: lax.pcast(jnp.zeros_like(c), pp_axis, to="varying"),
            carries_local)

        def tick(t, state):
            cur, outbuf = state
            # During drain ticks (t >= M) stage 0 re-ingests the clipped
            # last microbatch and its result is discarded downstream; this
            # burns idle-bubble FLOPs (no wall-clock cost — the device
            # would stall in the GPipe bubble anyway) in exchange for a
            # branch-free loop body XLA can pipeline.
            # stage 0 ingests microbatch t (clipped; masked out when t >= M)
            m_in = jnp.clip(t, 0, M - 1)
            inject = tmap(
                lambda c: lax.dynamic_index_in_dim(c, m_in, keepdims=False),
                carries_local)
            cur = tmap(lambda a, b: jnp.where(idx == 0, a, b), inject, cur)
            y = stage_apply(params_i, cur)
            # the last stage emits microbatch t - S + 1 (when valid)
            m_out = jnp.clip(t - S + 1, 0, M - 1)
            valid = jnp.logical_and(t - S + 1 >= 0, idx == S - 1)
            outbuf = tmap(
                lambda ob, yy: lax.dynamic_update_index_in_dim(
                    ob,
                    jnp.where(valid, yy,
                              lax.dynamic_index_in_dim(ob, m_out, keepdims=False)),
                    m_out, 0),
                outbuf, y)
            # shift activations down the chain (stage 0 re-injects next tick)
            nxt = tmap(
                lambda a: lax.ppermute(a, pp_axis,
                                       [(i, i + 1) for i in range(S - 1)]),
                y)
            return (nxt, outbuf)

        _, outbuf = lax.fori_loop(0, M + S - 1, tick, (zero, outbuf0))
        # replicate the last stage's output buffer to every device
        outbuf = tmap(
            lambda o: lax.psum(jnp.where(idx == S - 1, o, jnp.zeros_like(o)),
                               pp_axis),
            outbuf)
        return outbuf

    stage_spec = tmap(lambda _: P(pp_axis), stage_params)
    carry_spec = tmap(lambda _: P(), carries)
    f = shard_map(local, mesh=mesh,
                  in_specs=(stage_spec, carry_spec), out_specs=carry_spec)
    return f(stage_params, carries)


class PipelineParallel(Module):
    """Module wrapper: pipeline a homogeneous stage stack over ``pp``.

    :param stage_params: pytree stacked on a leading stage axis S.
    :param stage_apply: ``(params_i, carry) -> carry``.
    :param ctx: DistributedContext with a ``pp`` axis.
    :param n_microbatches: how many microbatches to split the batch into
        (must divide the batch size).
    """

    def __init__(self, stage_params, stage_apply, ctx: DistributedContext,
                 n_microbatches: int = None, pp_axis: str = "pp"):
        self.stage_params = stage_params
        self.stage_apply = stage_apply
        self.ctx = ctx
        self.pp_axis = pp_axis
        self.n_microbatches = n_microbatches

    def __call__(self, carry):
        """``carry``: pytree with a leading batch axis B; returns same."""
        tmap = jax.tree_util.tree_map
        B = jax.tree_util.tree_leaves(carry)[0].shape[0]
        M = self.n_microbatches or self.ctx.axis_size(self.pp_axis)
        if B % M:
            raise ValueError(f"batch {B} not divisible by {M} microbatches")
        mb = tmap(lambda c: c.reshape((M, B // M) + c.shape[1:]), carry)
        out = pipeline(self.stage_params, self.stage_apply, mb, self.ctx,
                       pp_axis=self.pp_axis)
        return tmap(lambda c: c.reshape((B,) + c.shape[2:]), out)
