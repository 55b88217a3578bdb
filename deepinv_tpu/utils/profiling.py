"""Lightweight profiling helpers (new TPU-native capability — SURVEY.md §5).

Thin wrappers around ``jax.profiler`` so users can capture a TensorBoard
trace of a reconstruction/training step, plus a compiled-cost inspector
(FLOPs / bytes) from XLA's own cost analysis — numbers the reference can
only obtain via external CUDA profilers.
"""

from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["trace", "compiled_cost", "timeit", "record_pallas_cost"]

# --- analytic cost of pallas_call sites -----------------------------------
#
# XLA's cost analysis cannot see inside a ``pallas_call`` (it reports ~0
# flops for the fused conv kernels), so the fused-kernel wrappers report
# their analytically counted cost here AT TRACE TIME. A ``lax.scan`` body is
# traced once regardless of trip count, which matches XLA's own convention
# of counting a scan body once — so adding the recorded totals to the XLA
# numbers keeps the combined figure per-iteration-consistent.
_pallas_record = None


def record_pallas_cost(flops: float, bytes_accessed: float) -> None:
    """Report the analytic cost of a fused kernel call site (called by the
    kernel wrappers while tracing; no-op outside :func:`compiled_cost`)."""
    if _pallas_record is not None:
        _pallas_record["flops"] += float(flops)
        _pallas_record["bytes"] += float(bytes_accessed)


@contextlib.contextmanager
def trace(logdir: str = "/tmp/deepinv_tpu_trace"):
    """Context manager capturing a ``jax.profiler`` trace viewable in
    TensorBoard / Perfetto::

        with dinv.utils.trace("/tmp/trace"):
            model(y, physics).block_until_ready()
    """
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def compiled_cost(fn, *args, **kwargs) -> dict:
    """Compile ``fn`` and return XLA's cost analysis: ``flops``,
    ``bytes accessed``, and (when available) memory footprint — the
    speed-of-light denominator for kernel optimization.

    Fused Pallas call sites (opaque to XLA's cost model) contribute their
    analytic cost via :func:`record_pallas_cost`; the returned ``flops`` /
    ``bytes accessed`` include them, with the Pallas share also broken out
    as ``pallas_flops`` / ``pallas_bytes``.
    """
    global _pallas_record
    prev, _pallas_record = _pallas_record, {"flops": 0.0, "bytes": 0.0}
    try:
        lowered = jax.jit(fn).lower(*args, **kwargs)
        rec = _pallas_record
    finally:
        _pallas_record = prev
    compiled = lowered.compile()
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
    except Exception:
        cost = {}
    out = {k: float(v) for k, v in (cost or {}).items()
           if isinstance(v, (int, float))}
    if rec["flops"] or rec["bytes"]:
        out["pallas_flops"] = rec["flops"]
        out["pallas_bytes"] = rec["bytes"]
        out["flops"] = out.get("flops", 0.0) + rec["flops"]
        out["bytes accessed"] = out.get("bytes accessed", 0.0) + rec["bytes"]
    try:
        mem = compiled.memory_analysis()
        if mem is not None:
            out["temp_size_bytes"] = float(mem.temp_size_in_bytes)
            out["argument_size_bytes"] = float(mem.argument_size_in_bytes)
            out["output_size_bytes"] = float(mem.output_size_in_bytes)
    except Exception:
        pass
    return out


def timeit(fn, *args, repeats: int = 5, **kwargs) -> float:
    """Median wall-clock seconds of the jitted ``fn`` (post-warmup),
    forcing results to host to defeat async dispatch."""
    import numpy as np

    jfn = jax.jit(fn)
    jax.tree_util.tree_map(np.asarray, jax.device_get(jfn(*args, **kwargs)))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.tree_util.tree_map(np.asarray, jax.device_get(jfn(*args, **kwargs)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))
