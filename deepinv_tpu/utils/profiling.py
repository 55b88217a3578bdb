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

__all__ = ["trace", "compiled_cost", "timeit"]


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
    speed-of-light denominator for kernel optimization."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
    except Exception:
        cost = {}
    out = {k: float(v) for k, v in (cost or {}).items()
           if isinstance(v, (int, float))}
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
