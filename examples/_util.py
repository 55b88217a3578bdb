"""Shared demo bootstrap: platform guard + fast-mode knob.

The gallery demos are small illustrative programs. The attached
accelerator on this host (TPU via the experimental ``axon`` tunnel) lacks
several ops the demos use eagerly (FFT paths raise UNIMPLEMENTED) and pays
tens of seconds of remote compilation per tiny program, so demos default to
the CPU backend — mirroring how the reference's sphinx-gallery executes its
82 examples on CPU CI (reference docs/source/conf.py).

Environment knobs:

- ``DEEPINV_TPU_DEMO_PLATFORM``: force a JAX platform (``cpu``, ``axon``,
  ``tpu``, ...). Unset -> ``cpu``.
- ``DEEPINV_TPU_DEMO_FAST``: when ``1``, demos shrink shapes / iteration
  counts so the whole gallery executes in CI (tests/test_examples.py).
"""

import os


def setup(platform: str = None):
    """Select the JAX platform for a demo. Call before any jax computation.

    Note: ``JAX_PLATFORMS`` as an environment variable is not enough on
    this host (the axon plugin wins), so this sets the in-process config.
    """
    import jax

    platform = platform or os.environ.get("DEEPINV_TPU_DEMO_PLATFORM", "cpu")
    try:
        jax.config.update("jax_platforms", platform)
    except Exception:
        pass
    return platform


def fast() -> bool:
    """True when the gallery runs under the CI fast mode."""
    return os.environ.get("DEEPINV_TPU_DEMO_FAST", "0") == "1"


def scale(n: int, fast_n: int = None) -> int:
    """``n`` normally; a reduced count in fast mode (default n//4, >=1)."""
    if not fast():
        return n
    return max(1, fast_n if fast_n is not None else n // 4)
