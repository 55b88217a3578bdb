"""deepinv_tpu: a TPU-native JAX framework for deep-learning imaging inverse
problems, with the capabilities of deepinv/deepinv re-designed for XLA/Pallas.

Four core abstractions (mirroring the reference's public surface):

- ``physics(x, key=...)`` — forward operators with ``A`` / ``A_adjoint`` /
  ``A_dagger`` / ``prox_l2``;
- ``denoiser(x, sigma)`` — denoisers;
- ``model(y, physics)`` — reconstructors;
- ``loss(x_net=..., x=..., y=..., physics=..., model=...)`` — training losses.

Everything is a pytree: jit/vmap/grad/shard over physics and models directly.
"""

import os as _os

import jax as _jax

# persistent XLA compilation cache: large jitted programs (PnP scans, FFT
# radon) take minutes to compile on TPU the first time; cache them on disk.
_plat = (_os.environ.get("JAX_PLATFORMS") or "") + str(
    getattr(_jax.config, "jax_platforms", None) or ""
)
# cpu AOT cache entries can be machine-feature mismatched (SIGILL risk);
# only cache for accelerator backends
if not _os.environ.get("DEEPINV_TPU_NO_COMP_CACHE") and "cpu" not in _plat:
    _cache_dir = _os.environ.get(
        "DEEPINV_TPU_CACHE_DIR",
        _os.path.join(_os.path.dirname(__file__), "..", ".jax_cache"),
    )
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

from . import core
from . import ops
from . import physics
from . import optim

from .core import Module, TensorList

import jax.numpy as _jnp

#: default computation dtype (reference exposes ``deepinv.dtype``)
dtype = _jnp.float32


def __getattr__(name):
    """Lazy top-level conveniences matching the reference namespace:
    ``deepinv_tpu.Trainer``, ``deepinv_tpu.train``, ``deepinv_tpu.test`` and
    the remaining submodules — imported on first use to keep base import
    light."""
    if name in ("Trainer", "train", "test"):
        from . import training as _training

        return getattr(_training, name)
    if name == "metric":  # reference exposes deepinv.metric == loss.metric
        from .loss import metric as _metric

        return _metric
    if name in ("models", "loss", "sampling", "transform", "datasets",
                "training", "unfolded", "parallel", "utils", "native"):
        import importlib

        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


_LAZY_NAMES = (
    "Trainer", "train", "test", "metric", "models", "loss", "sampling",
    "transform", "datasets", "training", "unfolded", "parallel", "utils",
    "native",
)


def __dir__():
    return sorted(set(globals()) | set(_LAZY_NAMES))


__version__ = "0.1.0"
from . import serve
