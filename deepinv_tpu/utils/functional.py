"""Small functional helpers mirrored from reference deepinv/utils
(tensorlist.py dirac family :340, patch_extractor.py, utils.py misc).

Torch-specific helpers (``get_freer_gpu``, ``torch2cpu``, ``devices_equal``)
become their trivial JAX equivalents; download helpers are gated (no
egress).
"""

from __future__ import annotations

import datetime

import numpy as np
import jax
import jax.numpy as jnp

from ..core.tensorlist import TensorList

__all__ = [
    "complex_abs",
    "dirac",
    "dirac_like",
    "dirac_comb",
    "dirac_comb_like",
    "ones_like",
    "zeros_like",
    "rand_like",
    "randn_like",
    "get_timestamp",
    "get_device",
    "devices_equal",
    "normalize_signal",
    "resize_pad_square_tensor",
]


def complex_abs(x, dim: int = 1, keepdims: bool = True):
    """Magnitude of a 2-channel-real or complex array (reference
    utils/complex.py)."""
    if jnp.iscomplexobj(x):
        return jnp.abs(x)
    assert x.shape[dim] == 2, "expected 2 channels (real, imag)"
    return jnp.sqrt(jnp.sum(x**2, axis=dim, keepdims=keepdims))


def dirac(shape):
    """Centered 2D Dirac delta (reference tensorlist.py:340).

    :Examples:

        >>> from deepinv_tpu.utils import dirac
        >>> d = dirac((1, 1, 5, 5))
        >>> float(d.sum()), float(d[0, 0, 2, 2])
        (1.0, 1.0)
    """
    out = np.zeros(shape, np.float32)
    out[..., shape[-2] // 2, shape[-1] // 2] = 1.0
    return jnp.asarray(out)


def dirac_like(x):
    if isinstance(x, TensorList):
        return TensorList([dirac_like(v) for v in x])
    return dirac(x.shape).astype(x.dtype)


def dirac_comb(shape, period: int = 2):
    """2D Dirac comb (impulse train) with the given period."""
    out = np.zeros(shape, np.float32)
    out[..., ::period, ::period] = 1.0
    return jnp.asarray(out)


def dirac_comb_like(x, period: int = 2):
    if isinstance(x, TensorList):
        return TensorList([dirac_comb_like(v, period) for v in x])
    return dirac_comb(x.shape, period).astype(x.dtype)


def ones_like(x):
    return jax.tree_util.tree_map(jnp.ones_like, x)


def zeros_like(x):
    return jax.tree_util.tree_map(jnp.zeros_like, x)


def rand_like(x, key=None, seed: int = 0):
    key = key if key is not None else jax.random.key(seed)
    leaves, treedef = jax.tree_util.tree_flatten(x)
    keys = jax.random.split(key, len(leaves))
    return jax.tree_util.tree_unflatten(
        treedef,
        [jax.random.uniform(k, l.shape, l.dtype) for k, l in zip(keys, leaves)],
    )


def randn_like(x, key=None, seed: int = 0):
    key = key if key is not None else jax.random.key(seed)
    leaves, treedef = jax.tree_util.tree_flatten(x)
    keys = jax.random.split(key, len(leaves))
    return jax.tree_util.tree_unflatten(
        treedef,
        [jax.random.normal(k, l.shape, l.dtype) for k, l in zip(keys, leaves)],
    )


def get_timestamp() -> str:
    """Filesystem-safe timestamp string (reference utils/logger.py)."""
    return datetime.datetime.now().strftime("%y-%m-%d-%H:%M:%S")


def get_device():
    """Default JAX device (TPU if present) — reference ``get_device``
    returns the best torch device."""
    return jax.devices()[0]


def devices_equal(a, b) -> bool:
    return str(a) == str(b)


def normalize_signal(x, mode: str = "min_max"):
    """Rescale to [0, 1] per sample (reference utils/utils.py
    normalize_signal)."""
    axes = tuple(range(1, x.ndim))
    lo = jnp.min(x, axis=axes, keepdims=True)
    hi = jnp.max(x, axis=axes, keepdims=True)
    if mode == "clip":
        return jnp.clip(x, 0.0, 1.0)
    return (x - lo) / jnp.clip(hi - lo, 1e-12, None)




def resize_pad_square_tensor(x, size: int):
    """Resize keeping aspect ratio then zero-pad to a square ``size``."""
    B, C, H, W = x.shape
    s = size / max(H, W)
    nh, nw = int(round(H * s)), int(round(W * s))
    out = jax.image.resize(x, (B, C, nh, nw), method="bilinear")
    ph, pw = size - nh, size - nw
    return jnp.pad(out, ((0, 0), (0, 0), (ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2)))
