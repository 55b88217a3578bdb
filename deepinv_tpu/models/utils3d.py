"""2D -> 3D weight inflation (reference deepinv/models/utils.py:451
``initialize_3d_from_2d``): when no pretrained 3D weights exist, a 3D
network is initialized from its 2D counterpart's checkpoint — axially (the
2D kernel placed on the central depth slice) or isotropically (averaged
over the three axis-aligned placements).
"""

from __future__ import annotations

import jax.numpy as jnp

from .layers import Conv3d, ConvTranspose3d

__all__ = ["initialize_3d_from_2d"]


def _named_modules(obj, prefix=""):
    """Yield ``(torch-style dotted name, module)`` for every sub-module —
    lists index like torch ModuleList (``conv_list.0``)."""
    if isinstance(obj, (list, tuple)):
        for i, v in enumerate(obj):
            yield from _named_modules(v, f"{prefix}.{i}" if prefix else str(i))
        return
    if not hasattr(obj, "__dict__"):
        return
    yield prefix, obj
    for k, v in vars(obj).items():
        if k.startswith("_"):
            continue
        name = f"{prefix}.{k}" if prefix else k
        if isinstance(v, (list, tuple)) or hasattr(v, "__dict__"):
            yield from _named_modules(v, name)


def _inflate(w2d, k, isotropic):
    """(O, I, kh, kw) -> (O, I, k, kh, kw) cube kernel."""
    w2d = jnp.asarray(w2d)
    O, I = w2d.shape[:2]
    w = jnp.zeros((O, I, k) + w2d.shape[2:], w2d.dtype)
    if k % 2 == 1:
        # central-slice placement. The reference indexes k//2 + 1
        # (utils.py:471), which for k=3 is slice 2, off-center by one —
        # we place at the true center k//2 so a depth-constant volume maps
        # to the unshifted 2D result.
        c = k // 2
        if isotropic:
            w = w.at[:, :, c].add(w2d)
            w = w.at[:, :, :, c, :].add(w2d)
            w = w.at[..., c].add(w2d)
            w = w / 3.0
        else:
            w = w.at[:, :, c].set(w2d)
    else:
        if isotropic:
            w = (w2d[:, :, None] / k + w2d[:, :, :, None] / k
                 + w2d[..., None] / k) / 3.0
        else:
            w = jnp.broadcast_to(w2d[:, :, None] / k, w.shape)
    return w


def initialize_3d_from_2d(model_3d, ckpt_2d: dict, isotropic: bool = False):
    """Initialize every Conv3d / ConvTranspose3d in ``model_3d`` from the
    matching 2D checkpoint entries, IN PLACE (reference utils.py:451).

    :param model_3d: a pytree model whose attribute paths mirror the torch
        module names of the checkpoint.
    :param ckpt_2d: torch-style state dict ``{name.weight: (O,I,kh,kw)}``.
    :param isotropic: average the three axis-aligned placements instead of
        axial central-slice initialization.
    """
    import numpy as np

    def _get(name):
        v = ckpt_2d.get(name)
        if v is None:
            return None
        return jnp.asarray(np.asarray(v))

    for name, mod in _named_modules(model_3d):
        if not isinstance(mod, (Conv3d, ConvTranspose3d)):
            continue
        w2d = _get(f"{name}.weight")
        if w2d is None:
            continue
        k = mod.weight.shape[2]
        mod.weight = _inflate(w2d, k, isotropic).astype(mod.weight.dtype)
        b = _get(f"{name}.bias")
        if mod.bias is not None and b is not None:
            mod.bias = b.astype(mod.bias.dtype)
    return model_3d
