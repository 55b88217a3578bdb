"""Mixed-precision inference wrapper (TPU-native capability).

On TPU the MXU is bfloat16-native: running a denoiser's convolutions with
bf16 activations (f32 accumulation — ``preferred_element_type`` in
models/layers.py) halves HBM traffic and lifts MXU throughput, at ~1e-2
relative output error — imperceptible through a PnP prox step. This is the
TPU analogue of the A100 reference's default TF32 convolutions.

The wrapper is a pytree like any :class:`~deepinv_tpu.models.base.Denoiser`,
so it drops into PnP priors, samplers, and the Trainer unchanged.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import Module
from .base import Denoiser

__all__ = ["AutocastDenoiser", "autocast"]


class AutocastDenoiser(Denoiser):
    """Run ``denoiser`` with inputs cast to ``dtype`` and outputs cast back.

    :param denoiser: any ``denoiser(x, sigma)`` module.
    :param dtype: compute dtype (default bfloat16).
    :param cast_params: eagerly store the float parameter leaves in
        ``dtype`` (default True). With lazy per-call casts, the f32 weights
        are re-read and converted *inside* every jitted iteration (a scan
        body re-converts ~3 bytes/param of HBM traffic per step); storing
        them once in bf16 removes that entirely and is numerically
        identical (same rounding). Pass ``False`` to keep f32 master
        weights (e.g. to keep training this module afterwards).

    :Examples:

        >>> import jax, jax.numpy as jnp
        >>> from deepinv_tpu.models import DnCNN, autocast
        >>> den = autocast(DnCNN(1, 1, pretrained=None))
        >>> x = jax.random.uniform(jax.random.key(0), (1, 1, 16, 16))
        >>> out = den(x, 0.05)
        >>> out.dtype == x.dtype
        True
    """

    def __init__(self, denoiser: Module, dtype=jnp.bfloat16, cast_params: bool = True):
        if cast_params:
            import jax

            denoiser = jax.tree_util.tree_map(
                lambda v: v.astype(dtype)
                if hasattr(v, "dtype") and v.dtype == jnp.float32
                else v,
                denoiser,
            )
        self.denoiser = denoiser
        self.dtype = dtype

    def __call__(self, x, sigma=None, **kwargs):
        out = self.denoiser(x.astype(self.dtype), sigma, **kwargs)
        return out.astype(x.dtype)


def autocast(denoiser: Module, dtype=jnp.bfloat16, cast_params: bool = True) -> AutocastDenoiser:
    """Wrap a denoiser for bf16 compute (see :class:`AutocastDenoiser`)."""
    return AutocastDenoiser(denoiser, dtype=dtype, cast_params=cast_params)
