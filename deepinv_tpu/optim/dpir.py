"""DPIR preset (reference deepinv/optim/dpir.py:81).

HQS + DRUNet prior with the standard log-spaced noise schedule of Zhang et
al.: per-iteration denoiser sigmas from 49/255 down to the noise level, and
stepsizes proportional to sigma_k^2.
"""

from __future__ import annotations

import numpy as np

from .data_fidelity import L2
from .prior import PnP
from .optimizers import BaseOptim

__all__ = ["DPIR", "get_DPIR_params"]


def get_DPIR_params(noise_level_img: float, max_iter: int = 8, s1: float = 49.0 / 255.0, lamb: float = 1.0 / 0.23):
    """Standard DPIR schedule (reference dpir.py:11-36, exact):

    :Examples:

        >>> from deepinv_tpu.optim import get_DPIR_params
        >>> params = get_DPIR_params(0.05, max_iter=4)
        >>> sorted(params)
        ['g_param', 'lambda', 'stepsize']
        >>> len(params["stepsize"])
        4

    log-spaced denoiser sigmas 49/255 -> sigma_n; stepsize =
    lamb * (sigma_k / max(0.01, sigma_n))^2 with lamb = 1/0.23."""
    s2 = max(noise_level_img, 1e-4)
    sigma_denoiser = np.logspace(np.log10(s1), np.log10(s2), max_iter).astype(np.float32)
    stepsize = (sigma_denoiser / max(0.01, noise_level_img)) ** 2
    return {
        "g_param": list(sigma_denoiser),
        "stepsize": list(stepsize * lamb),
        "lambda": 1.0,
    }


def DPIR(sigma: float = 0.1, denoiser=None, max_iter: int = 8, **kwargs) -> BaseOptim:
    """Plug-and-play HQS with DRUNet and the DPIR schedule (dpir.py:81)."""
    if denoiser is None:
        from ..models import DRUNet

        denoiser = DRUNet(pretrained=None)
    params = get_DPIR_params(sigma, max_iter=max_iter)
    return BaseOptim(
        "HQS",
        data_fidelity=L2(),
        prior=PnP(denoiser),
        params_algo=params,
        max_iter=max_iter,
        **kwargs,
    )
