"""Remaining model adapters (reference deepinv/models/{wrapper.py,
kernel_network.py, epll.py, client.py}).
"""

from __future__ import annotations

import base64
import io
import json

import numpy as np
import jax
import jax.numpy as jnp

from ..core import Module
from .base import Denoiser, Reconstructor
from .layers import Conv2d
from .unet import UNet

__all__ = [
    "MinusOneOneDenoiserWrapper",
    "ScoreModelWrapper",
    "EPLLDenoiser",
    "Client",
]


class MinusOneOneDenoiserWrapper(Denoiser):
    """Adapt a [-1,1]-trained denoiser to [0,1] inputs
    (reference wrapper.py MinusOneOneDenoiserWrapper)."""

    def __init__(self, denoiser):
        self.denoiser = denoiser

    def __call__(self, x, sigma=0.05, **kwargs):
        out = self.denoiser(2 * x - 1, 2 * jnp.asarray(sigma), **kwargs)
        return (out + 1) / 2


class ScoreModelWrapper(Denoiser):
    """Turn a score network s(x, sigma) into a denoiser via Tweedie
    (reference wrapper.py ScoreModelWrapper)."""

    def __init__(self, score_model):
        self.score_model = score_model

    def __call__(self, x, sigma=0.05, **kwargs):
        s = jnp.asarray(sigma)
        return x + s**2 * self.score_model(x, s, **kwargs)


class EPLLDenoiser(Denoiser):
    """Denoiser facade over optim.EPLL (reference models/epll.py:78)."""

    def __init__(self, gmm=None, patch_size: int = 6, channels: int = 1, key=None):
        from ..optim.epll import EPLL

        self.epll = EPLL(gmm=gmm, patch_size=patch_size, channels=channels, key=key)

    def __call__(self, x, sigma=0.05, **kwargs):
        return self.epll(x, sigma)


class Client(Reconstructor):
    """Remote-inference REST client (reference client.py:13).

    Serializes arrays as base64 npy inside a JSON payload and posts to an
    endpoint. This environment has no network egress — requests will fail at
    the socket, but the protocol matches the reference.
    """

    def __init__(self, endpoint: str, api_key: str = "", timeout: float = 60.0):
        self.endpoint = endpoint
        self.api_key = api_key
        self.timeout = timeout

    @staticmethod
    def serialize(tensor) -> str:
        """Array -> base64 npy string (reference client.py:165)."""
        return Client._encode(tensor)

    @staticmethod
    def deserialize(data: str):
        """base64 npy string -> array (reference client.py:184)."""
        return Client._decode(data)

    @staticmethod
    def _encode(arr):
        buf = io.BytesIO()
        np.save(buf, np.asarray(arr))
        return base64.b64encode(buf.getvalue()).decode()

    @staticmethod
    def _decode(s):
        return np.load(io.BytesIO(base64.b64decode(s)))

    def payload(self, y, physics, **kwargs):
        return {
            "y": self._encode(y),
            "physics": type(physics).__name__,
            "kwargs": {k: v for k, v in kwargs.items() if isinstance(v, (int, float, str))},
        }

    def __call__(self, y, physics, **kwargs):
        import urllib.request

        req = urllib.request.Request(
            self.endpoint,
            data=json.dumps(self.payload(y, physics, **kwargs)).encode(),
            headers={
                "Content-Type": "application/json",
                "Authorization": f"Bearer {self.api_key}",
            },
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            out = json.loads(resp.read())
        return jnp.asarray(self._decode(out["x_hat"]))
