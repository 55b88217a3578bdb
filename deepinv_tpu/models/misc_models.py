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
    r"""Wrap a score/diffusion network as a sigma-calibrated denoiser
    (reference wrapper.py:9 ``ScoreModelWrapper``).

    Given :math:`x_t = s_t (x_0 + \sigma_t \varepsilon)`, the wrapped model
    predicts ``'epsilon'`` (noise), ``'sample'`` (:math:`x_0`) or the
    ``'v_prediction'`` target; the wrapper maps a denoiser-call noise level
    to the model's time axis through the ``sigma_t`` / ``scale_t``
    schedules and converts the prediction to a denoised estimate.

    Schedules may be jnp arrays (discrete tables of length ``n_timesteps``)
    or callables of continuous ``t in [0, T]``; missing ones are derived
    from the variance-preserving / variance-exploding relations as in the
    reference's ``_initialize_schedules``.

    :param score_model: network ``model(x, t, ...)``.
    :param prediction_type: 'epsilon' | 'v_prediction' | 'sample'.
    :param clip_output: clamp the estimate to the model range.
    :param sigma_t / scale_t: noise / scaling schedules.
    :param sigma_inverse: analytic inverse of ``sigma_t`` (optional).
    :param variance_preserving / variance_exploding: schedule family.
    :param T: continuous-time horizon. Default 1.0.
    :param takes_integer_time: model expects integer timesteps.
    :param n_timesteps: length of discrete schedules.
    :param _was_trained_on_minus_one_one: model range is [-1, 1].
    """

    def __init__(
        self,
        score_model=None,
        prediction_type: str = "epsilon",
        clip_output: bool = True,
        sigma_t=None,
        scale_t=None,
        sigma_inverse=None,
        variance_preserving: bool = False,
        variance_exploding: bool = False,
        T: float = 1.0,
        takes_integer_time: bool = False,
        n_timesteps: int = 1000,
        _was_trained_on_minus_one_one: bool = True,
    ):
        if prediction_type not in ("epsilon", "v_prediction", "sample"):
            raise ValueError(f"Unsupported prediction_type: {prediction_type}")
        if variance_preserving and variance_exploding:
            raise ValueError(
                "variance_preserving and variance_exploding cannot both be True.")
        self.model = score_model
        self.prediction_type = prediction_type
        self.clip_output = clip_output
        self.takes_integer_time = takes_integer_time
        self.n_timesteps = n_timesteps
        self._was_trained_on_minus_one_one = _was_trained_on_minus_one_one
        self.variance_preserving = variance_preserving
        self.variance_exploding = variance_exploding
        self.T = T
        self.sigma_inverse = sigma_inverse

        # derive the missing schedule (reference _initialize_schedules)
        if scale_t is None and sigma_t is not None:
            if variance_preserving:
                scale_t = self._map_schedule(
                    sigma_t, lambda s: jnp.sqrt(1.0 / (1.0 + s**2)))
            elif variance_exploding:
                scale_t = self._map_schedule(sigma_t, jnp.ones_like)
        elif sigma_t is None and scale_t is not None and variance_preserving:
            sigma_t = self._map_schedule(
                scale_t, lambda s: jnp.sqrt(jnp.clip(1.0 / s**2 - 1.0, 0.0)))
        self.sigma_t = sigma_t
        self.scale_t = scale_t

    @property
    def score_model(self):
        """Alias for ``model`` (pre-r3 attribute name)."""
        return self.model

    @staticmethod
    def _map_schedule(schedule, fn):
        """Compose ``fn`` onto a schedule (array or callable), always
        returning arrays (reference wrapper.py ``_map_schedule``)."""
        if callable(schedule):
            return lambda t: jnp.asarray(fn(jnp.asarray(schedule(jnp.asarray(t)))))
        return jnp.asarray(fn(jnp.asarray(schedule)))

    def get_schedule_value(self, schedule, t, target_size=None):
        """Evaluate a schedule (array table or callable) at times ``t``
        (reference wrapper.py:163)."""
        t = jnp.asarray(t)
        if callable(schedule):
            val = jnp.asarray(schedule(t))
        else:
            idx = (t * (self.n_timesteps - 1) / self.T).astype(jnp.int32)
            val = jnp.asarray(schedule)[idx]
        if target_size is not None:
            val = val.reshape(-1, *([1] * (len(target_size) - 1)))
        return val

    def time_from_sigma(self, sigma):
        """Invert the noise schedule: ``t`` such that ``sigma_t(t) = sigma``
        (reference wrapper.py:215) — analytic inverse if given, nearest
        table entry for discrete schedules, bisection otherwise."""
        sigma = jnp.asarray(sigma)
        if self.sigma_inverse is not None:
            return jnp.asarray(self.sigma_inverse(sigma))
        if not callable(self.sigma_t):
            sigmas = jnp.asarray(self.sigma_t)
            s = sigma.reshape(-1)
            idx = jnp.argmin(jnp.abs(sigmas[None, :] - s[:, None]), axis=1)
            t = idx.astype(jnp.float32) * self.T / (self.n_timesteps - 1)
            return t.reshape(sigma.shape) if sigma.ndim else t[0]
        t_low = jnp.zeros_like(sigma, dtype=jnp.float32)
        t_high = jnp.full_like(t_low, self.T)
        for _ in range(32):  # fixed-trip bisection: jit-safe
            t_mid = (t_low + t_high) / 2
            go_right = jnp.asarray(self.sigma_t(t_mid)) < sigma
            t_low = jnp.where(go_right, t_mid, t_low)
            t_high = jnp.where(go_right, t_high, t_mid)
        return (t_low + t_high) / 2

    @staticmethod
    def stable_division(a, b, epsilon: float = 1e-7):
        """``a / b`` with ``b`` pushed away from zero (reference
        wrapper.py:255)."""
        if isinstance(b, (int, float)):
            b = max(epsilon, abs(b)) * (1.0 if b >= 0 else -1.0)
            return a / b
        b = jnp.asarray(b)
        sign = jnp.where(b >= 0, 1.0, -1.0)
        return a / jnp.where(jnp.abs(b) > epsilon, b, sign * epsilon)

    def _pred_to_score(self, pred, x, sigma, scale):
        pt = self.prediction_type
        if pt == "epsilon":
            return -self.stable_division(pred, sigma)
        if pt == "v_prediction":
            return -self.stable_division(pred / scale + sigma * x, sigma)
        return self.stable_division(x + (scale * sigma) ** 2 * pred, scale)

    def _pred_to_x0(self, pred, x, sigma, scale):
        pt = self.prediction_type
        if pt == "epsilon":
            return x / scale - sigma * pred
        if pt == "v_prediction":
            return scale * (x - sigma * pred)
        return pred

    def _model_time(self, t):
        if self.takes_integer_time:
            return (t * (self.n_timesteps - 1)).astype(jnp.int32)
        return t

    def score(self, x, t=None, *args, **kwargs):
        r"""Score :math:`\nabla_x \log p_t(x)` at diffusion time ``t``
        (reference wrapper.py:266)."""
        if t is None:
            raise ValueError("A time step t must be provided.")
        t = jnp.broadcast_to(jnp.asarray(t, jnp.float32).reshape(-1),
                             (x.shape[0],))
        pred = self.model(x, self._model_time(t), *args, **kwargs)
        if isinstance(pred, (list, tuple)):
            pred = pred[0]
        sigma = self.get_schedule_value(self.sigma_t, t, x.shape)
        scale = self.get_schedule_value(self.scale_t, t, x.shape)
        return self._pred_to_score(jnp.asarray(pred, x.dtype), x, sigma, scale)

    def __call__(self, x, sigma=0.05, input_in_minus_one_one: bool = False,
                 *args, **kwargs):
        if self.sigma_t is None:  # bare Tweedie fallback (no schedule given)
            s = jnp.asarray(sigma)
            return x + s**2 * self.model(x, s, *args, **kwargs)
        s = jnp.broadcast_to(jnp.asarray(sigma, x.dtype).reshape(-1),
                             (x.shape[0],))
        rescale = self._was_trained_on_minus_one_one and not input_in_minus_one_one
        if rescale:
            s = s * 2  # model range is [-1, 1]
        t = self.time_from_sigma(s)
        scale = self.get_schedule_value(self.scale_t, t, x.shape)
        x_in = ((x * 2 - 1) if rescale else x) * scale
        pred = self.model(x_in, self._model_time(t), *args, **kwargs)
        if isinstance(pred, (list, tuple)):
            pred = pred[0]
        sig = s.reshape(-1, *([1] * (x.ndim - 1)))
        x0 = self._pred_to_x0(jnp.asarray(pred, x.dtype), x_in, sig, scale)
        if self.clip_output:
            x0 = jnp.clip(x0, -1.0, 1.0)
        return (x0 + 1) / 2 if rescale else x0


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
