"""Noise models (reference deepinv/physics/noise.py, 13 classes, 1000 LoC).

Each noise model is a pytree Module whose parameters (sigma, gain, ...) are
array leaves — so noise levels can be batched, trained through (SURE losses
differentiate w.r.t. sigma), vmapped, or sharded. Randomness is explicit:
``noise(y, key=...)``; with ``key=None`` a key is derived from the model's
static ``seed`` field, mirroring the reference's per-instance seeded
``torch.Generator`` (noise.py:22-37, rng_manual_seed:56).

Parameters accept scalars or per-batch arrays of shape (B,), broadcast to the
measurement shape like the reference's ``to_nn_parameter`` handling
(noise.py:128-140, GaussianNoise batched sigma :244).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..core import Module
from ..core.rng import ensure_key

__all__ = [
    "NoiseModel",
    "ZeroNoise",
    "GaussianNoise",
    "UniformGaussianNoise",
    "PoissonNoise",
    "GammaNoise",
    "PoissonGaussianNoise",
    "UniformNoise",
    "LogPoissonNoise",
    "SaltPepperNoise",
    "FisherTippettNoise",
    "RicianNoise",
    "LaplaceNoise",
]


def _bcast(param, x):
    """Broadcast a scalar or (B,)-shaped parameter over x's trailing dims."""
    p = jnp.asarray(param)
    if p.ndim == 0:
        return p
    return p.reshape(p.shape + (1,) * (x.ndim - p.ndim))


class NoiseModel(Module):
    """Base noise model (reference noise.py:11)."""

    def __init__(self, seed: int = 0):
        self.seed = seed

    def sample(self, y, key):
        return y

    def __call__(self, y, key=None, **kwargs):
        key = ensure_key(key, self.seed)
        return self.sample(y, key, **kwargs)

    def forward(self, y, key=None, **kwargs):
        return self(y, key=key, **kwargs)

    def __mul__(self, other: "NoiseModel") -> "NoiseModel":
        """Chained noise: ``(n1 * n2)(y) = n1(n2(y))`` (noise.py:49-66)."""
        return _ChainedNoise(self, other)

    def rng_manual_seed(self, seed: int) -> "NoiseModel":
        """Functional analogue of the reference's rng reseeding."""
        return self.replace(seed=seed) if "seed" in self.__dict__ else self

    def reset_rng(self) -> "NoiseModel":
        """Reference ``reset_rng`` (noise.py:101): restore the initial rng
        state. Key-based draws are already stateless, so this is the
        identity — the same ``(seed, key)`` always reproduces the draw."""
        return self

    def rand_like(self, y, key=None):
        """Uniform [0, 1) sample shaped like ``y`` (reference noise.py:122),
        keyed by the model's seed when no key is given."""
        return jax.random.uniform(ensure_key(key, self.seed), jnp.shape(y))

    def randn_like(self, y, key=None):
        """Standard normal sample shaped like ``y`` (reference noise.py:130)."""
        return jax.random.normal(ensure_key(key, self.seed), jnp.shape(y))

    def update_parameters(self, **params) -> "NoiseModel":
        """Reference-named alias of the functional :meth:`update`."""
        return self.update(**params)


class _ChainedNoise(NoiseModel):
    def __init__(self, outer: NoiseModel, inner: NoiseModel):
        super().__init__()
        self.outer = outer
        self.inner = inner

    def sample(self, y, key):
        k1, k2 = jax.random.split(key)
        return self.outer(self.inner(y, key=k2), key=k1)


class ZeroNoise(NoiseModel):
    """No noise (reference noise.py:179)."""

    def sample(self, y, key):
        return y


class GaussianNoise(NoiseModel):
    r"""``y = x + sigma * eps``, eps ~ N(0, I) (reference noise.py:197).

    ``sigma`` may be a scalar or a (B,) array for per-sample noise levels.
    For complex measurements, noise is complex circular Gaussian.

    :Examples:

        Noise draws are keyed (stateless) and models compose with ``*``
        — two Gaussians merge in closed form:

        >>> import jax, jax.numpy as jnp
        >>> from deepinv_tpu.physics import GaussianNoise
        >>> n = GaussianNoise(sigma=0.1)
        >>> y = n(jnp.zeros((1, 1, 4, 4)), key=jax.random.key(0))
        >>> y.shape
        (1, 1, 4, 4)
        >>> merged = GaussianNoise(sigma=0.3) * GaussianNoise(sigma=0.4)
        >>> round(float(merged.sigma), 5)
        0.5
    """

    def __init__(self, sigma=0.1, seed: int = 0):
        super().__init__(seed=seed)
        self.sigma = jnp.asarray(sigma)

    def sample(self, y, key):
        s = _bcast(self.sigma, y)
        if jnp.iscomplexobj(y):
            kr, ki = jax.random.split(key)
            rdt = y.real.dtype
            eps = jax.random.normal(kr, y.shape, rdt) + 1j * jax.random.normal(
                ki, y.shape, rdt
            )
        else:
            eps = jax.random.normal(key, y.shape, y.dtype)
        return y + s * eps

    def __mul__(self, other):
        if isinstance(other, GaussianNoise):
            # sum of independent Gaussians (reference noise.py:273)
            return GaussianNoise(sigma=(self.sigma**2 + other.sigma**2) ** 0.5)
        if isinstance(other, (int, float)) or (
            hasattr(other, "ndim") and not isinstance(other, NoiseModel)
        ):
            return GaussianNoise(sigma=self.sigma * other)
        return super().__mul__(other)


class UniformGaussianNoise(NoiseModel):
    r"""Gaussian noise with sigma ~ U(sigma_min, sigma_max) per sample
    (reference noise.py:347)."""

    def __init__(self, sigma_min=0.0, sigma_max=0.5, seed: int = 0):
        super().__init__(seed=seed)
        self.sigma_min = jnp.asarray(sigma_min)
        self.sigma_max = jnp.asarray(sigma_max)

    def sample(self, y, key):
        ks, kn = jax.random.split(key)
        B = y.shape[0]
        sigma = jax.random.uniform(
            ks, (B,), y.dtype, self.sigma_min, self.sigma_max
        )
        eps = jax.random.normal(kn, y.shape, y.dtype)
        return y + _bcast(sigma, y) * eps


class PoissonNoise(NoiseModel):
    r"""``y = gamma * P(x / gamma)`` (reference noise.py:417).

    :param gain: gamma (inverse photon count scale).
    :param normalize: multiply back by gain (reference :504).
    :param clip_positive: clip x/gain at 0 before sampling.
    """

    def __init__(self, gain=1.0, normalize: bool = True, clip_positive: bool = False, seed: int = 0):
        super().__init__(seed=seed)
        self.gain = jnp.asarray(gain)
        self.normalize = normalize
        self.clip_positive = clip_positive

    def sample(self, y, key):
        g = _bcast(self.gain, y)
        rate = y / g
        if self.clip_positive:
            rate = jnp.clip(rate, 0.0, None)
        z = jax.random.poisson(key, rate, y.shape).astype(y.dtype)
        if self.normalize:
            z = z * g
        return z


class GammaNoise(NoiseModel):
    r"""``y ~ Gamma(l, x/l)`` with mean x (reference noise.py:508)."""

    def __init__(self, l=1.0, seed: int = 0):
        super().__init__(seed=seed)
        self.l = jnp.asarray(l)

    def sample(self, y, key):
        l = _bcast(self.l, y)
        # Gamma(concentration=l, rate=l/x): mean = x
        g = jax.random.gamma(key, jnp.broadcast_to(l, y.shape).astype(y.dtype))
        return g * y / l


class PoissonGaussianNoise(NoiseModel):
    r"""``y = gamma P(x/gamma) + sigma eps`` (reference noise.py:548)."""

    def __init__(self, gain=1.0, sigma=0.1, clip_positive: bool = False, seed: int = 0):
        super().__init__(seed=seed)
        self.gain = jnp.asarray(gain)
        self.sigma = jnp.asarray(sigma)
        self.clip_positive = clip_positive

    def sample(self, y, key):
        kp, kn = jax.random.split(key)
        g = _bcast(self.gain, y)
        rate = y / g
        if self.clip_positive:
            rate = jnp.clip(rate, 0.0, None)
        z = jax.random.poisson(kp, rate, y.shape).astype(y.dtype) * g
        s = _bcast(self.sigma, y)
        return z + s * jax.random.normal(kn, y.shape, y.dtype)


class UniformNoise(NoiseModel):
    r"""``y = x + eps``, eps ~ U(-a, a) (reference noise.py:653)."""

    def __init__(self, a=0.1, seed: int = 0):
        super().__init__(seed=seed)
        self.a = jnp.asarray(a)

    def sample(self, y, key):
        a = _bcast(self.a, y)
        return y + jax.random.uniform(key, y.shape, y.dtype, -1.0, 1.0) * a


class LogPoissonNoise(NoiseModel):
    r"""``y = -log(P(exp(-mu x) N0) / N0) / mu`` — CT Beer-Lambert noise
    (reference noise.py:704)."""

    def __init__(self, N0=1024.0, mu=1 / 50.0, seed: int = 0):
        super().__init__(seed=seed)
        self.N0 = jnp.asarray(N0)
        self.mu = jnp.asarray(mu)

    def sample(self, y, key):
        N0 = _bcast(self.N0, y)
        mu = _bcast(self.mu, y)
        n1 = jax.random.poisson(key, N0 * jnp.exp(-y * mu), y.shape).astype(y.dtype)
        return -jnp.log(jnp.maximum(n1, 1e-8) / N0) / mu


class SaltPepperNoise(NoiseModel):
    r"""Salt-and-pepper flips: 0 w.p. p, 1 w.p. s (reference noise.py:772)."""

    def __init__(self, p=0.025, s=0.025, seed: int = 0):
        super().__init__(seed=seed)
        self.p = jnp.asarray(p)
        self.s = jnp.asarray(s)

    def sample(self, y, key):
        z = jax.random.uniform(key, y.shape, y.dtype)
        p = _bcast(self.p, y)
        s = _bcast(self.s, y)
        out = jnp.where(z < p, 0.0, y)
        out = jnp.where(z > 1 - s, 1.0, out)
        return out


class FisherTippettNoise(NoiseModel):
    r"""``y = log(Gamma(l, x/l))`` — log-domain speckle (reference noise.py:843)."""

    def __init__(self, l=1.0, seed: int = 0):
        super().__init__(seed=seed)
        self.l = jnp.asarray(l)

    def sample(self, y, key):
        # inputs are LOG-intensities (reference noise.py:870: x = exp(x),
        # gamma speckle with mean x, then log) — y_out = y + log(G/l),
        # G ~ Gamma(l, 1)
        l = _bcast(self.l, y)
        g = jax.random.gamma(key, jnp.broadcast_to(l, y.shape).astype(y.dtype))
        return jnp.log(jnp.maximum(g * jnp.exp(y) / l, 1e-20))


class RicianNoise(NoiseModel):
    r"""``y = sqrt((x + sigma e1)^2 + (sigma e2)^2)`` (reference noise.py:875)."""

    def __init__(self, sigma=0.1, seed: int = 0):
        super().__init__(seed=seed)
        self.sigma = jnp.asarray(sigma)

    def sample(self, y, key):
        k1, k2 = jax.random.split(key)
        s = _bcast(self.sigma, y)
        n1 = jax.random.normal(k1, y.shape, y.dtype)
        n2 = jax.random.normal(k2, y.shape, y.dtype)
        return jnp.sqrt((y + s * n1) ** 2 + (s * n2) ** 2)


class LaplaceNoise(NoiseModel):
    r"""``y = x + eps``, eps ~ Laplace(0, b) (reference noise.py:920)."""

    def __init__(self, b=0.1, seed: int = 0):
        super().__init__(seed=seed)
        self.b = jnp.asarray(b)

    def sample(self, y, key):
        b = _bcast(self.b, y)
        return y + jax.random.laplace(key, y.shape, y.dtype) * b
