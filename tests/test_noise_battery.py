"""Noise-model battery: statistical correctness of every noise model
(reference deepinv/tests/test_physics.py test_noise:1287 checks shapes;
here each model's empirical moments must match its analytic distribution),
plus the NoiseModel functional-update and rng-helper surface.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepinv_tpu.physics import (GammaNoise, GaussianNoise, LaplaceNoise,
                                 LogPoissonNoise, PoissonGaussianNoise,
                                 PoissonNoise, RicianNoise, SaltPepperNoise,
                                 UniformGaussianNoise, UniformNoise)

_N = (64, 1, 32, 32)  # 65k samples per statistic


def _flat(key, val=0.5):
    return jnp.ones(_N) * val


def test_gaussian_moments(key):
    x = _flat(key)
    y = GaussianNoise(sigma=0.2)(x, key=key)
    r = np.asarray(y - x).ravel()
    assert abs(r.mean()) < 5e-3
    assert abs(r.std() - 0.2) < 5e-3


def test_poisson_moments(key):
    """Normalized Poisson: E[y] = x, Var[y] = gain * x (reference
    PoissonNoise semantics, physics/noise.py)."""
    gain = 0.05
    x = _flat(key, 0.6)
    y = PoissonNoise(gain=gain)(x, key=key)
    r = np.asarray(y).ravel()
    assert abs(r.mean() - 0.6) < 5e-3
    assert abs(r.var() - gain * 0.6) / (gain * 0.6) < 0.05


def test_gamma_moments(key):
    """Multiplicative Gamma(l): E[y] = x, Var[y] = x^2 / l."""
    x = _flat(key, 0.8)
    y = GammaNoise(l=20.0)(x, key=key)
    r = np.asarray(y).ravel()
    assert abs(r.mean() - 0.8) / 0.8 < 0.02
    assert abs(r.var() - 0.8 ** 2 / 20.0) / (0.8 ** 2 / 20.0) < 0.05


def test_uniform_moments(key):
    """Additive U(-a, a): Var = a^2 / 3, bounded support."""
    a = 0.3
    x = _flat(key)
    y = UniformNoise(a=a)(x, key=key)
    r = np.asarray(y - x).ravel()
    assert abs(r.mean()) < 5e-3
    assert abs(r.var() - a ** 2 / 3) / (a ** 2 / 3) < 0.05
    assert r.min() >= -a - 1e-6 and r.max() <= a + 1e-6


def test_laplace_moments(key):
    """Additive Laplace(b): Var = 2 b^2."""
    b = 0.1
    x = _flat(key)
    y = LaplaceNoise(b=b)(x, key=key)
    r = np.asarray(y - x).ravel()
    assert abs(r.mean()) < 5e-3
    assert abs(r.var() - 2 * b ** 2) / (2 * b ** 2) < 0.08


def test_salt_pepper_fraction(key):
    """Fraction of corrupted pixels ~ p + s; corrupted values are 0/1."""
    p, s = 0.05, 0.1
    x = _flat(key)
    y = SaltPepperNoise(p=p, s=s)(x, key=key)
    r = np.asarray(y).ravel()
    changed = (r != 0.5)
    assert abs(changed.mean() - (p + s)) < 0.01
    assert set(np.round(np.unique(r), 6)).issubset({0.0, 0.5, 1.0})


def test_poisson_gaussian_variance(key):
    """Var[y] = gain * x + sigma^2."""
    gain, sigma = 0.05, 0.1
    x = _flat(key, 0.6)
    y = PoissonGaussianNoise(gain=gain, sigma=sigma)(x, key=key)
    r = np.asarray(y).ravel()
    want = gain * 0.6 + sigma ** 2
    assert abs(r.var() - want) / want < 0.05


def test_log_poisson_near_identity_for_large_N0(key):
    """High-dose log-Poisson concentrates around the clean attenuation."""
    x = _flat(key, 0.4)
    y = LogPoissonNoise(N0=65536.0, mu=1.0)(x, key=key)
    r = np.asarray(y).ravel()
    assert abs(r.mean() - 0.4) < 5e-3
    assert r.std() < 0.05


def test_rician_positivity_and_bias(key):
    """Rician magnitude noise: y >= 0 and E[y] > x (positive bias)."""
    x = _flat(key, 0.2)
    y = RicianNoise(sigma=0.2)(x, key=key)
    r = np.asarray(y).ravel()
    assert (r >= 0).all()
    assert r.mean() > 0.2


def test_uniform_gaussian_draws_sigma_per_batch(key):
    """UniformGaussianNoise draws one sigma per batch element in
    [sigma_min, sigma_max] — per-element stds differ and lie in range."""
    x = jnp.ones((8, 1, 64, 64)) * 0.5
    y = UniformGaussianNoise(sigma_min=0.05, sigma_max=0.5)(x, key=key)
    stds = np.asarray(jnp.std(y - x, axis=(1, 2, 3)))
    assert (stds > 0.02).all() and (stds < 0.6).all()
    assert stds.std() > 0.01  # genuinely different draws per element


def test_noise_update_parameters_functional(key):
    """update_parameters returns a NEW model (functional semantics) whose
    statistics reflect the new parameter (reference update_parameters)."""
    n = GaussianNoise(sigma=0.1)
    n2 = n.update_parameters(sigma=0.4)
    x = _flat(key)
    s1 = float(jnp.std(n(x, key=key) - x))
    s2 = float(jnp.std(n2(x, key=key) - x))
    assert abs(s1 - 0.1) < 0.01 and abs(s2 - 0.4) < 0.02
    assert abs(float(jnp.asarray(n.sigma)) - 0.1) < 1e-7  # original intact


def test_noise_rng_helpers(key):
    """rand_like / randn_like produce reproducible, correctly-shaped draws
    (reference NoiseModel rng helpers)."""
    n = GaussianNoise(sigma=0.1)
    x = jnp.zeros((2, 1, 8, 8))
    a = n.randn_like(x, key=jax.random.key(3))
    b = n.randn_like(x, key=jax.random.key(3))
    c = n.randn_like(x, key=jax.random.key(4))
    assert a.shape == x.shape
    assert np.allclose(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))
    # no key: keyed by the model's own seed — deterministic
    assert np.allclose(np.asarray(n.randn_like(x)),
                       np.asarray(n.randn_like(x)))
    u = n.rand_like(x, key=jax.random.key(3))
    assert float(jnp.min(u)) >= 0.0 and float(jnp.max(u)) <= 1.0
