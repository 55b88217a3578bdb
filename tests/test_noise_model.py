"""Noise models (reference deepinv/tests/test_noise_model.py).

Statistical property tests: first/second moments match the documented
distributions, key determinism replaces the reference's stateful
``torch.Generator`` semantics (noise.py:22-37), `*` chaining/variance
algebra, batched per-sample parameters, and complex measurement support.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepinv_tpu.physics import (
    GaussianNoise,
    PoissonNoise,
    PoissonGaussianNoise,
    GammaNoise,
    UniformNoise,
    UniformGaussianNoise,
    SaltPepperNoise,
    RicianNoise,
    LaplaceNoise,
    ZeroNoise,
)

SHAPE = (4, 1, 64, 64)


@pytest.fixture
def y():
    return jnp.full(SHAPE, 0.5, jnp.float32)


def _stats(z, y):
    d = np.asarray(z - y).ravel()
    return d.mean(), d.std()


def test_gaussian_moments(y, key):
    z = GaussianNoise(sigma=0.1)(y, key=key)
    m, s = _stats(z, y)
    assert abs(m) < 5e-3 and abs(s - 0.1) < 5e-3


def test_zero_noise(y, key):
    assert np.allclose(ZeroNoise()(y, key=key), y)


def test_key_determinism(y, key):
    """Same key -> identical draw; different key -> different draw. With no
    key, the model's seed field fixes the draw (stateless reference
    semantics for rng_manual_seed/reset_rng, noise.py:100-140)."""
    n = GaussianNoise(sigma=0.2)
    a = n(y, key=jax.random.key(5))
    b = n(y, key=jax.random.key(5))
    c = n(y, key=jax.random.key(6))
    assert np.array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))
    d1, d2 = n(y), n(y)
    assert np.array_equal(np.asarray(d1), np.asarray(d2))
    assert not np.array_equal(np.asarray(d1), np.asarray(n.rng_manual_seed(3)(y)))


def test_poisson_moments(y, key):
    gain = 0.05
    z = PoissonNoise(gain=gain)(y, key=key)
    m, s = _stats(z, y)
    # mean preserved; var = gain * x
    assert abs(m) < 5e-3
    assert abs(s - np.sqrt(gain * 0.5)) < 2e-2
    # normalize=False leaves counts
    z2 = PoissonNoise(gain=gain, normalize=False)(y, key=key)
    assert abs(float(z2.mean()) - 0.5 / gain) < 0.5


def test_poisson_gaussian(y, key):
    z = PoissonGaussianNoise(gain=0.05, sigma=0.05)(y, key=key)
    var = 0.05 * 0.5 + 0.05**2
    m, s = _stats(z, y)
    assert abs(m) < 3e-3 and abs(s - np.sqrt(var)) < 2e-2


def test_gamma_moments(y, key):
    z = GammaNoise(l=8.0)(y, key=key)
    m, s = _stats(z, y)
    # mean x, std x / sqrt(l)
    assert abs(m) < 5e-3 and abs(s - 0.5 / np.sqrt(8.0)) < 1e-2


def test_uniform_moments(y, key):
    z = UniformNoise(a=0.2)(y, key=key)
    d = np.asarray(z - y).ravel()
    assert d.min() >= -0.2 and d.max() <= 0.2
    assert abs(d.std() - 0.2 / np.sqrt(3)) < 5e-3


def test_uniform_gaussian(y, key):
    n = UniformGaussianNoise(sigma_min=0.05, sigma_max=0.3)
    z = n(y, key=key)
    # per-sample sigmas differ -> per-sample stds spread out
    stds = np.asarray(z - y).reshape(SHAPE[0], -1).std(axis=1)
    assert stds.min() >= 0.02 and stds.max() <= 0.35 and stds.std() > 0.01


def test_salt_pepper(y, key):
    n = SaltPepperNoise(p=0.1, s=0.1)
    z = np.asarray(n(y, key=key)).ravel()
    frac0 = (z == 0.0).mean()
    frac1 = (z == 1.0).mean()
    assert abs(frac0 - 0.1) < 0.02 and abs(frac1 - 0.1) < 0.02


def test_rician_positive(y, key):
    z = RicianNoise(sigma=0.1)(y, key=key)
    assert float(z.min()) >= 0.0
    m, s = _stats(z, y)
    assert abs(s - 0.1) < 0.05


def test_laplace_moments(y, key):
    z = LaplaceNoise(b=0.1)(y, key=key)
    m, s = _stats(z, y)
    assert abs(m) < 5e-3 and abs(s - 0.1 * np.sqrt(2)) < 1e-2


def test_chain_algebra(y, key):
    """(n1 * n2)(y) composes; Gaussian * Gaussian sums variances in closed
    form (reference noise.py:49-66,273)."""
    g = GaussianNoise(sigma=0.06) * GaussianNoise(sigma=0.08)
    assert isinstance(g, GaussianNoise)
    assert np.allclose(float(g.sigma), 0.1)
    chained = PoissonNoise(gain=0.05) * GaussianNoise(sigma=0.05)
    z = chained(y, key=key)
    assert z.shape == y.shape and bool(jnp.isfinite(z).all())


def test_batched_sigma(key):
    """Per-sample (B,) noise levels broadcast over the batch (reference
    Gaussian sigma tensor support, noise.py:197)."""
    y = jnp.full((3, 1, 64, 64), 0.5, jnp.float32)
    sig = jnp.asarray([0.05, 0.1, 0.3])
    z = GaussianNoise(sigma=sig)(y, key=key)
    stds = np.asarray(z - y).reshape(3, -1).std(axis=1)
    assert np.allclose(stds, [0.05, 0.1, 0.3], atol=0.01)


def test_complex_gaussian(key):
    y = jnp.full((2, 1, 32, 32), 0.5 + 0.0j, jnp.complex64)
    z = GaussianNoise(sigma=0.1)(y, key=key)
    assert jnp.iscomplexobj(z)
    assert abs(float(jnp.std(z.real - y.real)) - 0.1) < 1e-2
    assert abs(float(jnp.std(z.imag)) - 0.1) < 1e-2


def test_noise_jit_and_vmap(y, key):
    n = GaussianNoise(sigma=0.1)
    z_eager = n(y, key=key)
    z_jit = jax.jit(lambda nm, v, k: nm(v, key=k))(n, y, key)
    assert np.allclose(z_eager, z_jit)
    # vmap over a batch of sigmas (a batch of *operators*)
    ns = GaussianNoise(sigma=jnp.asarray([0.05, 0.2]))
    batched = jax.vmap(lambda s, k: GaussianNoise(sigma=s)(y, key=k))(
        jnp.asarray([0.05, 0.2]), jax.random.split(key)
    )
    assert batched.shape == (2,) + y.shape
