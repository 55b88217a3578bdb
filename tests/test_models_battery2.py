"""Models battery wave 2 — the reference's operator-level denoiser tests:
finite-difference adjoints over 2D/3D (reference test_models.py
test_TVs_adjoint), the identity limit of TV/wavelet denoisers as the
threshold vanishes (test_TV_models_identity / test_wavelet_models_identity),
TGV/TVL1 behavior, RAM scale handling (test_ram_scale) and the ConvDecoder
latent contract.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepinv_tpu.models import (
    TGVDenoiser,
    TVDenoiser,
    TVL1Denoiser,
    WaveletDenoiser,
    WaveletDictDenoiser,
)

from conftest import assert_close


# --------------------------------------------------- nabla adjoint matrix --
@pytest.mark.parametrize("n_spatial", [2, 3])
def test_tv_nabla_adjoint(n_spatial, key):
    """<nabla u, v> == <u, nabla' v> on odd-sized 2D and 3D volumes
    (reference test_models.py test_TVs_adjoint)."""
    shape = (2, 1, 9, 7) if n_spatial == 2 else (1, 1, 5, 9, 7)
    ku, kv = jax.random.split(key)
    u = jax.random.normal(ku, shape)
    gu = TVDenoiser.nabla(u)
    assert gu.shape == shape + (n_spatial,)
    v = jax.random.normal(kv, gu.shape)
    lhs = float(jnp.vdot(gu, v))
    rhs = float(jnp.vdot(u, TVDenoiser.nabla_adjoint(v)))
    assert lhs == pytest.approx(rhs, rel=1e-5)


def test_tv_nabla_rejects_bad_rank(key):
    with pytest.raises(ValueError):
        TVDenoiser.nabla(jnp.zeros((3, 3)))
    with pytest.raises(ValueError):
        TVDenoiser.nabla_adjoint(jnp.zeros((3, 3, 3)))


# ---------------------------------------------------------- identity limit --
def _step_image(key, shape=(1, 1, 16, 16), sigma=0.1):
    x = jnp.zeros(shape).at[..., shape[-2] // 2:, :].set(1.0)
    return x, x + sigma * jax.random.normal(key, shape)


@pytest.mark.parametrize("den_fn", [
    lambda: TVDenoiser(n_it_max=100),
    lambda: TVL1Denoiser(n_it_max=100),
    lambda: TGVDenoiser(n_it_max=100),
])
def test_tv_family_identity_at_zero_threshold(den_fn, key):
    """With a vanishing regularization threshold every TV-family prox
    reduces to (near) identity (reference test_TV_models_identity)."""
    _, noisy = _step_image(key)
    out = den_fn()(noisy, 1e-7)
    assert_close(out, noisy, rtol=1e-2, atol=1e-3)


@pytest.mark.parametrize("den_fn", [
    lambda: TVDenoiser(n_it_max=200),
    lambda: TGVDenoiser(n_it_max=200),
])
def test_tv_family_denoises_step(den_fn, key):
    """At a sensible threshold the L2-fidelity TV denoisers strictly
    improve MSE on a noisy piecewise-constant image."""
    x, noisy = _step_image(key)
    out = den_fn()(noisy, 0.1)
    assert float(jnp.mean((out - x) ** 2)) < float(jnp.mean((noisy - x) ** 2))


def test_tvl1_denoises_salt_pepper(key):
    """TVL1's L1 fidelity is contrast-invariant: it leaves small Gaussian
    perturbations alone (so no Gaussian test here) but removes impulse
    noise almost exactly (reference tv.py:221 'robust to outliers')."""
    k1, k2 = jax.random.split(key)
    x = jnp.zeros((1, 1, 16, 16)).at[..., 8:, :].set(1.0)
    m = jax.random.uniform(k1, x.shape) < 0.1
    noisy = jnp.where(m, jax.random.bernoulli(k2, 0.5, x.shape).astype(x.dtype), x)
    out = TVL1Denoiser(n_it_max=500)(noisy, 1.0)
    assert float(jnp.mean((out - x) ** 2)) < 0.05 * float(
        jnp.mean((noisy - x) ** 2))


@pytest.mark.parametrize("wv", ["haar", "db4"])
def test_wavelet_identity_at_zero_threshold(wv, key):
    """Zero threshold keeps every wavelet coefficient: perfect
    reconstruction (reference test_wavelet_models_identity)."""
    x = jax.random.normal(key, (1, 1, 16, 16))
    out = WaveletDenoiser(wv=wv, level=2)(x, 0.0)
    assert_close(out, x, rtol=1e-4, atol=1e-5)


def test_wavelet_dict_identity_at_zero_threshold(key):
    x = jax.random.normal(key, (1, 1, 16, 16))
    out = WaveletDictDenoiser(list_wv=("haar", "db2"), max_iter=4)(x, 0.0)
    assert_close(out, x, rtol=1e-3, atol=1e-4)


def test_wavelet_threshold_monotone(key):
    """Larger thresholds remove strictly more energy."""
    x = jax.random.normal(key, (1, 1, 16, 16))
    den = WaveletDenoiser(wv="db4", level=2)
    e = [float(jnp.sum((den(x, t) - x) ** 2)) for t in (0.01, 0.1, 0.5)]
    assert e[0] < e[1] < e[2]


# ------------------------------------------------------------- ConvDecoder --
def test_convdecoder_latent_contract(key):
    from deepinv_tpu.models import ConvDecoder

    dec = ConvDecoder(img_shape=(3, 24, 20), in_size=(4, 4), channels=8,
                      layers=3, key=key)
    z = jax.random.normal(key, dec.latent_shape(batch=2))
    out = dec(z)
    assert out.shape == (2, 3, 24, 20)
    assert 0.0 <= float(jnp.min(out)) and float(jnp.max(out)) <= 1.0


# ------------------------------------------------------------------- RAM --
@pytest.mark.parametrize("use_physics", [False, True])
def test_ram_scale_invariance_api(use_physics, key):
    """RAM accepts raw images (denoiser mode) and (y, physics) pairs
    (reconstructor mode) at any input scale (reference test_ram_scale)."""
    from deepinv_tpu.models import RAM
    from deepinv_tpu.physics import Denoising, GaussianNoise

    ram = RAM(in_channels=[1], nc=(8, 8, 8, 8), nb=1, pretrained=None)
    x = jax.random.uniform(key, (1, 1, 32, 32))
    for scale in (1.0, 10.0):
        if use_physics:
            p = Denoising(noise_model=GaussianNoise(0.05))
            out = ram(scale * x, p)
        else:
            out = ram(scale * x, sigma=0.05)
        assert out.shape == x.shape
        assert np.isfinite(np.asarray(out)).all()


# ------------------------------------------------------- sandwich kernel --
def test_fused_up_sandwich_matches_lax(key):
    """The Pallas 'sandwich' kernel (up2 projection + scale-1 chain + skip
    down-projection + up1 projection + scale-0 chain, interpret mode)
    matches the pure XLA f32 reference, and custom_vjp gradients flow."""
    from deepinv_tpu.ops.pallas.resblock_chain import (
        _lax_sandwich_f32, fused_up_sandwich_folded)

    k = jax.random.split(key, 9)
    Ci2, H2s, W2s = 16, 4, 4
    s2 = jax.random.normal(k[0], (1, H2s, W2s, Ci2), jnp.bfloat16)
    vd = jax.random.normal(k[1], (1, 4 * H2s, 2 * W2s, 128), jnp.bfloat16)
    w_up2 = jax.random.normal(k[2], (Ci2, 128, 2, 2)) * 0.1
    w1s1 = jax.random.normal(k[3], (2, 128, 128, 3, 3)) * 0.03
    w2s1 = jax.random.normal(k[4], (2, 128, 128, 3, 3)) * 0.03
    w_down = jax.random.normal(k[5], (128, 64, 2, 2)) * 0.05
    w_up1 = jax.random.normal(k[6], (128, 64, 2, 2)) * 0.1
    w1s = jax.random.normal(k[7], (2, 64, 64, 3, 3)) * 0.05
    w2s = jax.random.normal(k[8], (2, 64, 64, 3, 3)) * 0.05
    args = (s2, vd, w_up2, w1s1, w2s1, w_down, w_up1, w1s, w2s)

    got = fused_up_sandwich_folded(*args, True)
    want = _lax_sandwich_f32(*args)
    assert got.shape == (1, 4 * H2s, 2 * W2s, 128)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want)))
    scale = float(jnp.max(jnp.abs(want))) + 1e-9
    assert err / scale < 2e-2, err / scale

    loss = lambda *a: jnp.sum(
        fused_up_sandwich_folded(*a, True).astype(jnp.float32))
    loss_ref = lambda *a: jnp.sum(_lax_sandwich_f32(*a))
    gs = jax.grad(loss, argnums=(0, 2, 7))(*args)
    gr = jax.grad(loss_ref, argnums=(0, 2, 7))(*args)
    for a, b in zip(gs, gr):
        e = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b)))
        s = float(jnp.max(jnp.abs(b))) + 1e-9
        assert e / s < 3e-2, e / s
