"""Metrics (reference deepinv/tests/test_metric.py).

Closed-form checks for the distortion metrics, the Metric preprocessing
pipeline (complex_abs / norm_inputs / reduction / train_loss inversion —
reference loss/metric/metric.py:12-130), and perceptual-metric sanity
(better images score better).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepinv_tpu.loss.metric import (
    MAE,
    MSE,
    NMSE,
    PSNR,
    SNR,
    SSIM,
    L1L2,
    LpNorm,
    SpectralAngleMapper,
    ERGAS,
    cal_psnr,
)
from deepinv_tpu.loss.perceptual import (
    GMSD,
    HaarPSI,
    CosineSimilarity,
    BlurStrength,
    SharpnessIndex,
)


@pytest.fixture
def pair():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 3, 24, 24)), jnp.float32)
    noise = jnp.asarray(rng.normal(0, 0.1, x.shape), jnp.float32)
    return x + noise, x


def test_mse_mae_closed_form(pair):
    x_net, x = pair
    d = np.asarray(x_net - x)
    assert np.allclose(MSE()(x_net, x), (d**2).reshape(2, -1).mean(1), atol=1e-6)
    assert np.allclose(MAE()(x_net, x), np.abs(d).reshape(2, -1).mean(1), atol=1e-6)
    nmse = (d**2).reshape(2, -1).mean(1) / (np.asarray(x) ** 2).reshape(2, -1).mean(1)
    assert np.allclose(NMSE()(x_net, x), nmse, atol=1e-5)


def test_psnr_closed_form():
    x = jnp.zeros((1, 1, 8, 8))
    x_net = jnp.full((1, 1, 8, 8), 0.1)
    # mse = 0.01 -> psnr = 10 log10(1/0.01) = 20
    assert np.allclose(PSNR()(x_net, x), 20.0, atol=1e-4)
    assert np.allclose(cal_psnr(x_net, x), 20.0, atol=1e-4)


def test_snr_identity_is_infinite_ish(pair):
    x_net, x = pair
    assert float(jnp.min(SNR()(x, x))) > 60.0
    assert float(jnp.max(SNR()(x_net, x))) < 60.0


def test_ssim_bounds(pair):
    x_net, x = pair
    s_same = SSIM()(x, x)
    assert np.allclose(s_same, 1.0, atol=1e-5)
    s_noisy = SSIM()(x_net, x)
    assert float(jnp.max(s_noisy)) < 1.0 and float(jnp.min(s_noisy)) > 0.0


def test_lp_norms(pair):
    x_net, x = pair
    d = np.asarray(x_net - x).reshape(2, -1)
    # LpNorm is the UN-normalized ||d||_p^p (reference distortion.py:375)
    assert np.allclose(
        LpNorm(p=2)(x_net, x), np.linalg.norm(d, axis=1) ** 2, rtol=1e-4
    )
    assert np.allclose(
        LpNorm(p=1)(x_net, x), np.abs(d).sum(axis=1), rtol=1e-4
    )
    # onesided variant only penalizes positive parts
    pos = np.clip(d, 0.0, None)
    assert np.allclose(
        LpNorm(p=2, onesided=True)(x_net, x), (pos**2).sum(axis=1), rtol=1e-4
    )
    assert float(jnp.all(L1L2()(x_net, x) > 0))


def test_multispectral_metrics(pair):
    x_net, x = pair
    sam = SpectralAngleMapper()(x_net, x)
    assert sam.shape == (2,) and float(jnp.all(sam >= 0))
    assert np.allclose(SpectralAngleMapper()(x, x), 0.0, atol=1e-3)
    erg = ERGAS(factor=4)(x_net, x)
    assert float(jnp.all(erg >= 0)) and np.allclose(ERGAS(factor=4)(x, x), 0.0, atol=1e-4)


def test_metric_preprocessing_complex_abs():
    """complex_abs folds 2-channel real/imag into magnitude (metric.py:56)."""
    rng = np.random.default_rng(1)
    z = jnp.asarray(rng.normal(size=(2, 2, 8, 8)), jnp.float32)
    mag = jnp.sqrt(z[:, 0:1] ** 2 + z[:, 1:2] ** 2)
    m = MSE(complex_abs=True)
    assert np.allclose(m(z, jnp.zeros_like(z)), MSE()(mag, jnp.zeros_like(mag)), atol=1e-6)
    # complex dtype path
    zc = (z[:, 0:1] + 1j * z[:, 1:2]).astype(jnp.complex64)
    assert np.allclose(m(zc, jnp.zeros_like(zc)), MSE()(mag, jnp.zeros_like(mag)), atol=1e-6)


def test_metric_reduction_and_train_loss(pair):
    x_net, x = pair
    per_item = PSNR()(x_net, x)
    assert np.allclose(PSNR(reduction="mean")(x_net, x), per_item.mean(), atol=1e-5)
    assert np.allclose(PSNR(reduction="sum")(x_net, x), per_item.sum(), atol=1e-4)
    # higher-better metric inverted for training (metric.py train_loss)
    assert np.allclose(PSNR(train_loss=True)(x_net, x), -per_item, atol=1e-5)
    s = SSIM()(x_net, x)
    assert np.allclose(SSIM(train_loss=True)(x_net, x), 1.0 - s, atol=1e-6)


def test_norm_inputs(pair):
    x_net, x = pair
    m = MSE(norm_inputs="min_max")
    v = m(2.0 * x_net + 1.0, 2.0 * x + 1.0)
    assert np.allclose(v, m(x_net, x), atol=1e-6)  # affine-invariant


def test_perceptual_monotonic():
    """Perceptual metrics rank a mildly corrupted image better than a
    heavily corrupted one."""
    rng = np.random.default_rng(2)
    yy, xx = np.mgrid[0:32, 0:32] / 32.0
    x = jnp.asarray(
        np.stack([np.sin(6 * np.pi * xx), np.cos(4 * np.pi * yy), xx * yy]),
        jnp.float32,
    )[None]
    mild = x + jnp.asarray(rng.normal(0, 0.05, x.shape), jnp.float32)
    heavy = x + jnp.asarray(rng.normal(0, 0.4, x.shape), jnp.float32)
    for metric in (GMSD(),):  # lower better
        assert float(metric(mild, x)[0]) < float(metric(heavy, x)[0])
    for metric in (HaarPSI(), CosineSimilarity()):  # higher better
        assert float(metric(mild, x)[0]) > float(metric(heavy, x)[0])


def test_no_reference_metrics():
    """BlurStrength/SharpnessIndex rate a blurred image blurrier."""
    from deepinv_tpu.ops import gaussian_blur, conv2d

    yy, xx = np.mgrid[0:48, 0:48] / 48.0
    sharp = jnp.asarray((np.sin(4 * np.pi * xx) > 0).astype(np.float32))[None, None]
    blurred = conv2d(sharp, gaussian_blur(sigma=2.0), padding="replicate")
    bs = BlurStrength()
    assert float(bs(blurred)[0]) > float(bs(sharp)[0])
    si = SharpnessIndex()
    assert float(si(sharp)[0]) != float(si(blurred)[0])


def test_metrics_jit(pair):
    x_net, x = pair
    f = jax.jit(lambda a, b: (PSNR()(a, b), SSIM()(a, b)))
    p, s = f(x_net, x)
    assert np.allclose(p, PSNR()(x_net, x), atol=1e-5)
    assert np.allclose(s, SSIM()(x_net, x), atol=1e-6)
