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
    x = (x + 1.0) / 2.0  # HaarPSI requires [0, 1] inputs
    mild = jnp.clip(x + jnp.asarray(rng.normal(0, 0.05, x.shape), jnp.float32), 0, 1)
    heavy = jnp.clip(x + jnp.asarray(rng.normal(0, 0.4, x.shape), jnp.float32), 0, 1)
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


@pytest.mark.slow
def test_metrics_match_reference():
    """Full-reference and no-reference metrics match the torch reference
    numerically on random images (loss/metric/{distortion,perceptual}.py):
    L1L2, GMSD, HaarPSI (color/gray, both parameterizations),
    CosineSimilarity, RecoveryCoefficient, BlurStrength, SharpnessIndex."""
    import sys
    from test_generators import _import_reference
    _import_reference()
    import torch
    import deepinv.loss.metric as RM
    import deepinv_tpu.loss.metric as JM
    import deepinv_tpu.loss.perceptual as JP

    rng = np.random.RandomState(0)
    x = rng.rand(2, 3, 33, 31).astype(np.float32)
    y = np.clip(x + 0.1 * rng.randn(2, 3, 33, 31).astype(np.float32), 0, 1)
    tx, ty = torch.tensor(x), torch.tensor(y)
    jx, jy = jnp.asarray(x), jnp.asarray(y)

    def cmp(r, j, tol):
        np.testing.assert_allclose(np.asarray(r.detach()), np.asarray(j),
                                   atol=tol)

    cmp(RM.L1L2()(ty, tx), JM.L1L2()(jy, jx), 1e-6)
    cmp(RM.GMSD()(ty, tx), JP.GMSD()(jy, jx), 1e-5)
    cmp(RM.HaarPSI()(ty, tx), JP.HaarPSI()(jy, jx), 1e-4)
    cmp(RM.HaarPSI(C=30, alpha=4.2, preprocess_with_subsampling=False)(ty, tx),
        JP.HaarPSI(C=30, alpha=4.2, preprocess_with_subsampling=False)(jy, jx),
        1e-4)
    cmp(RM.HaarPSI()(ty[:, :1], tx[:, :1]),
        JP.HaarPSI()(jy[:, :1], jx[:, :1]), 1e-4)
    cmp(RM.CosineSimilarity()(ty, tx), JP.CosineSimilarity()(jy, jx), 1e-6)
    mask = (rng.rand(2, 3, 33, 31) > 0.5).astype(np.float32)
    cmp(RM.RecoveryCoefficient()(ty, tx, mask=torch.tensor(mask)),
        JP.RecoveryCoefficient()(jy, jx, mask=jnp.asarray(mask)), 1e-5)
    cmp(RM.BlurStrength()(ty), JP.BlurStrength()(jy), 1e-5)
    cmp(RM.SharpnessIndex()(ty), JP.SharpnessIndex()(jy), 3e-2)


@pytest.mark.slow
def test_ergas_ssim_match_torchmetrics_formula():
    """ERGAS and SSIM reproduce the torchmetrics formulas the reference
    wraps (100*ratio ERGAS scaling; gaussian-11/1.5 valid-region SSIM)."""
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    x = rng.rand(2, 3, 64, 64).astype(np.float32)
    y = np.clip(x + 0.1 * rng.randn(2, 3, 64, 64).astype(np.float32), 0, 1)
    tx, ty = torch.tensor(x), torch.tensor(y)
    jx, jy = jnp.asarray(x), jnp.asarray(y)

    b, c, h, w = ty.shape
    diff = (ty - tx).reshape(b, c, -1)
    rmse = torch.sqrt((diff * diff).sum(2) / (h * w))
    mean_t = tx.reshape(b, c, -1).mean(2)
    ref_ergas = 100 * 4 * torch.sqrt((((rmse / mean_t) ** 2).sum(1)) / c)
    np.testing.assert_allclose(np.asarray(ERGAS(factor=4)(jy, jx)),
                               ref_ergas.numpy(), atol=1e-3)

    k, sigma, pad = 11, 1.5, 5
    coords = torch.arange(k, dtype=torch.float32) - (k - 1) / 2
    g = torch.exp(-(coords**2) / (2 * sigma**2))
    g = g / g.sum()
    kernel = (g[:, None] @ g[None, :]).expand(c, 1, k, k)
    pp = F.pad(ty, (pad,) * 4, mode="reflect")
    tt = F.pad(tx, (pad,) * 4, mode="reflect")
    conv = lambda v: F.conv2d(v, kernel, groups=c)
    mu1, mu2 = conv(pp), conv(tt)
    s1 = conv(pp * pp) - mu1**2
    s2 = conv(tt * tt) - mu2**2
    s12 = conv(pp * tt) - mu1 * mu2
    c1, c2 = 0.01**2, 0.03**2
    m = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
        (mu1**2 + mu2**2 + c1) * (s1 + s2 + c2))
    ref_ssim = m[..., pad:-pad, pad:-pad].reshape(b, -1).mean(-1)
    np.testing.assert_allclose(np.asarray(SSIM()(jy, jx)), ref_ssim.numpy(),
                               atol=1e-5)


def test_norm_inputs_l2_per_plane():
    """norm_inputs='l2' normalizes each (batch, channel) spatial plane by
    its root-sum-of-squares (reference metric/functional.py:4)."""
    from deepinv_tpu.loss import MSE

    x = jax.random.uniform(jax.random.key(0), (2, 2, 8, 8))
    y = jax.random.uniform(jax.random.key(1), (2, 2, 8, 8))
    xn = np.asarray(x); yn = np.asarray(y)
    norm = lambda v: v / np.sqrt((v**2).sum(axis=(-2, -1), keepdims=True))
    want = ((norm(xn) - norm(yn)) ** 2).reshape(2, -1).mean(1)
    got = np.asarray(MSE(norm_inputs="l2")(x, y))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_metric_kwargs_reference_values():
    """Exact option semantics against the reference's hand-computed values
    (reference test_metric.py:test_metric_kwargs)."""
    from deepinv_tpu.loss.metric import MSE

    xh = jnp.array([[1.0, 1.0], [2.0, 2.0], [4.0, 4.0]])
    x0 = jnp.zeros_like(xh)
    assert float(MSE(reduction="mean")(xh, x0)) == 7.0
    assert float(MSE(reduction="sum")(xh, x0)) == 21.0
    assert np.allclose(np.asarray(MSE(reduction="none")(xh, x0)),
                       [1.0, 4.0, 16.0])

    xh2 = jnp.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]])
    assert np.allclose(np.asarray(MSE(norm_inputs="min_max")(xh2, x0)),
                       [0.5, 0.5, 0.5])
    x2 = jnp.array([[0.0, 1.0], [2.0, 3.0], [4.0, 5.0]])
    assert np.allclose(np.asarray(MSE(norm_inputs="l2")(xh2, x2)),
                       [0.0083, 0.0011, 0.0011], atol=1e-4)

    xc = jnp.array([[1.0 + 1.0j, 2.0 + 2.0j]])
    assert np.allclose(np.asarray(MSE(complex_abs=True)(xc, xc * 0)), [5.0],
                       atol=1e-5)
    xh3 = jnp.ones((1, 2, 1))
    assert np.allclose(np.asarray(MSE(complex_abs=True)(xh3, xh3 * 0)),
                       [2.0], atol=1e-5)
    assert np.allclose(np.asarray(MSE(complex_abs=False)(xh3, xh3 * 0)),
                       [1.0])
    # train_loss is a no-op for lower-is-better metrics
    assert np.allclose(np.asarray(MSE(train_loss=True)(xh3, xh3 * 0)), [1.0])


def test_center_crop_semantics():
    """center_crop int / tuple semantics (reference test_center_crop)."""
    from deepinv_tpu.loss.metric import MSE

    x = jnp.ones((2, 3, 32, 32))
    xz = jnp.zeros_like(x)
    assert np.allclose(np.asarray(MSE(center_crop=16)(xz, x)), [1.0, 1.0])
    assert np.allclose(np.asarray(MSE(center_crop=(8, 8))(xz, x)),
                       [1.0, 1.0])


def test_snr_power_ratios():
    """SNR closed form 10 log10(Ps/Pn) (reference test_snr); at zero noise
    the class metric returns a large finite value (epsilon-clamped for
    jit-safety) rather than the functional's +inf."""
    from deepinv_tpu.loss.metric import SNR
    import math

    for ps, pn in [(1.0, 1.0), (10.0, 1.0), (1.0, 10.0), (10.0, 10.0)]:
        xs = jnp.full((1, 1, 16, 16), math.sqrt(ps))
        ys = xs + math.sqrt(pn)
        got = float(np.asarray(SNR()(ys, xs)).ravel()[0])
        assert abs(got - 10 * math.log10(ps / pn)) < 1e-3, (ps, pn, got)
    xs = jnp.full((1, 1, 16, 16), 1.0)
    assert float(np.asarray(SNR()(xs, xs)).ravel()[0]) > 100.0
