"""Metric battery: the reference's universal full-/no-reference sweeps
(deepinv/tests/test_metric.py:121/:213) — every metric through one battery:
worse image => worse value under train_loss, metric addition, reduction
variants, complex-magnitude preprocessing, kwarg tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import deepinv_tpu.loss as L

_FULL_REFERENCE = {
    "MSE": lambda **k: L.MSE(**k),
    "NMSE": lambda **k: L.NMSE(**k),
    "MAE": lambda **k: L.MAE(**k),
    "PSNR": lambda **k: L.PSNR(**k),
    "SSIM": lambda **k: L.SSIM(**k),
    "LpNorm": lambda **k: L.LpNorm(**k),
    "L1L2": lambda **k: L.L1L2(**k),
    "GMSD": lambda **k: L.GMSD(**k),
    "HaarPSI": lambda **k: L.HaarPSI(**k),
    "CosineSimilarity": lambda **k: L.CosineSimilarity(**k),
}
_MULTICHANNEL = {
    "SAM": lambda **k: L.SpectralAngleMapper(**k),
    "ERGAS": lambda **k: L.ERGAS(factor=2, **k),
}
# NIQE needs user-supplied GMM weights in this zero-egress environment
# (fit with create_weights); its fitted path is covered in test_metric.py
_NO_REFERENCE = {
    "SharpnessIndex": lambda **k: L.SharpnessIndex(**k),
    "BlurStrength": lambda **k: L.BlurStrength(**k),
}


def _img(key, channels=1):
    H = W = 32
    yy, xx = jnp.mgrid[0:H, 0:W]
    x = ((yy - 16) ** 2 / 64 + (xx - 16) ** 2 / 49 < 1).astype(jnp.float32)
    x = jnp.broadcast_to(x[None, None], (1, channels, H, W)) * 0.7 + 0.1
    return x + 0.01 * jax.random.normal(key, x.shape)


@pytest.mark.parametrize("name", sorted(_FULL_REFERENCE))
def test_full_reference_sweep(name, key):
    """Universal battery (reference test_full_reference_metrics:121):
    train_loss orients every metric lower-is-better; metric addition and
    reduction='none' work; extra kwargs are tolerated."""
    x = _img(key)
    x_hat = x + 0.1 * jax.random.normal(jax.random.key(1), x.shape)
    if name == "HaarPSI":  # HaarPSI requires [0, 1] inputs
        x = jnp.clip(x, 0.0, 1.0)
        x_hat = jnp.clip(x_hat, 0.0, 1.0)

    m = _FULL_REFERENCE[name](train_loss=True)
    worse = float(jnp.sum(m(x_hat, x)))
    perfect = float(jnp.sum(m(x, x)))
    assert worse > perfect - 1e-6, (name, worse, perfect)

    # kwargs tolerated (the Trainer passes model=... through)
    v = m(x_hat, x, model=None, some_other_kwarg=1)
    assert bool(jnp.all(jnp.isfinite(v))), name

    # metric addition
    dummy = L.Metric(metric=lambda a, b, **kw: jnp.ones(a.shape[0]))
    m2 = m + dummy
    s = float(jnp.sum(m2(x_hat, x)) - jnp.sum(m(x_hat, x)))
    assert abs(s - x.shape[0]) < 1e-5, name

    # reduction none -> per-batch values
    m3 = _FULL_REFERENCE[name](reduction="none")
    xb = jnp.concatenate([x_hat] * 3)
    vals = m3(xb, jnp.concatenate([x] * 3))
    assert vals.shape == (3,), name


@pytest.mark.parametrize("name", sorted(_MULTICHANNEL))
def test_multichannel_metric_sweep(name, key):
    """SAM/ERGAS on multispectral inputs (reference channels>=3 gate)."""
    x = _img(key, channels=4)
    x_hat = x + 0.05 * jax.random.normal(jax.random.key(1), x.shape)
    m = _MULTICHANNEL[name](train_loss=True)
    worse = float(jnp.sum(m(x_hat, x)))
    perfect = float(jnp.sum(m(x, x)))
    assert worse >= perfect - 1e-6, (name, worse, perfect)


@pytest.mark.parametrize("name", sorted(_NO_REFERENCE))
def test_no_reference_sweep(name, key):
    """No-reference metrics evaluate on a lone image, batched, finite
    (reference test_no_reference_metrics:213)."""
    x = _img(key)
    m = _NO_REFERENCE[name]()
    v = m(x)
    assert bool(jnp.all(jnp.isfinite(v))), name
    xb = jnp.concatenate([x, x * 0.5])
    m_none = _NO_REFERENCE[name](reduction="none")
    vb = m_none(xb)
    assert vb.shape == (2,), name


def test_complex_abs_two_channel(key):
    """complex_abs folds a 2-channel real/imag pair into a magnitude image
    before the metric (reference channels==2 path)."""
    kr, ki = jax.random.split(key)
    re = _img(kr)
    im = 0.3 * _img(ki)
    x2 = jnp.concatenate([re, im], axis=1)  # (1, 2, H, W)
    mag = jnp.sqrt(re ** 2 + im ** 2)
    a = float(jnp.sum(L.PSNR(complex_abs=True)(x2, x2 * 0.9)))
    b = float(jnp.sum(L.PSNR()(mag, jnp.abs(
        (x2 * 0.9)[:, :1] + 1j * (x2 * 0.9)[:, 1:]))))
    assert abs(a - b) < 1e-3


def test_center_crop_metric(key):
    """center_crop restricts the metric to the interior window (reference
    test_center_crop:382): corrupting only the border then leaves the
    cropped metric at its perfect value."""
    x = _img(key)
    x_border = x.at[..., :4, :].set(0.0)
    m = L.MSE(center_crop=(16, 16))
    v = float(jnp.sum(m(x_border, x)))
    assert abs(v) < 1e-10
    v_full = float(jnp.sum(L.MSE()(x_border, x)))
    assert v_full > 1e-6
