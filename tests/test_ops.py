"""Functional kernels (reference deepinv/tests/test_physics_functional.py).

Direct regression tests for ops/: DCT/DST orthonormal round trips,
histogram(dd) vs numpy, thin-plate splines interpolate their control
points, MATLAB imresize invariants, product-convolution adjointness, and
random_choice distribution.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepinv_tpu.ops import (
    dct2,
    idct2,
    dst1,
    histogram,
    histogramdd,
    imresize_matlab,
    multiplier,
    product_convolution2d,
    product_convolution2d_adjoint,
    random_choice,
    ThinPlateSpline,
)


@pytest.fixture
def img():
    return jnp.asarray(
        np.random.default_rng(0).random((2, 3, 17, 19)), jnp.float32
    )


def test_dct2_roundtrip_and_parseval(img):
    c = dct2(img)
    back = idct2(c)
    assert np.allclose(back, img, atol=1e-5)
    # orthonormal: energy preserved
    assert np.isclose(float(jnp.sum(c**2)), float(jnp.sum(img**2)), rtol=1e-5)


def test_dst1_involution(img):
    """Orthonormal DST-I is its own inverse (reference dst.py)."""
    even = img[..., :16, :18]
    assert np.allclose(dst1(dst1(even)), even, atol=1e-5)
    assert np.isclose(
        float(jnp.sum(dst1(even) ** 2)), float(jnp.sum(even**2)), rtol=1e-5
    )


def test_histogram_matches_numpy():
    rng = np.random.default_rng(1)
    v = rng.normal(size=2000).astype(np.float32)
    ours, edges = histogram(jnp.asarray(v), bins=32, low=-3.0, upp=3.0)
    ours = np.asarray(ours)
    assert len(np.asarray(edges)) == 33
    ref, _ = np.histogram(v, bins=32, range=(-3.0, 3.0))
    # out-of-range handling may differ at the clip boundary; compare interior
    assert np.array_equal(ours[1:-1], ref[1:-1])


def test_histogramdd_matches_numpy():
    rng = np.random.default_rng(2)
    v = rng.random((500, 2)).astype(np.float32)
    ours, _ = histogramdd(
        jnp.asarray(v), bins=[8, 6], low=[0.0, 0.0], upp=[1.0, 1.0]
    )
    ours = np.asarray(ours)
    ref, _ = np.histogramdd(v, bins=(8, 6), range=((0, 1), (0, 1)))
    assert ours.shape == ref.shape
    assert np.abs(ours - ref).max() <= 1  # boundary-bin convention only
    assert ours.sum() == ref.sum()


def test_thin_plate_spline_interpolates():
    """TPS with alpha=0 passes exactly through its control points
    (reference functional/interp.py ThinPlateSpline)."""
    rng = np.random.default_rng(3)
    ctrl = jnp.asarray(rng.random((12, 2)), jnp.float32)
    vals = jnp.asarray(rng.random((12, 1)), jnp.float32)
    tps = ThinPlateSpline(alpha=0.0).fit(ctrl, vals)
    out = tps.transform(ctrl)
    assert np.allclose(np.asarray(out), np.asarray(vals), atol=1e-3)


def test_imresize_matlab_invariants(img):
    """Antialiased bicubic: constant images stay constant; downsampling
    halves each spatial dim (reference functional imresize, MATLAB-exact)."""
    const = jnp.ones((1, 1, 20, 24))
    down = imresize_matlab(const, scale=0.5)
    assert down.shape == (1, 1, 10, 12)
    assert np.allclose(np.asarray(down), 1.0, atol=1e-5)
    up = imresize_matlab(img, scale=2.0)
    assert up.shape == (2, 3, 34, 38)
    # mean approximately preserved
    assert abs(float(up.mean()) - float(img.mean())) < 1e-2


def test_multiplier_and_product_convolution_adjoint(img):
    w = jnp.asarray(np.random.default_rng(4).random((1, 1, 2, 17, 19)), jnp.float32)
    h = jnp.asarray(np.random.default_rng(5).random((1, 1, 2, 5, 5)), jnp.float32)
    x = img[:1, :1]
    y = product_convolution2d(x, w, h, padding="circular")
    # adjointness of the pair
    u = jnp.asarray(np.random.default_rng(6).random(y.shape), jnp.float32)
    lhs = float(jnp.vdot(y, u))
    rhs = float(jnp.vdot(x, product_convolution2d_adjoint(u, w, h, padding="circular")))
    assert abs(lhs - rhs) < 1e-2 * max(abs(lhs), 1.0)
    # multiplier is elementwise
    assert np.allclose(multiplier(x, w[:, :, 0]), x * w[:, :, 0], atol=1e-6)


def test_random_choice_distribution(key):
    """random_choice honors the probability vector (reference
    functional/random_choice, numpy semantics)."""
    p = jnp.asarray([0.7, 0.2, 0.1])
    draws = random_choice(key, 3, shape=(5000,), p=p)
    freq = np.bincount(np.asarray(draws), minlength=3) / 5000.0
    assert np.abs(freq - np.asarray(p)).max() < 0.03


def test_conv3d_spatial_adjointness(key):
    """Spatial conv3d/conv_transpose3d are exact adjoints for all five
    padding modes (reference functional/convolution.py conv3d)."""
    from deepinv_tpu.ops import conv3d, conv_transpose3d

    x = jax.random.normal(key, (2, 1, 7, 9, 8))
    f = jax.random.normal(jax.random.fold_in(key, 1), (1, 1, 3, 3, 3))
    for pad in ["valid", "circular", "replicate", "reflect", "constant"]:
        y = conv3d(x, f, padding=pad)
        u = jax.random.normal(jax.random.fold_in(key, 2), x.shape)
        v = jax.random.normal(jax.random.fold_in(key, 3), y.shape)
        lhs = jnp.vdot(conv3d(u, f, padding=pad), v)
        rhs = jnp.vdot(u, conv_transpose3d(v, f, padding=pad))
        assert abs(float(lhs - rhs)) < 1e-3, (pad, float(lhs - rhs))


def test_functional_namespace(key):
    """deepinv.physics.functional parity surface: 1D DCT matches scipy,
    liu_jia_pad smooths the wrap-around boundary, tiled multipliers form a
    partition of unity, Radon wrappers round-trip."""
    from scipy.fftpack import dct as sdct

    import deepinv_tpu.physics.functional as F

    x = np.asarray(jax.random.uniform(key, (2, 16)))
    for norm in (None, "ortho"):
        ours = np.asarray(F.dct(jnp.asarray(x), norm=norm))
        np.testing.assert_allclose(ours, sdct(x, type=2, norm=norm),
                                   rtol=1e-4, atol=1e-5)
        back = np.asarray(F.idct(F.dct(jnp.asarray(x), norm=norm), norm=norm))
        np.testing.assert_allclose(back, x, rtol=1e-4, atol=1e-5)

    img = jax.random.uniform(jax.random.fold_in(key, 1), (1, 1, 24, 20))
    z = F.liu_jia_pad(img, padding=(6, 5))
    assert z.shape == (1, 1, 36, 30)
    # boundary smoothing: wrap-around jump shrinks by >5x
    orig = float(jnp.abs(img[..., 0, :] - img[..., -1, :]).mean())
    padded = float(jnp.abs(z[..., 0, :] - z[..., -1, :]).mean())
    assert padded < orig / 5, (orig, padded)
    with pytest.raises(ValueError):
        F.liu_jia_pad(img, padding=(6, 0))

    m = np.asarray(F.generate_tiled_multipliers(32, 16, 8))
    assert m.shape == (1, 1, 9, 16, 16)
    # reassembled masks sum to ~1 everywhere (partition of unity)
    total = np.zeros((32, 32))
    k = 0
    for i in range(3):
        for j in range(3):
            total[i * 8 : i * 8 + 16, j * 8 : j * 8 + 16] += m[0, 0, k]
            k += 1
    # the bump window vanishes at the outer image border (same in the
    # reference: masks are normalized with a +1e-8 guard), so check the
    # interior
    np.testing.assert_allclose(total[1:-1, 1:-1], 1.0, atol=1e-3)

    # multiplier adjointness (complex)
    u = jax.random.normal(key, (2, 1, 8, 8)) + 1j * jax.random.normal(
        jax.random.fold_in(key, 2), (2, 1, 8, 8))
    w = jax.random.normal(jax.random.fold_in(key, 3), (2, 1, 8, 8)) + 1j
    lhs = jnp.vdot(F.multiplier(u, w), u)
    rhs = jnp.vdot(u, F.multiplier_adjoint(u, w))
    assert abs(complex(lhs - rhs)) < 1e-3

    # Radon wrapper round trip
    theta = jnp.arange(0.0, 180.0, 6.0)
    R, Ri = F.Radon(theta=theta), F.IRadon(in_size=24, theta=theta)
    im = jax.random.uniform(jax.random.fold_in(key, 4), (1, 1, 24, 24))
    rec = Ri(R(im))
    assert rec.shape == im.shape


def test_wavelet_3d_transform(key):
    """wvdim=3 (reference models/wavdict.py:68): perfect reconstruction on
    odd volumes, 7 detail bands per level, Parseval energy (orthonormal),
    and 3D soft-thresholding denoising beats the noisy input."""
    import jax
    import jax.numpy as jnp
    from deepinv_tpu.ops.wavelets import WaveletTransform
    from deepinv_tpu.models import WaveletDenoiser

    wt3 = WaveletTransform("db2", level=2, ndim=3)
    v = jax.random.normal(key, (1, 1, 9, 19, 13))
    t = wt3.dwt2(v)
    assert len(t["coeffs"][1]) == 7
    assert float(jnp.max(jnp.abs(wt3.idwt2(t) - v))) < 1e-5

    v2 = jax.random.normal(jax.random.fold_in(key, 1), (1, 1, 8, 16, 12))
    t2 = wt3.dwt2(v2)
    e = float(jnp.sum(t2["coeffs"][0] ** 2) + jnp.sum(wt3.flat_coeffs(t2) ** 2))
    assert abs(e - float(jnp.sum(v2**2))) / float(jnp.sum(v2**2)) < 1e-5

    den = WaveletDenoiser("db2", level=2, wvdim=3)
    clean = jnp.zeros((1, 1, 8, 32, 32)).at[:, :, 2:6, 8:24, 8:24].set(1.0)
    noisy = clean + 0.2 * jax.random.normal(jax.random.fold_in(key, 2), clean.shape)
    out = den(noisy, 0.2)
    assert float(jnp.mean((out - clean) ** 2)) < 0.5 * float(
        jnp.mean((noisy - clean) ** 2)
    )
