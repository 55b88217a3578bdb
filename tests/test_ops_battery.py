"""Functional-ops battery: the reference's parametrized conv/imresize
sweeps (deepinv/tests/test_physics_functional.py) — adjointness over every
padding mode x batched filters, spatial vs FFT equivalence, 3D conv norm,
imresize kernel x scale x antialiasing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepinv_tpu.ops import (conv2d, conv2d_fft, conv3d, conv3d_fft,
                             conv_transpose2d, conv_transpose2d_fft,
                             conv_transpose3d, gaussian_blur,
                             imresize_matlab)

PADDINGS = ["valid", "circular", "reflect", "replicate", "constant"]


@pytest.mark.parametrize("padding", PADDINGS)
@pytest.mark.parametrize("batch_filter", [False, True])
def test_conv2d_adjointness_sweep(padding, batch_filter, key):
    """<conv(x,h), y> == <x, conv_T(y,h)> for every padding and both
    shared/batched filters (reference test_conv2d_adjointness:19)."""
    kx, kh, ky = jax.random.split(key, 3)
    B, C, H, W = 2, 3, 16, 15
    x = jax.random.normal(kx, (B, C, H, W))
    h = jax.random.normal(kh, (B if batch_filter else 1, 1, 5, 5))
    y = conv2d(x, h, padding=padding)
    u = jax.random.normal(ky, y.shape)
    lhs = float(jnp.vdot(y, u))
    rhs = float(jnp.vdot(x, conv_transpose2d(u, h, padding=padding)))
    assert abs(lhs - rhs) < 1e-3 * max(1.0, abs(lhs)), (padding, lhs, rhs)


@pytest.mark.parametrize("padding", ["circular"])
def test_conv2d_spatial_fft_equivalence(padding, key):
    """FFT and spatial convolutions agree where both are defined
    (reference test_conv2d_spatial_and_fft_equivalence:67)."""
    kx, kh = jax.random.split(key)
    x = jax.random.normal(kx, (1, 3, 16, 16))
    h = gaussian_blur(sigma=1.2)
    a = conv2d(x, h, padding=padding)
    b = conv2d_fft(x, h, padding=padding)
    assert a.shape == b.shape
    assert float(jnp.max(jnp.abs(a - b))) < 1e-4

    # and their transposes
    u = jax.random.normal(kh, a.shape)
    at = conv_transpose2d(u, h, padding=padding)
    bt = conv_transpose2d_fft(u, h, padding=padding)
    assert float(jnp.max(jnp.abs(at - bt))) < 1e-4


@pytest.mark.parametrize("padding", PADDINGS)
def test_conv3d_adjointness_sweep(padding, key):
    """3D conv adjointness across paddings (reference
    test_conv3d_adjointness:113)."""
    kx, kh, ky = jax.random.split(key, 3)
    x = jax.random.normal(kx, (1, 1, 8, 12, 11))
    h = jax.random.normal(kh, (1, 1, 3, 3, 3))
    y = conv3d(x, h, padding=padding)
    u = jax.random.normal(ky, y.shape)
    lhs = float(jnp.vdot(y, u))
    rhs = float(jnp.vdot(x, conv_transpose3d(u, h, padding=padding)))
    assert abs(lhs - rhs) < 1e-3 * max(1.0, abs(lhs)), (padding, lhs, rhs)


def test_conv3d_norm_is_contraction_for_normalized_kernel(key):
    """A normalized (sum=1) nonnegative 3D blur has operator norm <= 1 in
    circular mode (reference test_conv3d_norm:162): power-iterate it."""
    kh, kx = jax.random.split(key)
    h = jnp.abs(jax.random.normal(kh, (1, 1, 3, 3, 3)))
    h = h / jnp.sum(h)
    v = jax.random.normal(kx, (1, 1, 8, 8, 8))
    for _ in range(20):
        v = conv_transpose3d(conv3d(v, h, padding="circular"), h,
                             padding="circular")
        v = v / jnp.linalg.norm(v)
    sigma2 = float(jnp.vdot(v, conv_transpose3d(
        conv3d(v, h, padding="circular"), h, padding="circular")))
    assert sigma2 <= 1.0 + 1e-4, sigma2


@pytest.mark.parametrize("scale", [0.5, 2.0, 0.25])
@pytest.mark.parametrize("by_shape", [False, True])
def test_imresize_sweep(scale, by_shape, key):
    """MATLAB-convention imresize over scales and both the scale / target-
    shape call forms: shape contract, constancy preservation (reference
    test_imresize:245 — the MATLAB bicubic+antialias kernel)."""
    x = jnp.ones((1, 1, 16, 16)) * 0.5
    hw = (int(16 * scale), int(16 * scale))
    if by_shape:
        out = imresize_matlab(x, out_shape=hw)
    else:
        out = imresize_matlab(x, scale=scale)
    assert out.shape[-2:] == hw
    # resizing a constant image stays (almost) constant
    assert float(jnp.max(jnp.abs(out - 0.5))) < 1e-3

    kx = jax.random.split(key, 1)[0]
    xr = jax.random.uniform(kx, (1, 3, 16, 16))
    outr = imresize_matlab(xr, scale=scale)
    assert bool(jnp.all(jnp.isfinite(outr)))


@pytest.mark.parametrize("sigma,angle", [(1.0, 0.0), ((2.0, 0.5), 30.0)])
def test_gaussian_blur_psf_invariants(sigma, angle):
    """Gaussian PSFs are normalized, nonnegative, centered (reference
    test_gaussian_blur_non_regression:290)."""
    h = np.asarray(gaussian_blur(sigma=sigma, angle=angle))
    assert (h >= -1e-8).all()
    assert abs(h.sum() - 1.0) < 1e-5
    # center of mass at the geometric center
    H, W = h.shape[-2:]
    yy, xx = np.mgrid[0:H, 0:W]
    com_y = (h[0, 0] * yy).sum()
    com_x = (h[0, 0] * xx).sum()
    assert abs(com_y - (H - 1) / 2) < 0.1 and abs(com_x - (W - 1) / 2) < 0.1


def test_tv_prox_batched_gamma_matches_per_sample(key):
    """r5 review: the Pallas TV prox collapsed a (B,1,1,1) gamma to
    gamma[0]; batched gammas now dispatch to the XLA loop."""
    from deepinv_tpu.ops.pallas.tv import chambolle_prox

    x = jax.random.uniform(key, (2, 1, 16, 16))
    g = jnp.array([0.05, 0.3]).reshape(2, 1, 1, 1)
    out = chambolle_prox(x, g, 60)
    a = chambolle_prox(x[0:1], jnp.asarray(0.05), 60)
    b = chambolle_prox(x[1:2], jnp.asarray(0.3), 60)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(a[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(b[0]), atol=1e-4)
    # gradient w.r.t. the per-sample gammas flows with matching shape
    gr = jax.grad(lambda gg: float(0) + jnp.sum(chambolle_prox(x, gg, 20)))(g)
    assert gr.shape == g.shape
