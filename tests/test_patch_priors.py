"""EPLL/GMM and PatchNR tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepinv_tpu.optim import GaussianMixtureModel, EPLL, PatchPrior, PatchNR, patch_extractor
from deepinv_tpu.datasets import random_circles
from conftest import assert_close


def test_gmm_fit_recovers_clusters(key):
    """EM on two well-separated Gaussians recovers means and weights."""
    k1, k2 = jax.random.split(key)
    c1 = jax.random.normal(k1, (300, 4)) * 0.1 + jnp.array([2.0, 2, 2, 2])
    c2 = jax.random.normal(k2, (700, 4)) * 0.1 - jnp.array([2.0, 2, 2, 2])
    data = jnp.concatenate([c1, c2])
    gmm = GaussianMixtureModel(2, 4, seed=0).fit(data, max_iters=100)
    mus = np.sort(np.asarray(gmm.mu[:, 0]))
    assert abs(mus[0] + 2) < 0.1 and abs(mus[1] - 2) < 0.1
    ws = np.sort(np.asarray(gmm.weights))
    assert abs(ws[0] - 0.3) < 0.05
    # log_prob is a proper density (higher near cluster centers)
    lp_center = float(gmm.log_prob(jnp.array([[2.0, 2, 2, 2]]))[0])
    lp_far = float(gmm.log_prob(jnp.array([[10.0, 10, 10, 10]]))[0])
    assert lp_center > lp_far


def test_patch_extractor(key):
    x = jax.random.normal(key, (2, 1, 8, 8))
    patches, (nh, nw) = patch_extractor(x, 3)
    assert patches.shape == (2, 36, 9)
    assert_close(patches[0, 0], x[0, 0, :3, :3].reshape(-1))


def test_epll_denoises(key):
    """EPLL with a GMM fitted on clean patches improves noisy images."""
    imgs = jnp.asarray(np.stack([random_circles(32, seed=i) for i in range(8)]))
    patches, _ = patch_extractor(imgs, 4)
    flat = patches.reshape(-1, 16)
    gmm = GaussianMixtureModel(5, 16, seed=1).fit(flat[:2000], max_iters=30)
    epll = EPLL(gmm=gmm, patch_size=4)

    x = imgs[:2]
    sigma = 0.1
    y = x + sigma * jax.random.normal(key, x.shape)
    xhat = epll.denoise(y, sigma)
    mse_in = float(jnp.mean((y - x) ** 2))
    mse_out = float(jnp.mean((xhat - x) ** 2))
    assert mse_out < mse_in, (mse_out, mse_in)
    # NLL is lower for clean than noisy images
    assert float(jnp.mean(epll.negative_log_likelihood(x))) < float(
        jnp.mean(epll.negative_log_likelihood(y))
    )


def test_patchnr_flow_invertible(key):
    flow = PatchNR(patch_size=3, channels=1, n_layers=3, hidden=16)
    x = jax.random.normal(key, (10, 9))
    z, logdet = flow.flow_forward(x)
    x_rec = flow.flow_inverse(z)
    assert_close(x_rec, x, rtol=1e-4, atol=1e-5)
    assert logdet.shape == (10,)


@pytest.mark.slow
def test_patchnr_fit_improves_likelihood(key):
    imgs = jnp.asarray(np.stack([random_circles(16, seed=i) for i in range(4)]))
    patches, _ = patch_extractor(imgs, 3)
    flat = patches.reshape(-1, 9)
    flow = PatchNR(patch_size=3, channels=1, n_layers=3, hidden=32)
    nll0 = float(jnp.mean(flow.nll(flat)))
    flow = flow.fit(flat, n_steps=200, lr=1e-3)
    nll1 = float(jnp.mean(flow.nll(flat)))
    assert nll1 < nll0
    # prior usable: fn on images
    vals = flow.fn(imgs[:1])
    assert vals.shape == (1,)
