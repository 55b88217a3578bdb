"""Unfolded/DEQ tests (mirrors reference test_unfolded.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepinv_tpu.physics import Inpainting, Denoising, GaussianNoise
from deepinv_tpu.optim import L2, Tikhonov, PnP, DPIR
from deepinv_tpu.unfolded import unfolded_builder, DEQ_builder
from deepinv_tpu.unfolded.deq import deq_fixed_point
from deepinv_tpu.models import DnCNN
from conftest import assert_close

IMSIZE = (1, 16, 16)


def test_unfolded_trains(key):
    physics = Inpainting(img_size=IMSIZE, mask=0.7, key=jax.random.key(1))
    x = jax.random.uniform(key, (2,) + IMSIZE)
    y = physics.A(x)
    model = unfolded_builder(
        "PGD",
        data_fidelity=L2(),
        prior=PnP(DnCNN(1, 1, depth=3, nf=4)),
        params_algo={"stepsize": 1.0, "g_param": 0.05, "lambda": 1.0},
        max_iter=3,
    )
    import optax

    opt = optax.adam(1e-3)
    state = opt.init(model)

    def loss(m):
        return jnp.mean((m(y, physics) - x) ** 2)

    l0 = float(loss(model))
    for _ in range(20):
        g = jax.grad(loss)(model)
        updates, state = opt.update(g, state, model)
        model = jax.tree_util.tree_map(lambda a, b: a + b, model, updates)
    l1 = float(loss(model))
    assert l1 < l0
    # per-iteration stepsizes were trained (changed from init)
    assert float(jnp.std(model.params_algo["stepsize"])) > 0


def test_deq_fixed_point_value_and_grad():
    """DEQ on a linear contraction: x* = Wx + b has closed form; implicit
    gradient must match differentiating the closed form."""
    key = jax.random.key(0)
    W = 0.3 * jax.random.normal(key, (6, 6)) / np.sqrt(6)
    b = jax.random.normal(jax.random.key(1), (6,))
    params = {"W": W, "b": b}

    def T(p, x):
        return x @ p["W"].T + p["b"]

    x_star = deq_fixed_point(T, params, jnp.zeros((1, 6)), max_iter=200, tol=1e-10, backward_iter=200, backward_tol=1e-12)
    closed = jnp.linalg.solve(jnp.eye(6) - W, b)
    assert_close(x_star[0], closed, rtol=1e-4, atol=1e-5)

    def loss(p):
        xs = deq_fixed_point(T, p, jnp.zeros((1, 6)), max_iter=200, tol=1e-10, backward_iter=300, backward_tol=1e-12)
        return jnp.sum(xs**2)

    def loss_closed(p):
        xs = jnp.linalg.solve(jnp.eye(6) - p["W"], p["b"])
        return jnp.sum(xs**2)

    g_deq = jax.grad(loss)(params)
    g_cf = jax.grad(loss_closed)(params)
    assert_close(g_deq["b"], g_cf["b"], rtol=1e-3, atol=1e-5)
    assert_close(g_deq["W"], g_cf["W"], rtol=1e-3, atol=1e-4)


def test_deq_builder_runs(key):
    physics = Denoising(noise_model=GaussianNoise(0.1))
    x = jax.random.uniform(key, (1,) + IMSIZE)
    y = physics(x, key=key)
    model = DEQ_builder(
        "PGD",
        data_fidelity=L2(),
        prior=Tikhonov(),
        params_algo={"stepsize": 0.5, "lambda": 0.1},
        max_iter=100,
    )
    xhat = model(y, physics)
    # fixed point of PGD with Tikhonov: x = (y + ... ) closed form
    # argmin 0.5||x-y||^2 + 0.1*0.5||x||^2 -> x = y / 1.1
    assert_close(xhat, y / 1.1, rtol=1e-3, atol=1e-3)
    # gradients flow to the prior-free params
    g = jax.grad(lambda m: jnp.sum(m(y, physics) ** 2))(model)
    assert float(jnp.sum(jnp.abs(g.params_algo["lambda"]))) > 0


def test_dpir_preset(key):
    from deepinv_tpu.physics import BlurFFT
    from deepinv_tpu.ops import gaussian_blur
    from deepinv_tpu.models import TVDenoiser

    class SigmaTV:
        # TV's ths is a regularization weight, not a noise sigma: scale it
        # (0.5 tuned for the exact reference schedule's sigma trajectory)
        def __call__(self, x, sigma):
            return TVDenoiser(20)(x, 0.5 * sigma)

    from deepinv_tpu.datasets import random_circles
    import numpy as np

    physics = BlurFFT(img_size=IMSIZE, filter=gaussian_blur(sigma=1.0),
                      noise_model=GaussianNoise(0.03))
    x = jnp.asarray(random_circles(16, seed=3))[None]
    y = physics(x, key=key)
    model = DPIR(sigma=0.03, denoiser=SigmaTV())
    xhat = model(y, physics)
    mse_in = float(jnp.mean((y - x) ** 2))
    mse_out = float(jnp.mean((xhat - x) ** 2))
    assert mse_out < mse_in
