"""Calibrating physics operators by gradient descent.

Mirrors the reference gallery's blind-inverse-problems
``demo_optimizing_physics_parameter.py``: physics are differentiable, so
an unknown forward-model parameter (here a motion-blur kernel) can be
estimated from a calibration pair ``(x, y)`` by first-order optimization

    min_theta 1/2 || A(x, theta) - y ||^2 .

The TPU-native twist: physics are pytrees, so ``jax.grad`` differentiates
straight through ``Blur.A`` w.r.t. the *filter leaf*, and the whole
projected-gradient loop compiles to one XLA program with ``lax.scan``.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import _util

_util.setup()  # CPU by default; DEEPINV_TPU_DEMO_PLATFORM overrides

import jax
import jax.numpy as jnp
import numpy as np

from deepinv_tpu.physics import Blur, GaussianNoise
from deepinv_tpu.physics.generator import MotionBlurGenerator
from deepinv_tpu.datasets import random_circles


def projection_simplex(v):
    """Project each kernel onto the probability simplex (sorting method)."""
    shape = v.shape
    v = v.reshape(v.shape[0], -1)
    n = v.shape[1]
    u = jnp.sort(v, axis=-1)[:, ::-1]
    cssv = jnp.cumsum(u, axis=-1) - 1.0
    ind = jnp.arange(1, n + 1)
    cond = u - cssv / ind > 0
    rho = jnp.sum(cond, axis=-1)
    theta = jnp.take_along_axis(cssv, rho[:, None] - 1, axis=-1) / rho[:, None]
    return jnp.maximum(v - theta, 0.0).reshape(shape)


def main():
    key = jax.random.key(0)
    psf_size = (11, 11)

    gen = MotionBlurGenerator(psf_size=psf_size)
    true_kernel = gen.step(1, key=key)["filter"]

    x = jnp.asarray(np.stack([random_circles(64, seed=3)]))
    physics = Blur(filter=true_kernel, padding="circular",
                   noise_model=GaussianNoise(0.005))
    y = physics(x, key=jax.random.fold_in(key, 1))

    # start from a centered delta kernel
    k0 = jnp.zeros((1, 1) + psf_size).at[..., psf_size[0] // 2,
                                         psf_size[1] // 2].set(1.0)

    def loss(kernel):
        return 0.5 * jnp.sum((physics.update(filter=kernel).A(x) - y) ** 2)

    # exact Lipschitz constant for circular convolution-by-x acting on the
    # kernel: L = max |fft2(x)|^2 (the loss is quadratic in the kernel)
    step = 1.0 / float(jnp.max(jnp.abs(jnp.fft.fft2(x)) ** 2))

    @jax.jit
    def pgd(kernel, n_iter=1500):
        def body(carry, _):
            k, z, t = carry  # FISTA momentum on the quadratic objective
            g = jax.grad(loss)(z)
            k_new = projection_simplex(z - step * g)
            t_new = (1 + jnp.sqrt(1 + 4 * t**2)) / 2
            z = k_new + ((t - 1) / t_new) * (k_new - k)
            return (k_new, z, t_new), loss(k_new)

        (k, _, _), hist = jax.lax.scan(
            body, (kernel, kernel, jnp.asarray(1.0)), None, length=n_iter)
        return k, hist

    k_hat, history = pgd(k0)
    err0 = float(jnp.linalg.norm(k0 - true_kernel))
    err = float(jnp.linalg.norm(k_hat - true_kernel))
    print(f"loss: {float(history[0]):.5f} -> {float(history[-1]):.5f}")
    print(f"kernel error: {err0:.4f} -> {err:.4f}")
    assert err < 0.5 * err0, "calibration should recover most of the kernel"
    print("physics-parameter calibration OK")


if __name__ == "__main__":
    main()
