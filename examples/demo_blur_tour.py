"""A tour of blur operators and PSF generators.

Mirrors the reference gallery's ``physics/demo_blur_tour.py``: build each
blur family — fixed-kernel ``Blur``, FFT-diagonalized ``BlurFFT``,
space-varying product-convolution blur — drive them with randomly sampled
PSFs from the generator zoo (motion trajectories, diffraction/Zernike
optics), and deblur with the closed-form ``prox_l2`` where the operator is
decomposable.
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

from deepinv_tpu.datasets import random_circles
from deepinv_tpu.ops import gaussian_blur
from deepinv_tpu.physics import Blur, BlurFFT, GaussianNoise, SpaceVaryingBlur
from deepinv_tpu.physics.generator import (
    DiffractionBlurGenerator,
    GaussianBlurGenerator,
    MotionBlurGenerator,
    ProductConvolutionBlurGenerator,
)
from deepinv_tpu.loss.metric import PSNR


def main():
    H = W = 64
    x = jnp.asarray(random_circles(H, seed=3)).reshape(1, 1, H, W)
    psnr = PSNR()

    # --- fixed Gaussian kernel, spatial convolution ------------------------
    blur = Blur(filter=gaussian_blur(sigma=2.0), padding="circular",
                noise_model=GaussianNoise(0.01))
    y = blur(x, key=jax.random.key(0))
    print(f"Blur(gaussian):      y {tuple(y.shape)}  "
          f"PSNR(y, x) = {float(psnr(y, x)[0]):.2f} dB")

    # --- generator zoo: each .step() samples a batch of PSFs ---------------
    for name, gen in [
        ("motion", MotionBlurGenerator(psf_size=(25, 25), l=0.6, sigma=0.5)),
        ("gaussian", GaussianBlurGenerator(psf_size=(25, 25))),
        ("diffraction", DiffractionBlurGenerator(psf_size=(25, 25))),
    ]:
        params = gen.step(batch_size=1, seed=1)
        k = params["filter"]
        p = BlurFFT(img_size=(1, H, W), filter=k, noise_model=GaussianNoise(0.01))
        yk = p(x, key=jax.random.key(1))
        # closed-form deblurring prox (DecomposablePhysics): one FFT solve
        xr = p.prox_l2(p.A_adjoint(yk), yk, gamma=1e3)
        print(f"BlurFFT({name:11s}): psf {tuple(k.shape)}  "
              f"PSNR(y) {float(psnr(yk, x)[0]):5.2f} -> "
              f"prox_l2 {float(psnr(xr, x)[0]):5.2f} dB")

    # --- space-varying blur: product-convolution expansion -----------------
    pc_gen = ProductConvolutionBlurGenerator(
        psf_generator=DiffractionBlurGenerator(psf_size=(17, 17)),
        img_size=(H, W), n_eigen_psf=6,
    )
    params = pc_gen.step(batch_size=1, seed=2)
    svb = SpaceVaryingBlur(filters=params["filters"],
                           multipliers=params["multipliers"],
                           padding="circular")
    ysv = svb.A(x)
    # adjointness sanity on the product-convolution pair
    u = jax.random.normal(jax.random.key(2), x.shape)
    v = jax.random.normal(jax.random.key(3), ysv.shape)
    lhs = jnp.vdot(svb.A(u), v)
    rhs = jnp.vdot(u, svb.A_adjoint(v))
    adj = abs(float(lhs - rhs)) / abs(float(lhs))
    print(f"SpaceVaryingBlur:    y {tuple(ysv.shape)}  adjointness {adj:.2e}")
    assert adj < 1e-4

    print("blur tour OK")


if __name__ == "__main__":
    main()
