"""3D confocal microscopy deconvolution (counterpart of reference
examples/physics/demo_microscopy_3d.py).

A confocal laser-scanning microscope blurs volumes with the product of an
illumination and a pinhole-convolved collection PSF. We generate a physical
PSF with :class:`ConfocalBlurGenerator3D` (Zernike-aberrated pupils,
physical-optics parameters), measure a synthetic bead volume through the
3D blur + Poisson-Gaussian noise, and deconvolve with PGD and a 3D wavelet
prior (``wvdim=3``).
"""

# make the repo root importable when run as `python examples/<demo>.py`
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import _util

_util.setup()  # CPU by default; DEEPINV_TPU_DEMO_PLATFORM overrides

import jax
import jax.numpy as jnp
import numpy as np

from deepinv_tpu.physics import Blur, PoissonGaussianNoise
from deepinv_tpu.physics.generator import ConfocalBlurGenerator3D
from deepinv_tpu.optim import optim_builder, L2, WaveletPrior
from deepinv_tpu.loss import PSNR


def bead_volume(D=12, H=48, W=48, n=25, seed=0):
    """Sparse fluorescent beads in a dark volume."""
    r = np.random.default_rng(seed)
    v = np.zeros((D, H, W), np.float32)
    z, y, x = r.integers(2, D - 2, n), r.integers(6, H - 6, n), r.integers(6, W - 6, n)
    for zi, yi, xi in zip(z, y, x):
        v[zi - 1:zi + 2, yi - 1:yi + 2, xi - 1:xi + 2] = 0.6
        v[zi, yi, xi] = 1.0
    return v


def main():
    # physical confocal PSF: oil immersion, NA 1.37, 489/395 nm
    gen = ConfocalBlurGenerator3D(
        psf_size=(5, 13, 13), zernike_index=(4, 5, 6),
        NI=1.51, NA=1.37, lambda_ill=489e-9, lambda_coll=395e-9,
    )
    psf = gen.step(1, key=jax.random.key(0))["filter"]  # (1, 1, 5, 13, 13)
    print(f"confocal PSF {tuple(psf.shape)}, energy {float(psf.sum()):.3f}")

    x = jnp.asarray(bead_volume())[None, None]  # (1, 1, D, H, W)
    physics = Blur(filter=psf, padding="circular",
                   noise_model=PoissonGaussianNoise(gain=0.02, sigma=0.01))
    y = physics(x, key=jax.random.key(1))

    # adjointness of the volumetric operator is exact (linear_transpose)
    u = jax.random.normal(jax.random.key(2), x.shape)
    v = jax.random.normal(jax.random.key(3), y.shape)
    print(f"adjointness: {float(jnp.vdot(physics.A(u), v)):.4f} vs "
          f"{float(jnp.vdot(u, physics.A_adjoint(v))):.4f}")

    model = optim_builder(
        "PGD", data_fidelity=L2(),
        prior=WaveletPrior(wv="db2", level=2, wvdim=3),
        params_algo={"stepsize": 1.0, "lambda": 0.002, "g_param": 0.01},
        max_iter=40,
    )
    xhat = jax.jit(lambda m, yv, p: m(yv, p))(model, y, physics)

    psnr = PSNR()
    print(f"widefield (blurred)  PSNR: {float(psnr(y, x)[0]):6.2f} dB")
    print(f"PGD + 3D wavelets    PSNR: {float(psnr(xhat, x)[0]):6.2f} dB")


if __name__ == "__main__":
    main()
