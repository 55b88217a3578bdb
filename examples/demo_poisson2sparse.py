"""Single-image self-supervised Poisson denoising with Poisson2Sparse
(counterpart of reference examples/self-supervised-learning/
demo_poisson2sparse.py).

Poisson2Sparse fits a small convolutional sparse-coding network (ConvLISTA)
on ONE noisy photon-limited image, with a Neighbor2Neighbor-style loss on
checkerboard subsamples plus an L1 sparsity penalty on the codes — no clean
data anywhere. Useful for microscopy where each acquisition is unique.
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

from deepinv_tpu.physics import Denoising, PoissonNoise
from deepinv_tpu.models import Poisson2Sparse, AnscombeDenoiser, MedianFilter
from deepinv_tpu.loss import PSNR
from deepinv_tpu.datasets import random_circles


def main():
    x = jnp.asarray(random_circles(64, seed=5))[None] * 0.8 + 0.1
    gain = 0.05  # ~20 photons at peak: strong shot noise
    physics = Denoising(noise_model=PoissonNoise(gain=gain))
    y = physics(x, key=jax.random.key(0))
    psnr = PSNR()

    # classical baseline: Anscombe variance stabilization + Gaussian step
    baseline = AnscombeDenoiser(MedianFilter(kernel_size=3), gain=gain)
    x_ans = baseline(y, 0.1)

    # Poisson2Sparse: fit ConvLISTA on this one measurement
    p2s = Poisson2Sparse(n_iter=5, n_filters=16, train_steps=300, lr=2e-3,
                        key=jax.random.key(1))
    x_p2s = p2s(y, key=jax.random.key(2))

    print(f"noisy (gain={gain})      PSNR: {float(psnr(y, x)[0]):6.2f} dB")
    print(f"Anscombe + median        PSNR: {float(psnr(x_ans, x)[0]):6.2f} dB")
    print(f"Poisson2Sparse (1 image) PSNR: {float(psnr(x_p2s, x)[0]):6.2f} dB")


if __name__ == "__main__":
    main()
