"""Compressed sensing with a generative model (CSGM).

Mirrors the reference gallery's adversarial-learning
``demo_gan_imaging.py`` CSGM path (reference models/gan.py CSGMGenerator):
reconstruct by searching the latent space of a generator, ``min_z
||A(G(z)) - y||^2``. Offline (no pretrained GAN weights) the demo uses a
*known decoder* sanity setup: the target image is itself produced by the
generator, so latent optimization must drive the measurement residual far
down — the same protocol the reference uses for its untrained-ablation.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import _util

_util.setup()  # CPU by default; DEEPINV_TPU_DEMO_PLATFORM overrides

import jax
import jax.numpy as jnp

from deepinv_tpu.models import DCGANGenerator, CSGMGenerator
from deepinv_tpu.physics import CompressedSensing


def main():
    key = jax.random.key(0)
    G = DCGANGenerator(output_size=64, nz=16, ngf=8, nc=1, key=key)

    # ground truth in the generator's range
    z_true = jax.random.normal(jax.random.fold_in(key, 1), (1, 16))
    x = G(z_true)

    physics = CompressedSensing(m=256, img_size=x.shape[1:],
                                key=jax.random.fold_in(key, 2))
    y = physics.A(x)

    model = CSGMGenerator(G, inf_max_iter=400, inf_lr=2e-2)
    xhat = model(y, physics, key=jax.random.fold_in(key, 3))

    res0 = float(jnp.linalg.norm(physics.A(jnp.zeros_like(x)) - y))
    res = float(jnp.linalg.norm(physics.A(xhat) - y))
    mse = float(jnp.mean((xhat - x) ** 2))
    print(f"measurement residual: {res0:.3f} -> {res:.3f}")
    print(f"image MSE vs truth: {mse:.4f}")
    assert res < 0.25 * res0, "latent optimization should fit the measurements"
    print("CSGM reconstruction OK")


if __name__ == "__main__":
    main()
