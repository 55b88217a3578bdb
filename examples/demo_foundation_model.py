"""The RAM foundation model across tasks (counterpart of reference
examples/models/demo_foundation_model.py).

RAM (Reconstruct Anything Model) is a single measurement-conditioned
network that solves many inverse problems zero-shot: the forward pass
consumes ``(y, physics)`` and internally realigns/encodes the measurement
through the operator. The architecture here is ported leaf-for-leaf from
the reference (``pretrained=<local ram.pth.tar>`` reproduces published
numbers; verified in tests/test_weight_porting.py). This demo runs the
same model object on three different physics — with random weights for
offline reproducibility, so PSNRs are NOT meaningful; the point is the
task-agnostic API.
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

from deepinv_tpu.physics import Denoising, Inpainting, BlurFFT, GaussianNoise
from deepinv_tpu.ops import gaussian_blur
from deepinv_tpu.models import RAM
from deepinv_tpu.datasets import random_circles


def main():
    # small-width RAM for a quick CPU run; pass pretrained="ram.pth.tar"
    # (local file) with default nc/nb to load the published weights
    model = RAM(nc=(16, 32, 64, 64), nb=2)

    x1 = jnp.asarray(random_circles(64, seed=0))[None]          # 1-channel
    x3 = jnp.asarray(np.stack([random_circles(64, seed=i, channels=3)
                               for i in [1]]))                  # 3-channel

    tasks = [
        ("denoising (1ch)", x1,
         Denoising(noise_model=GaussianNoise(0.1))),
        ("inpainting (3ch)", x3,
         Inpainting(img_size=(3, 64, 64), mask=0.5, key=jax.random.key(0),
                    noise_model=GaussianNoise(0.05))),
        ("deblurring (3ch)", x3,
         BlurFFT(img_size=(3, 64, 64), filter=gaussian_blur(sigma=1.5),
                 noise_model=GaussianNoise(0.02))),
    ]

    fwd = jax.jit(lambda m, yv, p: m(yv, p))
    for name, x, physics in tasks:
        y = physics(x, key=jax.random.key(42))
        xhat = fwd(model, y, physics)  # same model, any physics
        assert xhat.shape == x.shape and bool(jnp.isfinite(xhat).all())
        print(f"{name:>17s}: y {tuple(y.shape)} -> x_hat {tuple(xhat.shape)} "
              f"(one model, zero-shot API)")

    print("RAM consumed three different operators with no retraining/config.")


if __name__ == "__main__":
    main()
