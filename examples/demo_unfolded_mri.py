"""Unfolded MoDL training on simulated accelerated MRI
(counterpart of reference examples/unfolded + demo_mri_tour)."""

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

from deepinv_tpu.physics import MRI, GaussianNoise
from deepinv_tpu.physics.generator import RandomMaskGenerator
from deepinv_tpu.models import MoDL
from deepinv_tpu.training import Trainer
from deepinv_tpu.datasets import ArrayDataset, DataLoader, shepp_logan
from deepinv_tpu.loss import PSNR


def main(size=None, epochs=None):
    size = (32 if _util.fast() else 64) if size is None else size
    epochs = _util.scale(5, 1) if epochs is None else epochs
    # toy magnitude dataset -> 2-channel complex convention
    imgs = np.stack([
        np.roll(shepp_logan(size), (i, -i), (0, 1)) for i in range(16)
    ])
    data = np.stack([imgs, np.zeros_like(imgs)], axis=1).astype(np.float32)

    gen = RandomMaskGenerator((size, size), acceleration=4)
    mask = gen.step(1, key=jax.random.key(0))["mask"][0]
    physics = MRI(mask=mask, noise_model=GaussianNoise(0.01))

    model = MoDL(num_iter=3)
    trainer = Trainer(
        model, physics,
        train_dataloader=DataLoader(ArrayDataset(data), batch_size=4, shuffle=True),
        online_measurements=True,
        epochs=epochs,
        metrics=PSNR(),
    )
    trainer.train()


if __name__ == "__main__":
    main()
