"""Neighbor2Neighbor self-supervised denoising from single noisy images —
counterpart of reference
examples/self-supervised-learning/demo_n2n_denoising.py."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import _util

_util.setup()  # CPU by default; DEEPINV_TPU_DEMO_PLATFORM overrides

import jax
import numpy as np

from deepinv_tpu.physics import Denoising, GaussianNoise
from deepinv_tpu.models import DnCNN
from deepinv_tpu.loss import Neighbor2Neighbor, PSNR
from deepinv_tpu.training import Trainer
from deepinv_tpu.datasets import ArrayDataset, DataLoader, random_circles


def main(epochs=5):
    sigma = 0.1
    data = np.stack([random_circles(32, seed=i) for i in range(32)])
    physics = Denoising(noise_model=GaussianNoise(sigma))

    from deepinv_tpu.models import ArtifactRemoval

    model = ArtifactRemoval(DnCNN(1, 1, depth=5, nf=16), mode="direct",
                            sigma=sigma)
    trainer = Trainer(
        model, physics,
        train_dataloader=DataLoader(ArrayDataset(data), batch_size=8,
                                    shuffle=True),
        online_measurements=True,
        losses=Neighbor2Neighbor(gamma=2.0),
        metrics=PSNR(),
        epochs=epochs,
    )
    trainer.train()
    print("Neighbor2Neighbor training finished")


if __name__ == "__main__":
    main()
