"""Recorrupted-to-Recorrupted self-supervised denoising — counterpart of
reference examples/self-supervised-learning/demo_r2r_denoising.py."""

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
from deepinv_tpu.loss import R2RLoss, PSNR
from deepinv_tpu.training import Trainer
from deepinv_tpu.datasets import ArrayDataset, DataLoader, random_circles


def main(epochs=5):
    sigma = 0.1
    data = np.stack([random_circles(32, seed=i) for i in range(32)])
    physics = Denoising(noise_model=GaussianNoise(sigma))

    from deepinv_tpu.models import ArtifactRemoval

    # 'direct' feeds y straight into the backbone: a trainable denoiser
    model = ArtifactRemoval(DnCNN(1, 1, depth=5, nf=16), mode="direct",
                            sigma=sigma)
    trainer = Trainer(
        model, physics,
        train_dataloader=DataLoader(ArrayDataset(data), batch_size=8,
                                    shuffle=True),
        online_measurements=True,
        losses=R2RLoss(sigma=sigma),
        metrics=PSNR(),
        epochs=epochs,
    )
    trainer.train()
    print("R2R training finished")


if __name__ == "__main__":
    main()
