"""Multi-operator imaging (MOI): self-supervised learning from multiple
forward operators — counterpart of reference
examples/self-supervised-learning/demo_multioperator_imaging.py."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import _util

_util.setup()  # CPU by default; DEEPINV_TPU_DEMO_PLATFORM overrides

import jax
import numpy as np

from deepinv_tpu.physics import Inpainting, GaussianNoise
from deepinv_tpu.models import DnCNN, ArtifactRemoval
from deepinv_tpu.loss import MCLoss, MOILoss, PSNR
from deepinv_tpu.training import Trainer
from deepinv_tpu.datasets import ArrayDataset, DataLoader, random_circles


def main(epochs=4):
    data = np.stack([random_circles(32, seed=i) for i in range(32)])
    # several inpainting operators with different random masks
    physics_list = [
        Inpainting(img_size=(1, 32, 32), mask=0.5, key=jax.random.key(i),
                   noise_model=GaussianNoise(0.02))
        for i in range(3)
    ]
    model = ArtifactRemoval(DnCNN(1, 1, depth=5, nf=16), mode="adjoint")
    trainer = Trainer(
        model, physics_list,
        train_dataloader=[
            DataLoader(ArrayDataset(data), batch_size=8, shuffle=True)
            for _ in physics_list
        ],
        online_measurements=True,
        losses=[MCLoss(), MOILoss(physics_list)],
        metrics=PSNR(),
        epochs=epochs,
    )
    trainer.train()
    print("MOI training finished")


if __name__ == "__main__":
    main()
