"""Self-supervised equivariant-imaging training on inpainting
(counterpart of reference examples/self-supervised-learning)."""

# make the repo root importable when run as `python examples/<demo>.py`
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
from deepinv_tpu.loss import MCLoss, EILoss, PSNR
from deepinv_tpu.transform import Shift
from deepinv_tpu.training import Trainer
from deepinv_tpu.datasets import ArrayDataset, DataLoader, random_circles


def main(epochs=10):
    data = np.stack([random_circles(32, seed=i) for i in range(32)])
    physics = Inpainting(img_size=(1, 32, 32), mask=0.5,
                         key=jax.random.key(0),
                         noise_model=GaussianNoise(0.02))
    model = ArtifactRemoval(DnCNN(1, 1, depth=5, nf=16), mode="adjoint")
    trainer = Trainer(
        model, physics,
        train_dataloader=DataLoader(ArrayDataset(data), batch_size=8, shuffle=True),
        online_measurements=True,
        losses=[MCLoss(), EILoss(Shift(shift_max=0.5))],
        metrics=PSNR(),
        epochs=epochs,
    )
    trainer.train()


if __name__ == "__main__":
    main()
