"""Self-supervised measurement splitting (SSDU / Noise2Inverse) —
counterpart of reference
examples/self-supervised-learning/demo_splitting_loss.py.

Trains from measurements only: adapt_model masks the input, the loss is
evaluated on the complement, and evaluation Monte-Carlo averages several
splits."""

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
from deepinv_tpu.loss import SplittingLoss, PSNR
from deepinv_tpu.training import Trainer
from deepinv_tpu.datasets import ArrayDataset, DataLoader, random_circles


def main(epochs=5):
    data = np.stack([random_circles(32, seed=i) for i in range(32)])
    physics = Inpainting(img_size=(1, 32, 32), mask=0.7,
                         key=jax.random.key(0),
                         noise_model=GaussianNoise(0.02))
    loss = SplittingLoss(split_ratio=0.8, eval_n_samples=4)
    model = ArtifactRemoval(DnCNN(1, 1, depth=5, nf=16), mode="adjoint")
    trainer = Trainer(
        model, physics,
        train_dataloader=DataLoader(ArrayDataset(data), batch_size=8,
                                    shuffle=True),
        online_measurements=True,
        losses=loss,  # adapt_model is applied by the Trainer
        metrics=PSNR(),
        epochs=epochs,
    )
    trainer.train()
    # at eval the adapted model averages eval_n_samples random splits
    metrics = trainer.test([DataLoader(ArrayDataset(data), batch_size=8)])
    print({k: round(v, 2) for k, v in metrics.items()})


if __name__ == "__main__":
    main()
