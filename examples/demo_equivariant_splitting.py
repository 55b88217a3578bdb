"""Self-supervised equivariant splitting on inpainting
(counterpart of reference examples/self-supervised-learning/
demo_equivariant_splitting.py).

Equivariant splitting combines measurement splitting (SSDU) with a random
group action: the problem is rotated by a random T_g each step, the
measurements are Bernoulli-split, the network reconstructs from one split
and is penalized on both. Training needs measurements only — no ground
truth — and an equivariant model closes the gap to supervised training.
"""

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
from deepinv_tpu.models import DnCNN, ArtifactRemoval, EquivariantReconstructor
from deepinv_tpu.loss import EquivariantSplittingLoss, PSNR
from deepinv_tpu.transform import Rotate
from deepinv_tpu.training import Trainer
from deepinv_tpu.datasets import ArrayDataset, DataLoader, random_circles


def main(epochs=8):
    data = np.stack([random_circles(32, seed=i) for i in range(40)])
    train_loader = DataLoader(ArrayDataset(data[:32]), batch_size=8,
                              shuffle=True)
    eval_loader = DataLoader(ArrayDataset(data[32:]), batch_size=8)

    physics = Inpainting(img_size=(1, 32, 32), mask=0.6,
                         key=jax.random.key(0),
                         noise_model=GaussianNoise(0.02))

    # equivariant model: Monte-Carlo average over the rotation group makes
    # the reconstructor commute with T_g (models/wrappers_models.py)
    base = ArtifactRemoval(DnCNN(1, 1, depth=5, nf=16), mode="adjoint")
    model = EquivariantReconstructor(base, transform=Rotate(multiples=90.0))

    loss = EquivariantSplittingLoss(
        transform=Rotate(multiples=90.0), split_ratio=0.8,
    )
    trainer = Trainer(
        model, physics,
        train_dataloader=train_loader,
        eval_dataloader=eval_loader,
        online_measurements=True,
        losses=loss,
        metrics=PSNR(),
        epochs=epochs,
    )
    model = trainer.train()
    results = trainer.test(eval_loader)
    print("self-supervised (no ground truth seen):",
          {k: round(float(v), 2) for k, v in results.items()})


if __name__ == "__main__":
    main()
