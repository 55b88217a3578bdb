"""Equivariant imaging with projective subgroup transforms — counterpart of
reference examples/self-supervised-learning/demo_ei_transforms.py
(perspective-EI, Wang & Davies 2024): compares the transform groups used
for the EI loss."""

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
from deepinv_tpu.transform import Shift, Euclidean, PanTiltRotate
from deepinv_tpu.training import Trainer
from deepinv_tpu.datasets import ArrayDataset, DataLoader, random_circles


def main(epochs=3):
    data = np.stack([random_circles(32, seed=i) for i in range(24)])
    physics = Inpainting(img_size=(1, 32, 32), mask=0.5,
                         key=jax.random.key(0),
                         noise_model=GaussianNoise(0.02))

    for name, t in [
        ("Shift", Shift(shift_max=0.4)),
        ("Euclidean", Euclidean(theta_z_max=10.0, shift_max=0.1)),
        ("PanTiltRotate", PanTiltRotate(theta_max=3.0, theta_z_max=10.0)),
    ]:
        model = ArtifactRemoval(DnCNN(1, 1, depth=4, nf=8), mode="adjoint")
        trainer = Trainer(
            model, physics,
            train_dataloader=DataLoader(ArrayDataset(data), batch_size=8,
                                        shuffle=True),
            online_measurements=True,
            losses=[MCLoss(), EILoss(t)],
            metrics=PSNR(),
            epochs=epochs, verbose=False,
        )
        trainer.train()
        m = trainer.test([DataLoader(ArrayDataset(data), batch_size=8)])
        print(f"EI with {name}: eval PSNR {m['PSNR']:.2f} dB")


if __name__ == "__main__":
    main()
