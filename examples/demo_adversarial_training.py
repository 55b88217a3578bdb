"""Adversarial (GAN) reconstruction training: alternating generator and
discriminator updates (counterpart of reference
examples/adversarial-learning/demo_gan_imaging.py)."""

# make the repo root importable when run as `python examples/<demo>.py`
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import _util

_util.setup()  # CPU by default; DEEPINV_TPU_DEMO_PLATFORM overrides

import numpy as np

from deepinv_tpu.training import AdversarialTrainer
from deepinv_tpu.datasets import ArrayDataset, DataLoader, random_circles
from deepinv_tpu.physics import Denoising, GaussianNoise
from deepinv_tpu.models import DnCNN, DCGANDiscriminator
from deepinv_tpu.loss import SupLoss, SupAdversarialGeneratorLoss, PSNR


def main(size=64, epochs=4):
    data = np.stack([random_circles(size, seed=i) for i in range(16)])
    trainer = AdversarialTrainer(
        DnCNN(1, 1, depth=4, nf=16),
        Denoising(noise_model=GaussianNoise(0.1)),
        D=DCGANDiscriminator(ndf=16, nc=1),
        losses=[SupLoss(), SupAdversarialGeneratorLoss(weight_adv=0.01)],
        train_dataloader=DataLoader(ArrayDataset(data), batch_size=4, shuffle=True),
        online_measurements=True,
        epochs=epochs,
        metrics=PSNR(),
    )
    trainer.train()
    print("loss history:", [round(l, 4) for l in trainer.loss_history])


if __name__ == "__main__":
    main()
