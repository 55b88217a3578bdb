"""Training a reconstruction network with the Trainer
(counterpart of reference examples/models/demo_training.py).

Supervised training of an artifact-removal network on noisy inpainting,
with per-epoch eval, checkpointing, resume, and a no-learning baseline
comparison — the full reference Trainer surface (trainer.py:26).
"""

# make the repo root importable when run as `python examples/<demo>.py`
import os as _os
import sys as _sys
import tempfile

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import _util

_util.setup()  # CPU by default; DEEPINV_TPU_DEMO_PLATFORM overrides

import jax
import numpy as np

from deepinv_tpu.physics import Inpainting, GaussianNoise
from deepinv_tpu.models import DnCNN, ArtifactRemoval
from deepinv_tpu.loss import SupLoss, PSNR
from deepinv_tpu.training import Trainer
from deepinv_tpu.datasets import ArrayDataset, DataLoader, random_circles


def main(epochs=6):
    data = np.stack([random_circles(32, seed=i) for i in range(48)])
    train_loader = DataLoader(ArrayDataset(data[:40]), batch_size=8,
                              shuffle=True)
    eval_loader = DataLoader(ArrayDataset(data[40:]), batch_size=8)

    physics = Inpainting(img_size=(1, 32, 32), mask=0.6,
                         key=jax.random.key(0),
                         noise_model=GaussianNoise(0.05))
    model = ArtifactRemoval(DnCNN(1, 1, depth=5, nf=16), mode="adjoint")

    with tempfile.TemporaryDirectory() as ckpt_dir:
        trainer = Trainer(
            model, physics,
            train_dataloader=train_loader,
            eval_dataloader=eval_loader,
            online_measurements=True,
            losses=SupLoss(),
            metrics=PSNR(),
            epochs=epochs,
            save_path=ckpt_dir,     # writes ckp_{epoch} checkpoints
            ckpt_interval=2,
        )
        model = trainer.train()

        # ---- test: trained model vs the A_adjoint no-learning baseline
        results = trainer.test(eval_loader)
        print({k: round(float(v), 2) for k, v in results.items()})

        # ---- checkpoint round-trip: a fresh trainer resumes the weights
        ckpts = sorted(f for f in _os.listdir(ckpt_dir) if "ckp" in f)
        print("checkpoints written:", ckpts)
        trainer2 = Trainer(
            ArtifactRemoval(DnCNN(1, 1, depth=5, nf=16), mode="adjoint"),
            physics, train_dataloader=train_loader, losses=SupLoss(),
            metrics=PSNR(), epochs=epochs, online_measurements=True,
        )
        trainer2.load_model(_os.path.join(ckpt_dir, ckpts[-1]))
        r2 = trainer2.test(eval_loader)
        assert abs(r2["PSNR"] - results["PSNR"]) < 1e-3
        print("checkpoint resume reproduces the test PSNR — OK")


if __name__ == "__main__":
    main()
