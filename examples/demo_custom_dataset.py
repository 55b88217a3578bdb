"""Creating a measurement dataset offline and training on it
(counterpart of reference examples/basics/demo_custom_dataset.py).

``generate_dataset`` measures every image of a base dataset with a physics
operator once and writes (x, y) pairs to HDF5; ``HDF5Dataset`` then serves
them during training without re-simulating the physics (the reference's
"offline measurements" path, datagenerator.py:486).
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

from deepinv_tpu.physics import BlurFFT, GaussianNoise
from deepinv_tpu.ops import gaussian_blur
from deepinv_tpu.models import DnCNN, ArtifactRemoval
from deepinv_tpu.loss import SupLoss, PSNR
from deepinv_tpu.training import Trainer
from deepinv_tpu.datasets import (
    ArrayDataset, DataLoader, HDF5Dataset, generate_dataset, random_circles,
)


def main(epochs=5):
    # your own images: any indexable dataset yielding (C, H, W) arrays
    imgs = np.stack([random_circles(32, seed=i) for i in range(40)])
    base_train = ArrayDataset(imgs[:32])
    base_test = ArrayDataset(imgs[32:])

    physics = BlurFFT(
        img_size=(1, 32, 32),
        filter=gaussian_blur(sigma=1.0),
        noise_model=GaussianNoise(0.03),
    )

    with tempfile.TemporaryDirectory() as save_dir:
        # ---- offline measurement generation -> HDF5 ------------------
        path = generate_dataset(
            base_train, physics, save_dir, test_dataset=base_test,
            batch_size=8, key=jax.random.key(0),
        )
        train_ds = HDF5Dataset(path, train=True)
        test_ds = HDF5Dataset(path, train=False)
        x0, y0 = train_ds[0]
        print(f"HDF5 dataset at {path}: {len(train_ds)} train / "
              f"{len(test_ds)} test pairs, x {x0.shape}, y {y0.shape}")

        # ---- supervised training on the stored pairs -----------------
        model = ArtifactRemoval(DnCNN(1, 1, depth=5, nf=16), mode="adjoint")
        trainer = Trainer(
            model, physics,
            train_dataloader=DataLoader(train_ds, batch_size=8, shuffle=True),
            eval_dataloader=DataLoader(test_ds, batch_size=8),
            online_measurements=False,  # measurements come from the file
            losses=SupLoss(),
            metrics=PSNR(),
            epochs=epochs,
        )
        model = trainer.train()

        results = trainer.test(DataLoader(test_ds, batch_size=8))
        print({k: round(float(v), 2) for k, v in results.items()})


if __name__ == "__main__":
    main()
