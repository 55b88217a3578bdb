"""Datasets layer (reference deepinv/tests/test_datasets.py).

Offline measurement generation round trips through HDF5 with the
reference-compatible layout (datagenerator.py:486-763), dataset containers
(Array/Tensor/Patch/Subset/DataLoader), splitting, phantoms, and the
physics-generator-params path.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepinv_tpu.datasets import (
    generate_dataset,
    HDF5Dataset,
    ArrayDataset,
    TensorDataset,
    PatchDataset,
    DataLoader,
    random_split,
    shepp_logan,
    SheppLoganDataset,
)
from deepinv_tpu.physics import Inpainting, Denoising, GaussianNoise
from deepinv_tpu.physics.generator import SigmaGenerator


@pytest.fixture
def images():
    return np.random.default_rng(0).random((10, 1, 16, 16)).astype(np.float32)


def test_generate_dataset_roundtrip(tmp_path, images):
    """x/y pairs written to HDF5 come back with the right shapes and
    reproduce physics(x) (reference datagenerator HDF5 layout)."""
    ds = ArrayDataset(images)
    physics = Denoising(noise_model=GaussianNoise(0.05))
    path = generate_dataset(
        ds, physics, str(tmp_path), batch_size=3, train_datapoints=6,
        test_dataset=ds, test_datapoints=4,
    )
    train = HDF5Dataset(path, train=True)
    test = HDF5Dataset(path, train=False)
    assert len(train) == 6 and len(test) == 4
    x0, y0 = train[0]
    assert x0.shape == (1, 16, 16) and y0.shape == (1, 16, 16)
    # measurements are x + noise at sigma 0.05 (not equal to x)
    assert 0.0 < float(np.abs(np.asarray(y0) - np.asarray(x0)).std()) < 0.2


def test_generate_dataset_with_params(tmp_path, images):
    """PhysicsGenerator params are saved alongside and restored
    (HDF5Dataset(load_physics_generator_params=True))."""
    ds = ArrayDataset(images)
    physics = Denoising(noise_model=GaussianNoise(0.05))
    gen = SigmaGenerator(sigma_min=0.01, sigma_max=0.2)
    path = generate_dataset(
        ds, physics, str(tmp_path), physics_generator=gen,
        batch_size=2, train_datapoints=4,
    )
    train = HDF5Dataset(path, train=True, load_physics_generator_params=True)
    item = train[0]
    assert len(item) == 3
    params = item[2]
    assert "sigma" in params and 0.01 <= float(np.asarray(params["sigma"])) <= 0.2


def test_generate_dataset_multi_operator(tmp_path, images):
    """A list of physics produces one file per operator, round-robin split
    (reference datagenerator.py operators loop)."""
    ds = ArrayDataset(images)
    phys = [
        Inpainting(img_size=(1, 16, 16), mask=0.5, key=jax.random.key(0)),
        Inpainting(img_size=(1, 16, 16), mask=0.8, key=jax.random.key(1)),
    ]
    paths = generate_dataset(ds, phys, str(tmp_path), train_datapoints=6)
    assert isinstance(paths, (list, tuple)) and len(paths) == 2
    for p in paths:
        d = HDF5Dataset(p, train=True)
        assert len(d) == 3


def test_tensor_dataset_and_loader(images):
    y = images * 2.0
    ds = TensorDataset(x=images, y=y)
    assert len(ds) == 10
    x0, y0 = ds[3]
    assert np.allclose(y0, 2.0 * x0)
    loader = DataLoader(ds, batch_size=4, shuffle=True, drop_last=True)
    batches = list(loader)
    assert len(batches) == 2
    xb, yb = batches[0]
    assert xb.shape == (4, 1, 16, 16)
    # ground-truth-free: x placeholder is NaN
    ds2 = TensorDataset(y=y)
    x0, y0 = ds2[0]
    assert np.isnan(np.asarray(x0)).all()


def test_dataloader_shuffle_reproducible(images):
    ds = ArrayDataset(images)
    l1 = DataLoader(ds, batch_size=5, shuffle=True, seed=7)
    l2 = DataLoader(ds, batch_size=5, shuffle=True, seed=7)
    assert np.allclose(next(iter(l1)), next(iter(l2)))


def test_random_split(images):
    ds = ArrayDataset(images)
    a, b = random_split(ds, [7, 3])
    assert len(a) == 7 and len(b) == 3
    seen = {float(a[i][0, 0, 0]) for i in range(7)} | {
        float(b[i][0, 0, 0]) for i in range(3)
    }
    assert len(seen) == 10  # disjoint cover


def test_patch_dataset(images):
    ds = PatchDataset(images, patch_size=8, stride=8)
    assert len(ds) == 10 * 4
    p = ds[0]
    assert p.shape == (1, 8, 8)
    assert np.allclose(p, images[0, :, :8, :8])
    # transforms hook
    ds2 = PatchDataset(images, patch_size=8, stride=8, transforms=lambda v: v * 0)
    assert float(np.abs(ds2[0]).max()) == 0.0


def test_phantoms():
    ph = shepp_logan(32)
    assert ph.shape == (32, 32) and 0.0 <= float(np.min(ph)) and float(np.max(ph)) <= 1.0
    ds = SheppLoganDataset(size=24, length=3)
    assert len(ds) == 3
    assert np.asarray(ds[0]).shape[-2:] == (24, 24)


def test_hdf5_supports_trainer(tmp_path, images):
    """The generated dataset feeds Trainer's offline path end-to-end
    (reference trainer.py get_samples_offline)."""
    from deepinv_tpu.training import Trainer
    from deepinv_tpu.models import DnCNN
    from deepinv_tpu.loss import SupLoss
    import optax

    ds = ArrayDataset(images)
    physics = Denoising(noise_model=GaussianNoise(0.05))
    path = generate_dataset(ds, physics, str(tmp_path), train_datapoints=6)
    train = HDF5Dataset(path, train=True)
    model = DnCNN(1, 1, depth=2, nf=8, pretrained=None)
    trainer = Trainer(
        model=model,
        physics=physics,
        optimizer=optax.adam(1e-3),
        train_dataloader=DataLoader(train, batch_size=3),
        losses=SupLoss(),
        epochs=1,
        online_measurements=False,
        verbose=False,
        show_progress_bar=False,
    )
    out = trainer.train()
    assert out is not None


def test_public_dataset_shells_mocked(tmp_path):
    """Named public datasets load from fabricated local files (the
    reference's DEEPINV_MOCK_TESTS strategy, test_datasets.py:644) and
    refuse download=True in this no-egress environment."""
    from PIL import Image

    from deepinv_tpu.datasets import DIV2K, Set14HR

    rng = np.random.default_rng(0)
    for i in range(3):
        arr = (rng.random((12, 14, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(tmp_path, f"img_{i}.png"))

    ds = DIV2K(str(tmp_path), size=(12, 14))
    assert len(ds) == 3
    x = np.asarray(ds[0])
    assert x.shape == (3, 12, 14) and 0.0 <= x.min() and x.max() <= 1.0

    with pytest.raises(RuntimeError, match="no network"):
        Set14HR(str(tmp_path), download=True)
