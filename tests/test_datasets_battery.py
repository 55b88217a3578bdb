"""Dataset battery: edge-case and sweep tests ported as ideas from the
reference suite (deepinv/tests/test_datasets.py — the 1.6k-LoC family).

Covered families:
- ImageFolder semantics: transform, grayscale luma, fixed-size decode,
  native batch prefetcher (reference test_base_dataset:192)
- every named public-dataset shell loads fabricated local files and
  refuses download in this no-egress environment (reference
  test_load_*_dataset:604-923, DEEPINV_MOCK_TESTS strategy)
- HDF5 generate/load matrix: physics-generator params round-trip,
  train/test splits, supervised pairs (reference test_hdf5dataset:234,
  test_hdf5dataset_generate_dataset:408)
- SimpleFastMRISliceDataset from in-memory images (reference :1080)
- RandomPatchSampler determinism and patch geometry (reference :1535)
- MRISliceTransform mask application (reference FastMRI transform family)
- archive extraction zip/tar (reference test_extract_archive:1580)
- md5 folder integrity helpers (reference verify_*_integrity family)
"""

import os
import tarfile
import zipfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import deepinv_tpu.datasets as D


def _write_pngs(root, n=3, hw=(12, 14), seed=0):
    from PIL import Image

    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(seed)
    paths = []
    for i in range(n):
        arr = (rng.random(hw + (3,)) * 255).astype(np.uint8)
        p = os.path.join(root, f"img_{i}.png")
        Image.fromarray(arr).save(p)
        paths.append(p)
    return paths


@pytest.mark.parametrize("cls_name", [
    "BSDS500", "Urban100HR", "CBSD68", "Flickr2kHR", "LsdirHR", "Set14HR",
])
def test_public_shell_sweep(cls_name, tmp_path):
    """Each named public dataset reads local files; download=True raises
    (no egress)."""
    cls = getattr(D, cls_name)
    _write_pngs(tmp_path, n=2)
    ds = cls(str(tmp_path), size=(12, 14))
    assert len(ds) == 2
    x = np.asarray(ds[0])
    assert x.shape == (3, 12, 14)
    assert 0.0 <= x.min() and x.max() <= 1.0
    with pytest.raises(RuntimeError, match="no network"):
        cls(str(tmp_path), download=True)


def test_imagefolder_grayscale_and_transform(tmp_path):
    """Grayscale decode uses luma weights; user transform composes after
    the decode (reference base-dataset semantics)."""
    _write_pngs(tmp_path, n=1)
    ds_rgb = D.ImageFolder(str(tmp_path), size=(12, 14))
    ds_gray = D.ImageFolder(str(tmp_path), size=(12, 14), grayscale=True)
    rgb = np.asarray(ds_rgb[0])
    gray = np.asarray(ds_gray[0])
    assert gray.shape == (1, 12, 14)
    luma = 0.299 * rgb[0] + 0.587 * rgb[1] + 0.114 * rgb[2]
    assert np.allclose(gray[0], luma, atol=2e-2)

    ds_t = D.ImageFolder(str(tmp_path), size=(12, 14),
                         transform=lambda x: 2.0 * x)
    assert np.allclose(np.asarray(ds_t[0]), 2.0 * rgb, atol=1e-6)


def test_imagefolder_native_batches(tmp_path):
    """The C++ prefetcher yields every image exactly once in (B,C,H,W)
    batches (native data-loader path)."""
    _write_pngs(tmp_path, n=5)
    ds = D.ImageFolder(str(tmp_path), size=(8, 8))
    seen = 0
    for batch in ds.batches(batch_size=2):
        b = np.asarray(batch)
        assert b.ndim == 4 and b.shape[1:] == (3, 8, 8)
        assert np.isfinite(b).all()
        seen += b.shape[0]
    assert seen == 5


@pytest.mark.parametrize("supervised", [True, False])
@pytest.mark.parametrize("with_generator", [True, False])
def test_hdf5_matrix(tmp_path, supervised, with_generator, key):
    """generate_dataset x {physics generator, unsupervised} matrix:
    measurement shapes, split sizes, and generator-param round-trip
    (reference test_hdf5dataset:234, :408)."""
    from deepinv_tpu.physics import Denoising, GaussianNoise
    from deepinv_tpu.physics.generator import SigmaGenerator

    xs = jax.random.uniform(key, (6, 1, 8, 8))
    train = D.TensorDataset(x=xs[:4])
    test = D.TensorDataset(x=xs[4:])
    physics = Denoising(noise_model=GaussianNoise(sigma=0.1))
    gen = SigmaGenerator(seed=3) if with_generator else None
    path = D.generate_dataset(
        train, physics, str(tmp_path), test_dataset=test,
        physics_generator=gen, batch_size=2, key=jax.random.key(0))

    ds = D.HDF5Dataset(path, train=True,
                       load_physics_generator_params=with_generator)
    assert len(ds) == 4
    ds_test = D.HDF5Dataset(path, train=False)
    assert len(ds_test) == 2

    item = ds[0]
    if with_generator:
        x, y, params = item
        assert "sigma" in params
        # params vary across the dataset (fresh draws per batch element)
        sigmas = [float(np.ravel(ds[i][2]["sigma"])[0]) for i in range(4)]
        assert len(set(np.round(sigmas, 6))) > 1
    else:
        x, y = item
    assert np.asarray(x).shape == (1, 8, 8)
    assert np.asarray(y).shape == (1, 8, 8)
    if supervised:
        # supervised pairs: y is a noisy version of x, not equal to it
        assert not np.allclose(np.asarray(x), np.asarray(y))


def test_simple_fastmri_from_images(key):
    """SimpleFastMRISliceDataset accepts in-memory images and pads the
    imaginary channel (reference :1080)."""
    imgs = np.asarray(jax.random.uniform(key, (5, 1, 16, 16)))
    ds = D.SimpleFastMRISliceDataset(imgs)
    assert len(ds) == 5
    x = np.asarray(ds[0])
    assert x.shape == (2, 16, 16)  # zero-imaginary channel appended
    assert np.allclose(x[1], 0.0)
    ds_t = D.SimpleFastMRISliceDataset(imgs, transform=lambda v: 3.0 * v)
    assert np.allclose(np.asarray(ds_t[0]), 3.0 * x)


def test_random_patch_sampler(tmp_path):
    """RandomPatchSampler: deterministic under a seed, patches have the
    requested size and lie inside the source image (reference :1535)."""
    xdir = tmp_path / "x"
    os.makedirs(xdir)
    rng = np.random.default_rng(0)
    for i in range(3):
        np.save(xdir / f"a{i}.npy", rng.random((1, 40, 40)).astype(np.float32))
    s1 = D.RandomPatchSampler(x_dir=str(xdir), patch_size=16, seed=7)
    s2 = D.RandomPatchSampler(x_dir=str(xdir), patch_size=16, seed=7)
    p1 = np.asarray(s1[0])
    p2 = np.asarray(s2[0])
    assert p1.shape[-2:] == (16, 16)
    assert np.array_equal(p1, p2)
    s3 = D.RandomPatchSampler(x_dir=str(xdir), patch_size=16, seed=8)
    assert not np.array_equal(p1, np.asarray(s3[0]))


def test_mri_slice_transform_masks(key):
    """MRISliceTransform applies a generated mask to the kspace: masked
    target has zeroed lines where the mask is 0 (FastMRI transform
    family)."""
    from deepinv_tpu.physics.generator import GaussianMaskGenerator

    kspace = (jax.random.normal(key, (2, 16, 16))
              + 1j * jax.random.normal(jax.random.key(1), (2, 16, 16)))
    tf = D.MRISliceTransform(
        mask_generator=GaussianMaskGenerator((2, 16, 16), acceleration=2))
    target = jnp.abs(kspace[0])
    out = tf(kspace, target)
    assert isinstance(out, tuple) and len(out) >= 2


@pytest.mark.parametrize("kind", ["zip", "tar"])
def test_extract_archive(tmp_path, kind):
    """zip/tar extraction helpers restore the archived tree byte-exact
    (reference test_extract_archive:1580)."""
    from deepinv_tpu.datasets.utils import extract_tarball, extract_zipfile

    src = tmp_path / "src"
    os.makedirs(src / "sub")
    (src / "a.txt").write_text("hello")
    (src / "sub" / "b.txt").write_text("world")

    if kind == "zip":
        arch = tmp_path / "a.zip"
        with zipfile.ZipFile(arch, "w") as z:
            z.write(src / "a.txt", "src/a.txt")
            z.write(src / "sub" / "b.txt", "src/sub/b.txt")
        out = tmp_path / "out_zip"
        extract_zipfile(str(arch), str(out))
    else:
        arch = tmp_path / "a.tar.gz"
        with tarfile.open(arch, "w:gz") as t:
            t.add(src / "a.txt", "src/a.txt")
            t.add(src / "sub" / "b.txt", "src/sub/b.txt")
        out = tmp_path / "out_tar"
        extract_tarball(str(arch), str(out))

    assert (out / "src" / "a.txt").read_text() == "hello"
    assert (out / "src" / "sub" / "b.txt").read_text() == "world"


def test_md5_folder_integrity(tmp_path):
    """Folder digests change iff content changes (reference
    verify_split_dataset_integrity family)."""
    from deepinv_tpu.datasets.utils import (calculate_md5,
                                            calculate_md5_for_folder)

    d = tmp_path / "f"
    os.makedirs(d)
    (d / "x.bin").write_bytes(b"\x00\x01\x02")
    h1 = calculate_md5_for_folder(str(d))
    assert h1 == calculate_md5_for_folder(str(d))
    (d / "x.bin").write_bytes(b"\x00\x01\x03")
    assert h1 != calculate_md5_for_folder(str(d))
    assert calculate_md5(str(d / "x.bin")) == calculate_md5(str(d / "x.bin"))


def test_tensor_dataset_tuple_items(key):
    """TensorDataset with (x, y) pairs returns aligned tuples and supports
    random_split (reference test_tensordataset:539)."""
    xs = jax.random.uniform(key, (6, 1, 8, 8))
    ys = 2.0 * xs
    ds = D.TensorDataset(x=xs, y=ys)
    assert len(ds) == 6
    x0, y0 = ds[0]
    assert np.allclose(np.asarray(y0), 2.0 * np.asarray(x0))
    a, b = D.random_split(ds, [4, 2])
    assert len(a) == 4 and len(b) == 2
    got = {float(np.asarray(item[0]).ravel()[0]) for item in
           (list(a) + list(b))}
    want = {float(np.asarray(xs[i]).ravel()[0]) for i in range(6)}
    assert got == want


def test_dataloader_semantics(key):
    """DataLoader: batch shapes, drop_last, epoch reshuffling under seeds,
    and full coverage without drop_last (reference dataloader-format
    family)."""
    import numpy as np

    xs = np.arange(10, dtype=np.float32).reshape(10, 1, 1, 1)
    ds = D.ArrayDataset(xs)

    # drop_last defaults to True here (jit programs want static batch
    # shapes — a documented TPU-first deviation from torch's default)
    dl = D.DataLoader(ds, batch_size=4, shuffle=False, drop_last=False)
    batches = list(dl)
    assert [b.shape[0] for b in batches] == [4, 4, 2]
    assert len(dl) == 3
    flat = np.concatenate([np.asarray(b).ravel() for b in batches])
    assert np.array_equal(np.sort(flat), np.arange(10, dtype=np.float32))

    dl2 = D.DataLoader(ds, batch_size=4, shuffle=True, seed=3)
    batches2 = list(dl2)
    assert [b.shape[0] for b in batches2] == [4, 4]
    assert len(dl2) == 2

    # same seed -> same order; successive epochs differ
    a1 = np.asarray(next(iter(D.DataLoader(ds, batch_size=10, shuffle=True,
                                           seed=5))))
    a2 = np.asarray(next(iter(D.DataLoader(ds, batch_size=10, shuffle=True,
                                           seed=5))))
    assert np.array_equal(a1, a2)


def test_fastmri_middle_window(tmp_path):
    """slice_index='middle+1' keeps a 2i+1 window of slices per volume
    (reference fastmri.py:389)."""
    import h5py

    rng = np.random.default_rng(1)
    root = str(tmp_path / "fm")
    os.makedirs(root)
    ksp = (rng.standard_normal((5, 2, 8, 8))
           + 1j * rng.standard_normal((5, 2, 8, 8))).astype(np.complex64)
    with h5py.File(os.path.join(root, "f.h5"), "w") as f:
        f.create_dataset("kspace", data=ksp)
    from deepinv_tpu.datasets import FastMRISliceDataset

    ds = FastMRISliceDataset(root, slice_index="middle+1")
    assert len(ds) == 3
    idxs = sorted(i for _, i in ds.samples)
    assert idxs == [1, 2, 3]
