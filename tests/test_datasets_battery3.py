"""Dataset battery wave 3: the reference's HDF5 file-convention matrix
(reference tests/test_datasets.py test_hdf5dataset:234 — split names,
flat-param fallback registration, stacked measurements, complex dtypes,
transforms, NaN ground-truth placeholders) and the check_dataset
accept/reject matrix (:192). Files are fabricated directly in the
REFERENCE's on-disk layout, so these tests prove a reference user's
existing .h5 datasets load unchanged.
"""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

import jax

import deepinv_tpu.datasets as D
from deepinv_tpu.core.tensorlist import TensorList
from deepinv_tpu.datasets import HDF5Dataset, check_dataset

SPLIT_NAMES = ["train", "test", "val", "dummy"]


def _populate(f, field, value, length=10, dtype=np.float32):
    f.create_dataset(field, data=np.full((length, 1, 4, 4), value, dtype))


def _make_reference_file(path, *, splits=SPLIT_NAMES, supervised=True,
                         with_params=False, stack_size=1, length=10,
                         dtype=np.float32):
    """Write the reference's exact layout: value = split_idx*3 + field_idx
    (0=x, 1=y, 2=params) so any cross-field mixup is detectable."""
    with h5py.File(path, "w") as f:
        if stack_size > 1:
            f.attrs["stacked"] = stack_size
        for idx, split in enumerate(splits):
            if supervised:
                _populate(f, f"x_{split}", idx * 3 + 0, length, dtype)
            for s in range(stack_size):
                suffix = f"{s}" if stack_size > 1 else ""
                _populate(f, f"y{suffix}_{split}", idx * 3 + 1, length, dtype)
            if with_params:
                names = ["kernel"] + (["y0"] if stack_size == 1 else [])
                for name in names:
                    _populate(f, f"{name}_{split}", idx * 3 + 2, length, dtype)


# ------------------------------------------------------------ split names --
@pytest.mark.parametrize("split", SPLIT_NAMES)
def test_hdf5_named_splits(tmp_path, split):
    p = str(tmp_path / "d.h5")
    _make_reference_file(p)
    ds = HDF5Dataset(p, split=split)
    x, y = ds[0]
    idx = SPLIT_NAMES.index(split)
    assert float(np.ravel(x)[0]) == idx * 3 + 0
    assert float(np.ravel(y)[0]) == idx * 3 + 1
    assert len(ds) == 10


@pytest.mark.parametrize("train", [True, False])
def test_hdf5_train_flag_maps_to_split(tmp_path, train):
    p = str(tmp_path / "d.h5")
    _make_reference_file(p)
    ds = HDF5Dataset(p, train=train)
    expected = 0 if train else 1  # train=idx0, test=idx1
    assert float(np.ravel(ds[0][0])[0]) == expected * 3


def test_hdf5_split_overrides_train_with_warning(tmp_path):
    p = str(tmp_path / "d.h5")
    _make_reference_file(p)
    with pytest.warns(UserWarning):
        ds = HDF5Dataset(p, train=True, split="val")
    assert float(np.ravel(ds[0][0])[0]) == 2 * 3  # val = idx 2


def test_hdf5_missing_split_raises(tmp_path):
    p = str(tmp_path / "d.h5")
    _make_reference_file(p, splits=["train"])
    with pytest.raises(ValueError):
        HDF5Dataset(p, split="nonexistent")


# -------------------------------------------------- flat param registration --
@pytest.mark.parametrize("split", ["train", "val"])
def test_hdf5_flat_params_fallback(tmp_path, split):
    """Any `{prefix}_{split}` member that is not x/y registers as a physics
    parameter (reference datagenerator.py:100)."""
    p = str(tmp_path / "d.h5")
    _make_reference_file(p, with_params=True)
    ds = HDF5Dataset(p, split=split, load_physics_generator_params=True)
    x, y, params = ds[0]
    idx = SPLIT_NAMES.index(split)
    assert set(params) == {"kernel", "y0"}  # y0 is a param when unstacked
    assert float(np.ravel(params["kernel"])[0]) == idx * 3 + 2


def test_hdf5_params_empty_dict_when_absent(tmp_path):
    p = str(tmp_path / "d.h5")
    _make_reference_file(p)
    item = HDF5Dataset(p, split="train",
                       load_physics_generator_params=True)[0]
    assert len(item) == 3 and item[2] == {}


def test_hdf5_params_ignored_without_flag(tmp_path):
    p = str(tmp_path / "d.h5")
    _make_reference_file(p, with_params=True)
    assert len(HDF5Dataset(p, split="train")[0]) == 2


# ------------------------------------------------------------------ stacked --
@pytest.mark.parametrize("stack_size", [2, 3])
def test_hdf5_stacked_measurements(tmp_path, stack_size):
    """`stacked` attr + y{i}_{split} members load as a TensorList
    (reference datagenerator.py:94); y0 is then NOT a parameter."""
    p = str(tmp_path / "d.h5")
    _make_reference_file(p, stack_size=stack_size, with_params=True)
    ds = HDF5Dataset(p, split="train", load_physics_generator_params=True)
    x, y, params = ds[0]
    assert isinstance(y, TensorList) and len(y.x) == stack_size
    for yk in y.x:
        assert float(np.ravel(np.asarray(yk))[0]) == 1.0
    assert set(params) == {"kernel"}


def test_hdf5_stacked_missing_part_raises(tmp_path):
    p = str(tmp_path / "d.h5")
    with h5py.File(p, "w") as f:
        f.attrs["stacked"] = 2
        _populate(f, "x_train", 0)
        _populate(f, "y0_train", 1)  # y1_train missing
    with pytest.raises(ValueError):
        HDF5Dataset(p, split="train")


# ------------------------------------------------------- dtypes & transform --
@pytest.mark.parametrize("complex_dtype", [np.complex64, np.complex128])
def test_hdf5_complex_data_cast(tmp_path, complex_dtype):
    p = str(tmp_path / "d.h5")
    data = (np.random.default_rng(0).standard_normal((4, 1, 4, 4))
            + 1j * np.random.default_rng(1).standard_normal((4, 1, 4, 4)))
    with h5py.File(p, "w") as f:
        f.create_dataset("x_train", data=data.astype(np.complex128))
        f.create_dataset("y_train", data=data.astype(np.complex128))
    ds = HDF5Dataset(p, split="train", complex_dtype=complex_dtype)
    x, y = ds[0]
    assert x.dtype == complex_dtype and y.dtype == complex_dtype
    np.testing.assert_allclose(x, data[0].astype(complex_dtype))


def test_hdf5_real_dtype_cast(tmp_path):
    p = str(tmp_path / "d.h5")
    _make_reference_file(p, dtype=np.float64)
    ds = HDF5Dataset(p, split="train", dtype=np.float32)
    x, y = ds[0]
    assert x.dtype == np.float32 and y.dtype == np.float32


def test_hdf5_transform_applies_to_x_only(tmp_path):
    p = str(tmp_path / "d.h5")
    _make_reference_file(p)
    calls = []

    def tf(x):
        calls.append(x.shape)
        return x * 2

    ds = HDF5Dataset(p, split="train", transform=tf)
    x, y = ds[0]
    assert calls == [(1, 4, 4)]  # called once, on x only
    assert float(np.ravel(x)[0]) == 0.0  # 0*2
    assert float(np.ravel(y)[0]) == 1.0  # y untouched


# ------------------------------------------------------------- unsupervised --
def test_hdf5_no_ground_truth_nan_placeholder(tmp_path):
    """Files without x return a scalar NaN ground truth (the library's
    dataset convention, reference datagenerator.py:328 docstring)."""
    p = str(tmp_path / "d.h5")
    _make_reference_file(p, supervised=False)
    ds = HDF5Dataset(p, split="train")
    x, y = ds[0]
    assert np.isnan(np.asarray(x)).all() and np.asarray(x).ndim == 0
    assert y.shape == (1, 4, 4)


def test_hdf5_mismatched_sizes_warn_use_min(tmp_path):
    p = str(tmp_path / "d.h5")
    with h5py.File(p, "w") as f:
        _populate(f, "x_train", 0, length=10)
        _populate(f, "y_train", 1, length=7)
    with pytest.warns(UserWarning):
        ds = HDF5Dataset(p, split="train")
    assert len(ds) == 7


# ------------------------------------------------- writer <-> reader format --
def test_generate_dataset_writes_reference_flat_params(tmp_path):
    """generate_dataset emits flat `{param}_{split}` members (the reference
    layout), and HDF5Dataset round-trips them."""
    from deepinv_tpu.physics import Denoising, GaussianNoise
    from deepinv_tpu.physics.generator import SigmaGenerator

    xs = jax.random.uniform(jax.random.key(0), (4, 1, 8, 8))
    path = D.generate_dataset(
        D.TensorDataset(x=xs), Denoising(noise_model=GaussianNoise(0.1)),
        str(tmp_path), physics_generator=SigmaGenerator(),
        batch_size=2, key=jax.random.key(1))
    with h5py.File(path, "r") as f:
        assert "sigma_train" in f and "params_train" not in f
    ds = HDF5Dataset(path, split="train", load_physics_generator_params=True)
    x, y, params = ds[0]
    assert "sigma" in params


def test_hdf5_reads_legacy_group_layout(tmp_path):
    """The repo's pre-r5 `params_{split}` group layout still loads."""
    p = str(tmp_path / "legacy.h5")
    with h5py.File(p, "w") as f:
        _populate(f, "x_train", 0)
        _populate(f, "y_train", 1)
        g = f.create_group("params_train")
        g.create_dataset("sigma", data=np.full((10,), 0.2, np.float32))
    ds = HDF5Dataset(p, split="train", load_physics_generator_params=True)
    x, y, params = ds[0]
    assert float(params["sigma"]) == np.float32(0.2)


# ---------------------------------------------------- check_dataset matrix --
class _MyDataset(D.ImageDataset):
    def __init__(self, item):
        self.item = item

    def __len__(self):
        return 1

    def __getitem__(self, i):
        return self.item


def test_check_dataset_accepts():
    """Reference test_base_dataset (:192) accept list."""
    x = np.zeros((1, 2, 2), np.float32)
    y = np.ones((1, 2, 2), np.float32)
    params = {"a": np.zeros(1, np.float32)}
    for good in (x, (x, y), (np.nan, y), (x, y, params),
                 (np.nan, y, params), (np.nan, params)):
        check_dataset(_MyDataset(good))


def test_check_dataset_rejects():
    x = np.zeros((1, 2, 2), np.float32)
    y = np.ones((1, 2, 2), np.float32)
    params = {"a": np.zeros(1, np.float32)}
    bad = "hello"
    for bad_item in (bad, (bad, y), (x, bad), (bad, y, params),
                     (x, bad, params), (x, y, {1: 2}),
                     (x, x, x, params), (x, params, y)):
        with pytest.raises(RuntimeError):
            check_dataset(_MyDataset(bad_item))


def test_hdf5_short_aux_member_does_not_collapse_len(tmp_path):
    """r5 review: a short auxiliary member must not shrink len(dataset)
    when params are not being loaded (reference update_split_size)."""
    import h5py

    from deepinv_tpu.datasets import HDF5Dataset

    path = str(tmp_path / "d.h5")
    with h5py.File(path, "w") as f:
        f.create_dataset("x_train", data=np.zeros((10, 1, 4, 4), np.float32))
        f.create_dataset("y_train", data=np.zeros((10, 1, 4, 4), np.float32))
        f.create_dataset("norm_train", data=np.zeros((1,), np.float32))
    ds = HDF5Dataset(path, train=True)
    assert len(ds) == 10
    # when params ARE loaded the short member constrains the length
    with pytest.warns(UserWarning):
        dsp = HDF5Dataset(path, train=True,
                          load_physics_generator_params=True)
    assert len(dsp) == 1


def test_hdf5_out_of_range_stack_index_warns(tmp_path):
    """r5 review: a y{i} member beyond the stacked count is a file error —
    warn and ignore instead of reinterpreting it as a parameter."""
    import h5py

    from deepinv_tpu.datasets import HDF5Dataset

    path = str(tmp_path / "d.h5")
    with h5py.File(path, "w") as f:
        f.attrs["stacked"] = 2
        f.create_dataset("x_train", data=np.zeros((4, 1, 4, 4), np.float32))
        for i in range(3):
            f.create_dataset(f"y{i}_train",
                             data=np.zeros((4, 1, 4, 4), np.float32))
    with pytest.warns(UserWarning, match="stacking index"):
        ds = HDF5Dataset(path, train=True,
                         load_physics_generator_params=True)
    assert len(ds) == 4
    x, y, params = ds[0]
    assert params == {}


def test_dataloader_collates_list_items(tmp_path):
    """r5 review: list-returning datasets collate like tuples (torch
    default_collate semantics)."""
    from deepinv_tpu.datasets import DataLoader

    class ListDS:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            return [np.full((1, 2, 2), float(i)), np.full((3,), float(i))]

    batch = next(iter(DataLoader(ListDS(), batch_size=4)))
    assert isinstance(batch, tuple) and len(batch) == 2
    assert batch[0].shape == (4, 1, 2, 2)
    assert batch[1].shape == (4, 3)
