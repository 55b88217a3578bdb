"""FastMRI dataset battery: slice indexing variants, k-space helper
round-trips, RSS coil combination, center cropping, simple-dataset export
(reference deepinv/tests/test_datasets.py test_FastMRISliceDataset:1110).
"""

import os

import h5py
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepinv_tpu.datasets import FastMRISliceDataset


def _make_root(tmp_path, n_files=2, n_slices=4, coils=2, hw=(16, 16)):
    rng = np.random.default_rng(7)
    root = str(tmp_path / "fastmri")
    os.makedirs(root, exist_ok=True)
    for i in range(n_files):
        ksp = (rng.standard_normal((n_slices, coils) + hw)
               + 1j * rng.standard_normal((n_slices, coils) + hw)
               ).astype(np.complex64)
        with h5py.File(os.path.join(root, f"file{i}.h5"), "w") as f:
            f.create_dataset("kspace", data=ksp)
    return root


@pytest.mark.parametrize("slice_index,expected", [
    ("all", 8), ("middle", 2), (0, 2), ([0, 1], 4),
])
def test_slice_index_variants(tmp_path, slice_index, expected):
    """slice_index selects which slices enter the index (reference
    :1110 sweep: 'all' / 'middle' / int / list)."""
    root = _make_root(tmp_path)
    ds = FastMRISliceDataset(root, slice_index=slice_index)
    assert len(ds) == expected
    item = ds[0]
    target, kspace = (item if isinstance(item, tuple) else (None, item))
    assert np.asarray(kspace).ndim >= 3


def test_kspace_helpers_roundtrip(key):
    """im_to_kspace / kspace_to_im round-trip on the 2-channel real
    convention, and to/from-complex invert each other (MRIMixin helpers,
    reference utils/mixins.py:118)."""
    x = jax.random.normal(key, (1, 2, 16, 16))  # (B, re/im, H, W)
    ksp = FastMRISliceDataset.im_to_kspace(x)
    back = FastMRISliceDataset.kspace_to_im(ksp)
    assert back.shape == x.shape
    assert float(jnp.max(jnp.abs(back - x))) < 1e-4

    z = FastMRISliceDataset.to_complex(x)       # (B, 1, H, W) complex
    assert jnp.iscomplexobj(z) and z.shape == (1, 1, 16, 16)
    again = FastMRISliceDataset.from_complex(z)
    assert float(jnp.max(jnp.abs(again - x))) < 1e-6


def test_rss_combines_coils(key):
    """Root-sum-of-squares over the re/im channel and the coil axis:
    rss^2 == sum_{ch, coil} x^2 (reference utils/mixins.py:250)."""
    x = jax.random.normal(key, (1, 2, 4, 16, 16))  # (B, re/im, coil, H, W)
    r = FastMRISliceDataset.rss(x, multicoil=True, keepdim=True)
    want = jnp.sqrt(jnp.sum(x ** 2, axis=(1, 2)))
    assert float(jnp.max(jnp.abs(jnp.squeeze(r) - jnp.squeeze(want)))) < 1e-4


def test_crop_center_semantics(key):
    """crop_center extracts the centered window (reference crop)."""
    x = jax.random.normal(key, (1, 16, 16))
    c = FastMRISliceDataset.crop_center(x, (8, 8))
    assert c.shape[-2:] == (8, 8)
    assert float(jnp.max(jnp.abs(c - x[..., 4:12, 4:12]))) < 1e-6


def test_save_simple_dataset(tmp_path, key):
    """save_simple_dataset exports RSS magnitude images loadable by
    SimpleFastMRISliceDataset (reference fastmri.py save_simple_dataset)."""
    from deepinv_tpu.datasets import SimpleFastMRISliceDataset

    root = _make_root(tmp_path)
    ds = FastMRISliceDataset(root, slice_index="middle")
    out = str(tmp_path / "simple.npy")
    ds.save_simple_dataset(out, pad_to_size=(8, 8))
    assert os.path.exists(out)
    simple = SimpleFastMRISliceDataset(out)
    assert len(simple) == len(ds)
    x = np.asarray(simple[0])
    assert x.shape[-2:] == (8, 8)
    assert np.isfinite(x).all()
