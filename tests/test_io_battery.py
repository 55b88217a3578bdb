"""IO loader battery: native NIfTI-1 / ISMRMRD / raster / DICOM readers.

Mirrors the reference's io tests (reference tests/test_utils.py:1007-1199
test_io_dicom / test_io_nifti / test_io_ismrmd / test_io_raster /
test_io_torch / test_io_np) on synthetic in-tmpdir files instead of
downloads (zero egress): each file is fabricated byte-by-byte in the real
format, so the parsers are exercised end-to-end.
"""

import gzip
import os
import struct

import numpy as np
import pytest

from deepinv_tpu.utils import (
    load_dicom, load_ismrmd, load_nifti, load_np, load_raster, load_tiff,
    load_torch,
)


# --------------------------------------------------------------- NIfTI-1 --
def _write_nifti(path, arr, dtcode, scl_slope=0.0, scl_inter=0.0,
                 gz=False, byteorder="<"):
    """Fabricate a minimal NIfTI-1 single file (348-byte header + raw
    Fortran-ordered voxels at vox_offset=352)."""
    hdr = bytearray(348)
    struct.pack_into(byteorder + "i", hdr, 0, 348)
    dims = [arr.ndim] + list(arr.shape) + [1] * (7 - arr.ndim)
    struct.pack_into(byteorder + "8h", hdr, 40, *dims)
    struct.pack_into(byteorder + "h", hdr, 70, dtcode)
    struct.pack_into(byteorder + "h", hdr, 72, arr.dtype.itemsize * 8)
    struct.pack_into(byteorder + "f", hdr, 108, 352.0)
    struct.pack_into(byteorder + "2f", hdr, 112, scl_slope, scl_inter)
    hdr[344:348] = b"n+1\x00"
    payload = bytes(hdr) + b"\x00" * 4 + np.asfortranarray(
        arr.astype(arr.dtype.newbyteorder(byteorder))).tobytes(order="F")
    opener = gzip.open if gz else open
    with opener(path, "wb") as f:
        f.write(payload)


@pytest.mark.parametrize("dtcode,np_dt", [(2, np.uint8), (4, np.int16),
                                          (16, np.float32), (64, np.float64)])
@pytest.mark.parametrize("gz", [False, True])
def test_nifti_roundtrip(tmp_path, dtcode, np_dt, gz):
    rng = np.random.default_rng(0)
    vol = (rng.random((7, 5, 3)) * 100).astype(np_dt)
    p = str(tmp_path / ("v.nii.gz" if gz else "v.nii"))
    _write_nifti(p, vol, dtcode, gz=gz)
    out = load_nifti(p)
    assert out.shape == (7, 5, 3)
    assert out.dtype == np.float32  # default cast, reference signature
    np.testing.assert_allclose(out, vol.astype(np.float32))


def test_nifti_scl_slope_inter(tmp_path):
    vol = np.arange(24, dtype=np.int16).reshape(2, 3, 4)
    p = str(tmp_path / "v.nii")
    _write_nifti(p, vol, 4, scl_slope=2.5, scl_inter=-3.0)
    out = load_nifti(p, dtype=np.float64)
    np.testing.assert_allclose(out, vol * 2.5 - 3.0)


def test_nifti_big_endian(tmp_path):
    vol = np.arange(12, dtype=np.float32).reshape(3, 4)
    p = str(tmp_path / "be.nii")
    _write_nifti(p, vol, 16, byteorder=">")
    np.testing.assert_allclose(load_nifti(p), vol)


def test_nifti_memmap(tmp_path):
    vol = np.arange(60, dtype=np.float32).reshape(3, 4, 5)
    p = str(tmp_path / "v.nii")
    _write_nifti(p, vol, 16)
    mm = load_nifti(p, as_memmap=True)
    assert isinstance(mm, np.memmap)
    assert mm.shape == (3, 4, 5)
    np.testing.assert_allclose(np.asarray(mm), vol)


def test_nifti_fortran_order_matters(tmp_path):
    """Voxels are column-major on disk; a C-order read would transpose."""
    vol = np.arange(6, dtype=np.float32).reshape(2, 3)
    p = str(tmp_path / "f.nii")
    _write_nifti(p, vol, 16)
    out = load_nifti(p)
    assert out[1, 0] == vol[1, 0] and out[0, 2] == vol[0, 2]


def test_nifti_rejects_non_nifti(tmp_path):
    p = tmp_path / "x.nii"
    p.write_bytes(b"\x00" * 352)
    with pytest.raises(ValueError):
        load_nifti(str(p))


# -------------------------------------------------------------- ISMRMRD --
def test_ismrmd_complex_stacking(tmp_path):
    h5py = pytest.importorskip("h5py")
    p = str(tmp_path / "k.h5")
    rng = np.random.default_rng(1)
    k = (rng.standard_normal((16, 4, 12, 9))
         + 1j * rng.standard_normal((16, 4, 12, 9))).astype(np.complex64)
    with h5py.File(p, "w") as f:
        f["kspace"] = k
    out = load_ismrmd(p, data_name="kspace")
    # (2, X, N, H, W): real/imag stacked on a new leading axis (reference
    # io.py:262 returns the same layout as a torch tensor)
    assert out.shape == (2, 16, 4, 12, 9)
    np.testing.assert_allclose(out[0], k.real)
    np.testing.assert_allclose(out[1], k.imag)


def test_ismrmd_data_slice(tmp_path):
    h5py = pytest.importorskip("h5py")
    p = str(tmp_path / "k.h5")
    k = (np.arange(16 * 4 * 6 * 5).reshape(16, 4, 6, 5)).astype(np.complex64)
    with h5py.File(p, "w") as f:
        f["kspace"] = k
    assert load_ismrmd(p, data_slice=0).shape == (2, 4, 6, 5)
    assert load_ismrmd(p, data_slice=(0, slice(0, 2))).shape == (2, 2, 6, 5)


def test_ismrmd_nested_group_lookup(tmp_path):
    h5py = pytest.importorskip("h5py")
    p = str(tmp_path / "ismrmrd.h5")
    data = np.ones((3, 4), np.float32)
    with h5py.File(p, "w") as f:
        f.create_group("dataset")["data"] = data
    np.testing.assert_allclose(load_ismrmd(p, data_name="data"), data)
    with pytest.raises(KeyError):
        load_ismrmd(p, data_name="missing")


# ---------------------------------------------------------------- raster --
def _write_tiff(path, arr):
    from PIL import Image

    Image.fromarray(arr).save(path)


def test_raster_full_image(tmp_path):
    p = str(tmp_path / "r.tiff")
    rgb = np.random.default_rng(2).integers(0, 255, (20, 30, 3), np.uint8)
    _write_tiff(p, rgb)
    out = load_raster(p)
    assert out.shape == (3, 20, 30)  # (C, H, W), bands first
    np.testing.assert_array_equal(out, np.moveaxis(rgb, -1, 0))


def test_raster_grayscale_gets_channel(tmp_path):
    p = str(tmp_path / "g.tiff")
    g = np.random.default_rng(3).integers(0, 255, (8, 9), np.uint8)
    _write_tiff(p, g)
    assert load_raster(p).shape == (1, 8, 9)


@pytest.mark.parametrize("patch", [4, (4, 6)])
def test_raster_patches(tmp_path, patch):
    p = str(tmp_path / "r.tiff")
    rgb = np.random.default_rng(4).integers(0, 255, (12, 18, 3), np.uint8)
    _write_tiff(p, rgb)
    ph, pw = (patch, patch) if isinstance(patch, int) else patch
    patches = list(load_raster(p, patch=patch))
    assert len(patches) == (12 // ph) * (18 // pw)
    assert all(q.shape == (3, ph, pw) for q in patches)
    np.testing.assert_array_equal(patches[0],
                                  np.moveaxis(rgb[:ph, :pw], -1, 0))


def test_raster_patch_start_and_transform(tmp_path):
    p = str(tmp_path / "r.tiff")
    g = np.arange(100, dtype=np.uint8).reshape(10, 10)
    _write_tiff(p, g)
    out = list(load_raster(p, patch=5, patch_start=(5, 5),
                           transform=lambda q: q.astype(np.float32) * 2))
    assert len(out) == 1
    np.testing.assert_allclose(out[0][0], g[5:, 5:] * 2.0)


def test_raster_block_windows_needs_rasterio(tmp_path):
    p = str(tmp_path / "r.tiff")
    _write_tiff(p, np.zeros((4, 4), np.uint8))
    with pytest.raises(NotImplementedError):
        load_raster(p, patch=True)


# ----------------------------------------------------------------- DICOM --
def _write_minimal_dicom(path, arr, slope=1.0, intercept=0.0):
    """Explicit-VR little-endian DICOM part-10 (same fabrication as
    tests/test_datasets.py, reused for the public loader's matrix)."""

    def elem(group, el, vr, value):
        head = struct.pack("<HH", group, el) + vr
        if vr in (b"OB", b"OW"):
            return head + b"\x00\x00" + struct.pack("<I", len(value)) + value
        return head + struct.pack("<H", len(value)) + value

    def ds_value(x):
        s = f"{x:g}".encode()
        return s + b" " if len(s) % 2 else s

    rows, cols = arr.shape
    body = b""
    body += elem(0x0028, 0x0010, b"US", struct.pack("<H", rows))
    body += elem(0x0028, 0x0011, b"US", struct.pack("<H", cols))
    body += elem(0x0028, 0x0100, b"US", struct.pack("<H", 16))
    body += elem(0x0028, 0x0103, b"US", struct.pack("<H", 1))
    body += elem(0x0028, 0x1052, b"DS", ds_value(intercept))
    body += elem(0x0028, 0x1053, b"DS", ds_value(slope))
    body += elem(0x7FE0, 0x0010, b"OW", arr.astype("<i2").tobytes())
    with open(path, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM" + body)


@pytest.mark.parametrize("apply_rescale", [True, False])
@pytest.mark.parametrize("as_tensor", [True, False])
def test_io_dicom_matrix(tmp_path, apply_rescale, as_tensor):
    """Reference test_utils.py:1007 matrix, on a fabricated slice."""
    import jax.numpy as jnp

    arr = np.random.default_rng(5).integers(-1000, 2000, (16, 14),
                                            dtype=np.int16)
    p = str(tmp_path / "s.dcm")
    _write_minimal_dicom(p, arr, slope=2.0, intercept=-1024.0)
    out = load_dicom(p, as_tensor=as_tensor, apply_rescale=apply_rescale)
    if as_tensor:
        assert isinstance(out, jnp.ndarray)
    else:
        assert isinstance(out, np.ndarray)
    expected = arr * 2.0 - 1024.0 if apply_rescale else arr
    np.testing.assert_allclose(np.asarray(out), expected)


# ------------------------------------------------------------ np / torch --
def test_io_np_and_torch(tmp_path):
    import torch

    a = np.random.default_rng(6).random((5, 7)).astype(np.float32)
    np.save(tmp_path / "a.npy", a)
    np.testing.assert_allclose(load_np(str(tmp_path / "a.npy")), a)

    t = {"w": torch.arange(6.0).reshape(2, 3)}
    torch.save(t, tmp_path / "w.pt")
    out = load_torch(str(tmp_path / "w.pt"))
    np.testing.assert_allclose(out["w"], t["w"].numpy())


def test_load_tiff_matches_pil(tmp_path):
    g = np.random.default_rng(7).integers(0, 255, (6, 8), np.uint8)
    _write_tiff(str(tmp_path / "t.tiff"), g)
    np.testing.assert_array_equal(load_tiff(str(tmp_path / "t.tiff")), g)
