"""IO helpers (reference deepinv/utils/io.py: load_np/load_mat/load_tiff/...,
DownloadError, get_cache_home honoring DEEPINV_CACHE_DIR) and demo helpers
(utils/demo.py). URL loaders are gated: no network egress here."""

from __future__ import annotations

import os

import numpy as np

__all__ = [
    "DownloadError",
    "load_np",
    "load_mat",
    "load_tiff",
    "load_dicom",
    "load_nifti",
    "load_url",
    "load_example",
    "get_cache_home",
    "get_data_home",
]


class DownloadError(RuntimeError):
    """Raised when remote content cannot be fetched (reference io.py)."""


def get_cache_home() -> str:
    return os.environ.get(
        "DEEPINV_CACHE_DIR", os.path.join(os.path.expanduser("~"), ".cache", "deepinv_tpu")
    )


def get_data_home() -> str:
    return os.path.join(get_cache_home(), "datasets")


def load_np(path):
    return np.load(path)


def load_mat(path, mat73: bool = False):
    """Load a MATLAB ``.mat`` file to a dict of numpy arrays (reference
    utils/io.py:298). With ``mat73=True`` (or when scipy refuses a v7.3
    file), reads the HDF5-based MATLAB 7.3 format natively via h5py —
    arrays are transposed back to MATLAB (column-major) axis order and
    compound real/imag datasets are assembled into complex arrays, matching
    what the ``mat73`` package returns."""
    if not mat73:
        from scipy.io import loadmat

        try:
            return loadmat(path)
        except NotImplementedError:
            pass  # v7.3 file: fall through to the HDF5 reader
    import h5py

    def convert(ds):
        a = np.asarray(ds)
        if a.dtype.names and {"real", "imag"} <= set(a.dtype.names):
            a = a["real"] + 1j * a["imag"]
        # h5py yields reversed (row-major) axes for MATLAB arrays
        return a.transpose(range(a.ndim - 1, -1, -1)) if a.ndim > 1 else a

    out = {}
    with h5py.File(path, "r") as f:
        for k, v in f.items():
            if k == "#refs#":
                continue
            if isinstance(v, h5py.Dataset):
                out[k] = convert(v)
    return out


def load_tiff(path):
    from PIL import Image

    return np.asarray(Image.open(path))


def load_dicom(path, as_tensor: bool = False, apply_rescale: bool = False,
               dtype=None):
    """Read one DICOM slice (reference utils/io.py ``load_dicom``; pydicom
    there). Native explicit-VR-little-endian parser — see
    :mod:`deepinv_tpu.utils.dicom`; pydicom is used when installed. With
    ``as_tensor`` the (H, W) array gains a leading channel dim, matching
    the reference's ``(1, H, W)`` tensor output."""
    from .dicom import load_dicom as _native

    return _native(path, as_tensor=as_tensor, apply_rescale=apply_rescale,
                   dtype=dtype)


# NIfTI-1 datatype code -> numpy dtype (nifti1.h)
_NIFTI_DTYPES = {
    2: np.uint8, 4: np.int16, 8: np.int32, 16: np.float32, 32: np.complex64,
    64: np.float64, 256: np.int8, 512: np.uint16, 768: np.uint32,
    1024: np.int64, 1280: np.uint64, 1792: np.complex128,
}


def load_nifti(path, as_memmap: bool = False, dtype=np.float32, **kwargs):
    """Load a NIfTI-1 volume (reference utils/io.py:457, which wraps
    nibabel). Native parser: the 348-byte header carries dims, datatype,
    ``vox_offset`` and the ``scl_slope/scl_inter`` affine; voxel data is
    Fortran-ordered from ``vox_offset``. Handles ``.nii`` and ``.nii.gz``
    and both endiannesses. ``as_memmap`` returns a ``numpy.memmap`` over
    the raw voxels (uncompressed files only)."""
    import gzip
    import struct

    p = str(path)
    opener = gzip.open if p.endswith(".gz") else open
    with opener(p, "rb") as f:
        hdr = f.read(352)
        (size,) = struct.unpack("<i", hdr[:4])
        bo = "<" if size == 348 else ">"
        if struct.unpack(bo + "i", hdr[:4])[0] != 348:
            raise ValueError(f"{path}: not a NIfTI-1 file (sizeof_hdr != 348)")
        dim = struct.unpack(bo + "8h", hdr[40:56])
        (dtcode,) = struct.unpack(bo + "h", hdr[70:72])
        (vox_offset,) = struct.unpack(bo + "f", hdr[108:112])
        scl_slope, scl_inter = struct.unpack(bo + "2f", hdr[112:120])
        shape = tuple(int(d) for d in dim[1 : 1 + max(dim[0], 1)])
        raw_dt = np.dtype(_NIFTI_DTYPES[dtcode]).newbyteorder(bo)
        count = int(np.prod(shape))
        off = int(vox_offset) if vox_offset else 352
        if as_memmap and opener is open:
            return np.memmap(p, dtype=raw_dt, mode="r", offset=off,
                             shape=shape, order="F")
        f.seek(off)
        a = np.frombuffer(f.read(count * raw_dt.itemsize), dtype=raw_dt)
    a = a.reshape(shape, order="F")
    import math

    # NaN slope/intercept mean "no scaling" per the NIfTI spec (nibabel
    # treats NaN as unset); without this check a NaN slope would turn the
    # whole volume into NaN
    if math.isnan(scl_slope):
        scl_slope = 0.0
    if math.isnan(scl_inter):
        scl_inter = 0.0
    # slope 0 means "no scaling at all" (NIfTI-1 spec; nibabel behavior):
    # the intercept must be ignored too, not applied on its own
    if scl_slope != 0.0 and (scl_slope != 1.0 or scl_inter != 0.0):
        a = a * scl_slope + scl_inter
    return a.astype(dtype) if dtype is not None else a


def load_ismrmd(path, data_name: str = "kspace", data_slice=None, **kwargs):
    """Load complex MRI data from an ISMRMRD/fastMRI HDF5 file (reference
    utils/io.py:262). Returns the real/imag parts stacked on a new leading
    axis — shape ``(2, ...)`` — matching the reference; ``data_slice``
    (int / slice / tuple) is applied to the dataset BEFORE reading so large
    files stream only the requested slab."""
    import h5py

    with h5py.File(path, "r") as f:
        if data_name in f:
            ds = f[data_name]
        else:  # ISMRMRD proper nests datasets under a group
            found = []
            f.visititems(lambda n, o: found.append(o)
                         if isinstance(o, h5py.Dataset)
                         and n.split("/")[-1] == data_name else None)
            if not found:
                raise KeyError(f"{data_name!r} not found in {path}")
            ds = found[0]
        a = np.asarray(ds[data_slice] if data_slice is not None else ds[()])
    if np.iscomplexobj(a):
        return np.stack([a.real, a.imag], 0)
    return a


def load_raster(path, patch=False, patch_start=(0, 0), transform=None,
                **kwargs):
    """Load a raster image as ``(C, H, W)`` or stream patches (reference
    utils/io.py:330, which wraps rasterio). PIL-backed: covers plain and
    tiled TIFF/GeoTIFF pixel data (no CRS metadata — the reference's
    tensor output carries none either). ``patch=int | (h, w)`` yields
    row-major ``(C, h, w)`` patches starting at ``patch_start``;
    ``patch=True`` (internal block windows) needs rasterio and raises."""
    from PIL import Image

    a = np.asarray(Image.open(path))
    if a.ndim == 2:
        a = a[None]
    else:
        a = np.moveaxis(a, -1, 0)
    if patch is False:
        return a if transform is None else transform(a)
    if patch is True:
        raise NotImplementedError(
            "patch=True streams the raster's internal block windows, which "
            "requires rasterio; pass an explicit patch size instead")
    ph, pw = (patch, patch) if isinstance(patch, int) else patch
    h0, w0 = patch_start

    def gen():
        for i in range(h0, a.shape[1] - ph + 1, ph):
            for j in range(w0, a.shape[2] - pw + 1, pw):
                p = a[:, i : i + ph, j : j + pw]
                yield p if transform is None else transform(p)

    return gen()


def load_url(url, **kwargs):
    raise DownloadError(
        f"cannot fetch {url}: this environment has no network access. "
        "Place the file locally and use the load_* functions."
    )


def load_example(name, **kwargs):
    """The reference fetches examples from HuggingFace (demo.py:35); here we
    synthesize standard phantoms for the known names and raise otherwise."""
    from ..datasets.phantoms import shepp_logan, random_circles

    if "shepp" in name.lower() or "ct" in name.lower():
        return shepp_logan(kwargs.get("size", 128))[None, None]
    if "circle" in name.lower():
        return random_circles(kwargs.get("size", 64), seed=kwargs.get("seed", 0))[None]
    raise DownloadError(
        f"example {name!r} requires a download; no network access available"
    )
