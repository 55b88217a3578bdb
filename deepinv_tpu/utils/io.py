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


def load_dicom(path):
    try:
        import pydicom
    except ImportError as e:
        raise ImportError("load_dicom requires pydicom") from e
    return pydicom.dcmread(path).pixel_array


def load_nifti(path):
    try:
        import nibabel
    except ImportError as e:
        raise ImportError("load_nifti requires nibabel") from e
    return np.asarray(nibabel.load(path).get_fdata())


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
