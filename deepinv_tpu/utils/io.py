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


def load_mat(path):
    from scipy.io import loadmat

    return loadmat(path)


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
