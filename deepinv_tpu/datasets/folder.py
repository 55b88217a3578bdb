"""Image folder + download-gated public datasets
(reference deepinv/datasets/{base.py, div2k.py, urban100.py, set14.py,
bsds500.py, cbsd68.py, ...}).

This environment has no network egress, so the public dataset classes load
from a local ``root`` if the files exist and raise a clear error otherwise
(the reference downloads from their URLs; ``download=True`` is refused
here). ``ImageFolder`` covers any directory of images.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np

__all__ = [
    "load_image",
    "ImageFolder",
    "DIV2K",
    "Urban100HR",
    "Set14HR",
    "CBSD68",
    "BSDS500",
    "Flickr2kHR",
    "LsdirHR",
]

IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".bmp", ".tif", ".tiff", ".webp")


def load_image(path, size=None, to_float: bool = True, grayscale: bool = False):
    """Load an image file to a (C, H, W) numpy array."""
    from PIL import Image

    img = Image.open(path)
    img = img.convert("L" if grayscale else "RGB")
    if size is not None:
        if isinstance(size, int):  # reference accepts int or (h, w)
            size = (size, size)
        # bilinear, matching the native C++ decoder's resampling so
        # backend='auto' gives consistent pixels with or without a toolchain
        img = img.resize((size[1], size[0]), Image.BILINEAR)
    arr = np.asarray(img)
    if arr.ndim == 2:
        arr = arr[None]
    else:
        arr = arr.transpose(2, 0, 1)
    if to_float:
        arr = arr.astype(np.float32) / 255.0
    return arr


from .base import ImageDataset


class ImageFolder(ImageDataset):
    """Dataset over all images under a directory (reference ImageFolder).

    :param backend: ``'auto'`` (native C++ decoder when compiled and usable
        for this item — PNG/JPEG with a fixed ``size`` — else PIL),
        ``'native'`` (require the C++ loader, see
        :mod:`deepinv_tpu.native`), or ``'pil'``.
    """

    def __init__(self, root: str, transform: Optional[Callable] = None, size=None,
                 grayscale: bool = False, backend: str = "auto"):
        self.root = root
        self.transform = transform
        self.size = size
        self.grayscale = grayscale
        self.paths = []
        for dirpath, _, files in os.walk(root):
            for f in sorted(files):
                if f.lower().endswith(IMG_EXTENSIONS):
                    self.paths.append(os.path.join(dirpath, f))
        if not self.paths:
            raise FileNotFoundError(f"no images under {root}")
        if backend not in ("auto", "native", "pil"):
            raise ValueError(f"unknown backend {backend!r}")
        self.backend = backend
        if backend in ("auto", "native"):
            from ..native import native_available

            ok = native_available()
            if backend == "native" and not ok:
                raise RuntimeError("native image loader unavailable (no g++?)")
            self._native = ok
        else:
            self._native = False

    def _native_usable(self, path):
        return (
            self._native
            and self.size is not None
            and path.lower().endswith((".png", ".jpg", ".jpeg"))
        )

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, i):
        path = self.paths[i]
        if self._native_usable(path):
            from ..native import decode_image

            if self.grayscale:
                # match PIL 'L' luma weights on RGB sources
                rgb = decode_image(path, (3,) + tuple(self.size), mode="resize")
                x = 0.299 * rgb[:1] + 0.587 * rgb[1:2] + 0.114 * rgb[2:3]
            else:
                x = decode_image(path, (3,) + tuple(self.size), mode="resize")
        else:
            x = load_image(path, size=self.size, grayscale=self.grayscale)
        if self.transform is not None:
            x = self.transform(x)
        return x

    def batches(self, batch_size: int, n_threads: int = 0):
        """Iterate numpy (B, C, H, W) batches decoded by the C++ prefetcher
        (double-buffered background loading — see
        :class:`deepinv_tpu.native.NativePrefetcher`). Requires ``size``."""
        if self.size is None:
            raise ValueError("batches() needs a fixed `size`")
        from ..native import NativePrefetcher

        C = 1 if self.grayscale else 3
        return NativePrefetcher(
            self.paths, batch_size, (C,) + tuple(self.size), n_threads=n_threads
        )


class _PublicDataset(ImageFolder):
    """Base for named public datasets: local-files-only (no egress)."""

    name = "dataset"

    def __init__(self, root: str, download: bool = False, **kwargs):
        if download:
            raise RuntimeError(
                f"{self.name}: this environment has no network access; place "
                f"the files under {root} manually (the reference downloads "
                f"from its hub)."
            )
        super().__init__(root, **kwargs)


class DIV2K(_PublicDataset):
    name = "DIV2K"

    # official archive MD5s (reference div2k.py:69)
    _checksums = {
        "DIV2K_train_HR": "f9de9c251af455c1021017e61713a48b",
        "DIV2K_valid_HR": "542325e500b0a474c7ad18bae922da72",
    }

    def verify_split_dataset_integrity(self, mode: str = "train") -> bool:
        """Verify the raw DIV2K split folder under ``root`` against the
        official MD5 (reference div2k.py:131): hashes every file in
        ``DIV2K_{train,valid}_HR`` and compares folder digests."""
        from .utils import calculate_md5_for_folder

        root = getattr(self, "root", None)
        if root is None or not os.path.isdir(root):
            return False
        split = "DIV2K_train_HR" if mode == "train" else "DIV2K_valid_HR"
        return (
            calculate_md5_for_folder(os.path.join(root, split))
            == self._checksums[split]
        )


class Urban100HR(_PublicDataset):
    name = "Urban100"


class Set14HR(_PublicDataset):
    name = "Set14"


class CBSD68(_PublicDataset):
    name = "CBSD68"


class BSDS500(_PublicDataset):
    name = "BSDS500"


class Flickr2kHR(_PublicDataset):
    name = "Flickr2k"


class LsdirHR(_PublicDataset):
    name = "LSDIR"

    # official archive MD5s (reference lsdir.py:93)
    _checksums = {
        "train": "a83bdb97076d617e4965913195cc84d1",
        "val": "972ba478c530b76eb9404b038597f65f",
    }

    def verify_split_dataset_integrity(self, mode: str = "train") -> bool:
        """Verify the raw LSDIR split under ``root`` (reference
        lsdir.py:175): hash every shard folder (``0001000``..``0085000``
        for train, ``val1/HR/val`` for val) and compare the combined
        digest."""
        import hashlib

        from .utils import calculate_md5_for_folder

        root = getattr(self, "root", None)
        if root is None or not os.path.isdir(root):
            return False
        if mode == "train":
            dirs = [
                os.path.join(root, str(i * 1000).zfill(7)) for i in range(1, 86)
            ]
        else:
            dirs = [os.path.join(root, "val1", "HR", "val")]
        md5_folders = hashlib.md5()
        for d in dirs:
            md5_folders.update(calculate_md5_for_folder(d).encode())
        return md5_folders.hexdigest() == self._checksums[mode]
