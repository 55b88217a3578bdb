"""FastMRI slice datasets (reference deepinv/datasets/fastmri.py, 748 LoC).

Reads the standard fastMRI ``.h5`` volumes (k-space + reconstruction) and
serves 2D slices in this framework's (2, H, W) real/imag convention.
No downloads: point ``root`` at local fastMRI files.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

__all__ = ["FastMRISliceDataset", "SimpleFastMRISliceDataset"]


class FastMRISliceDataset:
    """Slices from raw fastMRI k-space volumes (reference fastmri.py).

    Each item is ``(x, y)``: magnitude target (1, H, W) and k-space
    measurement (2, H, W) (single-coil) or (2, N, H, W) (multi-coil).

    :param root: directory of ``.h5`` fastMRI files.
    :param slice_index: 'all' | 'middle' | int.
    """

    def __init__(self, root: str, slice_index="all", load_metadata_from_cache: bool = False, transform=None):
        import h5py

        self.root = root
        self.transform = transform
        files = sorted(
            os.path.join(root, f) for f in os.listdir(root) if f.endswith(".h5")
        )
        if not files:
            raise FileNotFoundError(f"no fastMRI .h5 files in {root}")
        self.samples = []
        for f in files:
            with h5py.File(f, "r") as fh:
                n_slices = fh["kspace"].shape[0]
            if slice_index == "all":
                idxs = range(n_slices)
            elif slice_index == "middle":
                idxs = [n_slices // 2]
            else:
                idxs = [int(slice_index)]
            self.samples += [(f, i) for i in idxs]

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        import h5py

        path, sl = self.samples[i]
        with h5py.File(path, "r") as fh:
            kspace = np.asarray(fh["kspace"][sl])  # (H, W) or (N, H, W) complex
            recon_key = next(
                (k for k in ("reconstruction_rss", "reconstruction_esc") if k in fh),
                None,
            )
            target = np.asarray(fh[recon_key][sl]) if recon_key else None
        y = np.stack([kspace.real, kspace.imag]).astype(np.float32)
        if target is None:
            # fall back to root-sum-of-squares of the inverse FFT
            img = np.fft.fftshift(
                np.fft.ifft2(np.fft.ifftshift(kspace, axes=(-2, -1)), norm="ortho"),
                axes=(-2, -1),
            )
            target = np.sqrt((np.abs(img) ** 2).reshape(-1, *img.shape[-2:]).sum(0))
        x = target[None].astype(np.float32)
        if self.transform is not None:
            x, y = self.transform(x, y)
        return x, y


class SimpleFastMRISliceDataset:
    """In-memory magnitude-image dataset (reference SimpleFastMRISliceDataset):
    2-channel zero-imaginary images ready for MRI physics."""

    def __init__(self, root_or_images, train: bool = True, transform=None):
        if isinstance(root_or_images, (list, tuple, np.ndarray)):
            imgs = np.asarray(root_or_images, np.float32)
        else:
            imgs = np.load(root_or_images)
        if imgs.ndim == 3:
            imgs = imgs[:, None]
        self.x = imgs.astype(np.float32)
        self.transform = transform

    def __len__(self):
        return len(self.x)

    def __getitem__(self, i):
        x = self.x[i]
        if x.shape[0] == 1:
            x = np.concatenate([x, np.zeros_like(x)], axis=0)
        if self.transform is not None:
            x = self.transform(x)
        return x
