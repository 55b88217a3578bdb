"""CMRxRecon and SKM-TEA slice datasets (reference deepinv/datasets/
{cmrxrecon.py:267, skm_tea.py:190}) — local .h5/.mat volumes only."""

from __future__ import annotations

import os

import numpy as np

__all__ = ["CMRxReconSliceDataset", "SKMTEASliceDataset"]


class _H5SliceDataset:
    kspace_key = "kspace"

    def __init__(self, root: str, transform=None):
        import h5py

        self.files = sorted(
            os.path.join(root, f)
            for f in os.listdir(root)
            if f.endswith((".h5", ".mat"))
        )
        if not self.files:
            raise FileNotFoundError(f"no volumes under {root}")
        self.transform = transform
        self.samples = []
        for f in self.files:
            with h5py.File(f, "r") as fh:
                key = self._find_key(fh)
                n = fh[key].shape[0]
            self.samples += [(f, i) for i in range(n)]

    def _find_key(self, fh):
        if self.kspace_key in fh:
            return self.kspace_key
        return list(fh.keys())[0]

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        import h5py

        path, sl = self.samples[i]
        with h5py.File(path, "r") as fh:
            arr = np.asarray(fh[self._find_key(fh)][sl])
        if np.iscomplexobj(arr):
            y = np.stack([arr.real, arr.imag]).astype(np.float32)
        else:
            y = arr[None].astype(np.float32)
        img = np.fft.fftshift(
            np.fft.ifft2(np.fft.ifftshift(arr, axes=(-2, -1)), norm="ortho"),
            axes=(-2, -1),
        )
        x = np.abs(img).astype(np.float32)
        x = x.reshape((-1,) + x.shape[-2:])[:1]
        if self.transform is not None:
            return self.transform(x, y)
        return x, y


class CMRxReconSliceDataset(_H5SliceDataset):
    """Cardiac CMRxRecon slices (reference cmrxrecon.py:267)."""


class SKMTEASliceDataset(_H5SliceDataset):
    """SKM-TEA knee slices (reference skm_tea.py:190)."""
