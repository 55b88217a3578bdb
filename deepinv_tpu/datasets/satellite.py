"""NBU satellite pansharpening dataset
(reference deepinv/datasets/satellite.py:89, layout :128-148).

On-disk layout::

    root --- <satellite> --- MS_256/   1.mat ... N.mat   (key "imgMS")
                          -- PAN_1024/ 1.mat ... N.mat   (key "imgPAN")

Items are multispectral images (C, 256, 256) in [0, 1] — or, with
``return_pan=True``, a :class:`deepinv_tpu.TensorList` of (MS, PAN) for
pansharpening physics.
"""

from __future__ import annotations

import os
import re
from typing import Callable

import numpy as np

__all__ = ["NBUDataset"]

SATELLITES = (
    "ikonos", "gaofen-1", "quickbird", "worldview-2", "worldview-3",
    "worldview-4",
)


def _natsort(paths):
    """Natural sort (the reference uses natsort: 2.mat < 10.mat)."""
    def key(p):
        return [int(t) if t.isdigit() else t
                for t in re.split(r"(\d+)", os.path.basename(p))]

    return sorted(paths, key=key)


from .base import ImageDataset


class NBUDataset(ImageDataset):
    """NBU dataset with the reference's .mat pairing
    (reference satellite.py:89-176).

    :param root_dir: dataset root (contains one folder per satellite).
    :param satellite: one of ``ikonos``, ``gaofen-1``, ``quickbird``,
        ``worldview-2/3/4``.
    :param return_pan: return (MS, PAN) TensorList pairs.
    :param transform_ms: optional transform on the normalized MS array.
    :param transform_pan: optional transform on the normalized PAN array.
    """

    def __init__(
        self,
        root_dir: str,
        satellite: str = "gaofen-1",
        return_pan: bool = False,
        transform_ms: Callable = None,
        transform_pan: Callable = None,
        download: bool = False,
    ):
        if download:
            raise RuntimeError(
                "NBU: zero-egress environment; place nbu_<satellite>.zip "
                f"extracted under {root_dir} (reference satellite.py:112)."
            )
        if satellite not in SATELLITES:
            raise ValueError(f"satellite must be one of {SATELLITES}")
        self.data_dir = os.path.join(root_dir, satellite)
        # gaofen-1 is 10-bit, the rest 11-bit (reference satellite.py:103)
        denom = 1023.0 if satellite == "gaofen-1" else 2047.0
        self.normalize = lambda a: (np.asarray(a) / denom).astype(np.float32)
        self.return_pan = return_pan
        self.transform_ms = transform_ms
        self.transform_pan = transform_pan

        ms_dir = os.path.join(self.data_dir, "MS_256")
        pan_dir = os.path.join(self.data_dir, "PAN_1024")
        self.ms_paths = _natsort(
            [os.path.join(ms_dir, f) for f in os.listdir(ms_dir)
             if f.endswith(".mat")]
        ) if os.path.isdir(ms_dir) else []
        self.pan_paths = _natsort(
            [os.path.join(pan_dir, f) for f in os.listdir(pan_dir)
             if f.endswith(".mat")]
        ) if os.path.isdir(pan_dir) else []
        if not self.ms_paths:
            raise FileNotFoundError(
                f"NBU: no MS_256/*.mat under {self.data_dir}"
            )
        if len(self.ms_paths) != len(self.pan_paths):
            raise ValueError("NBU: MS_256 and PAN_1024 counts differ")
        for m, p in zip(self.ms_paths, self.pan_paths):
            if os.path.basename(m) != os.path.basename(p):
                raise ValueError("MS and PAN filenames do not match.")
        self.image_paths = list(zip(self.ms_paths, self.pan_paths))

    def __len__(self) -> int:
        return len(self.image_paths)

    def __getitem__(self, idx: int):
        from scipy.io import loadmat

        ms_path, pan_path = self.image_paths[idx]
        ms = self.normalize(loadmat(ms_path)["imgMS"])
        pan = self.normalize(loadmat(pan_path)["imgPAN"])
        # HWC -> CHW (the reference's ToTensor)
        ms = np.moveaxis(ms, -1, 0) if ms.ndim == 3 else ms[None]
        pan = pan[None] if pan.ndim == 2 else np.moveaxis(pan, -1, 0)
        if self.transform_ms is not None:
            ms = self.transform_ms(ms)
        if self.transform_pan is not None:
            pan = self.transform_pan(pan)
        if self.return_pan:
            from ..core import TensorList

            return TensorList([ms, pan])
        return ms
