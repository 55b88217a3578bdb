"""LIDC-IDRI CT slice dataset
(reference deepinv/datasets/lidc_idri.py:84, layout :98-141).

On-disk layout (as distributed by TCIA's NBIA data retriever)::

    root --- metadata.csv            (columns incl. Subject ID, Modality,
         |                            File Location)
         --- LIDC-IDRI/LIDC-IDRI-xxxx/<study>/<series>/ *.dcm

The CSV's ``File Location`` values are relative (Windows or POSIX
separators); each CT series folder is walked in sorted order, one item per
DICOM slice. DICOM reading is native (:mod:`deepinv_tpu.utils.dicom`), no
pydicom needed for uncompressed slices.
"""

from __future__ import annotations

import csv
import os
from typing import Callable, NamedTuple

import numpy as np

from ..utils.dicom import load_dicom

__all__ = ["LidcIdriSliceDataset"]


class SliceSampleIdentifier(NamedTuple):
    """(slice filename, scan folder path, patient id) — reference
    lidc_idri.py:70."""

    slice_fname: str
    scan_folder: str
    patient_id: str


from .base import ImageDataset


class LidcIdriSliceDataset(ImageDataset):
    """CT slices from the LIDC-IDRI archive layout
    (reference lidc_idri.py:84-175).

    :param root: folder containing ``metadata.csv`` and the DICOM tree.
    :param transform: applied to each (H, W) slice array.
    :param hounsfield_units: convert raw values to HU via RescaleSlope/
        Intercept (float32); otherwise raw int16.
    """

    SliceSampleIdentifier = SliceSampleIdentifier

    def __init__(self, root: str, transform: Callable = None,
                 hounsfield_units: bool = False):
        self.root = root
        self.transform = transform
        self.hounsfield_units = hounsfield_units

        csv_path = os.path.join(root, "metadata.csv")
        if not os.path.isdir(root):
            raise ValueError(f"The `root` folder doesn't exist: {root}")
        if not os.path.exists(csv_path):
            raise ValueError(f"{csv_path} doesn't exist.")

        with open(csv_path, newline="") as f:
            rows = [r for r in csv.DictReader(f) if r.get("Modality") == "CT"]
        rows.sort(key=lambda r: r["Subject ID"])

        self.sample_identifiers = []
        for r in rows:
            loc = r["File Location"].replace("\\", os.sep).replace("/", os.sep)
            folder = os.path.join(root, os.path.normpath(loc))
            for fname in sorted(os.listdir(folder)):
                if fname.endswith(".dcm"):
                    self.sample_identifiers.append(
                        SliceSampleIdentifier(fname, folder, r["Subject ID"])
                    )

    def __len__(self) -> int:
        return len(self.sample_identifiers)

    def __getitem__(self, idx: int):
        fname, folder, _ = self.sample_identifiers[idx]
        path = os.path.join(folder, fname)
        if self.hounsfield_units:
            arr = load_dicom(path, apply_rescale=True)
        else:
            arr = load_dicom(path, apply_rescale=False, dtype=np.int16)
        if self.transform is not None:
            arr = self.transform(arr)
        return arr
