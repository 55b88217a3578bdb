"""Loading data from scientific file formats (counterpart of reference
examples/external-libraries/demo_io.py).

The imaging world stores data in .npy/.npz, MATLAB .mat, TIFF stacks,
HDF5, DICOM and NIfTI. ``deepinv_tpu.utils`` mirrors the reference's
``load_*`` readers (io.py); this demo writes synthetic files in each
available format and round-trips them into physics-ready arrays.
DICOM/NIfTI readers exist too but need pydicom/nibabel installed.
"""

# make the repo root importable when run as `python examples/<demo>.py`
import os as _os
import sys as _sys
import tempfile

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import _util

_util.setup()  # CPU by default; DEEPINV_TPU_DEMO_PLATFORM overrides

import numpy as np
import jax.numpy as jnp

from deepinv_tpu.utils import load_np, load_mat, load_tiff
from deepinv_tpu.datasets import shepp_logan


def main():
    x = np.asarray(shepp_logan(64), np.float32)

    with tempfile.TemporaryDirectory() as td:
        # ---- numpy ----------------------------------------------------
        p = _os.path.join(td, "phantom.npy")
        np.save(p, x)
        a = load_np(p)
        print(f".npy  -> {a.shape} {a.dtype}, maxerr {np.abs(a - x).max():.1e}")

        # ---- MATLAB .mat ----------------------------------------------
        from scipy.io import savemat

        p = _os.path.join(td, "phantom.mat")
        savemat(p, {"img": x, "pixel_size": 0.5})
        d = load_mat(p)
        print(f".mat  -> keys {sorted(k for k in d if not k.startswith('__'))}, "
              f"img {d['img'].shape}")

        # ---- TIFF (incl. 16-bit, the microscopy standard) --------------
        from PIL import Image

        p = _os.path.join(td, "phantom.tif")
        Image.fromarray((x * 65535).astype(np.uint16)).save(p)
        t = load_tiff(p)
        print(f".tiff -> {t.shape} {t.dtype}, "
              f"rescaled maxerr {np.abs(t / 65535.0 - x).max():.1e}")

        # ---- HDF5 (the dataset format used by generate_dataset) --------
        import h5py

        p = _os.path.join(td, "phantom.h5")
        with h5py.File(p, "w") as f:
            f.create_dataset("x", data=x[None, None])
        with h5py.File(p, "r") as f:
            h = np.asarray(f["x"])
        print(f".h5   -> {h.shape}")

        # any of these feeds straight into the framework
        img = jnp.asarray(a)[None, None]
        print(f"ready for physics: {img.shape} on {img.device}")


if __name__ == "__main__":
    main()
