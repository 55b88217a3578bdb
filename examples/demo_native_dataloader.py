"""Native C++ data loading: decode PNG/JPEG batches with libpng/libjpeg on
C++ threads and prefetch them double-buffered while the TPU trains.

Run: python examples/demo_native_dataloader.py
"""

# make the repo root importable when run as `python examples/<demo>.py`
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import _util

_util.setup()  # CPU by default; DEEPINV_TPU_DEMO_PLATFORM overrides

import os
import tempfile

import numpy as np
from PIL import Image

from deepinv_tpu.native import native_available, decode_batch, NativePrefetcher
from deepinv_tpu.datasets import ImageFolder

# create a small synthetic image folder
root = tempfile.mkdtemp()
rng = np.random.default_rng(0)
for i in range(32):
    arr = (rng.uniform(0, 1, (96, 128, 3)) * 255).astype(np.uint8)
    Image.fromarray(arr).save(os.path.join(root, f"{i:03d}.png"))

print("native loader available:", native_available())

ds = ImageFolder(root, size=(64, 64))         # backend='auto' -> C++ decoder
print("one item:", ds[0].shape, ds[0].dtype)

# double-buffered batches: batch k+1 decodes while batch k is consumed
for i, batch in enumerate(ds.batches(8)):
    print(f"batch {i}: {batch.shape}  mean={batch.mean():.3f}")
