"""The HDF5 dataset file convention, end to end — counterpart of the
reference's dataset-interop examples (external-libraries/demo_hf_dataset.py
streams third-party data into the framework; here, with zero egress, we
demonstrate the interop surface itself): write a file BY HAND in the
reference's on-disk convention — named splits, flat physics-parameter
members, stacked multi-operator measurements — and load every variant
back through ``HDF5Dataset``. Files written by the torch reference load
the same way, byte for byte.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import _util

_util.setup()

import tempfile

import h5py
import jax
import jax.numpy as jnp
import numpy as np

from deepinv_tpu.datasets import (DataLoader, HDF5Dataset, TensorDataset,
                                  generate_dataset)
from deepinv_tpu.datasets.phantoms import shepp_logan
from deepinv_tpu.physics import Denoising, GaussianNoise, Inpainting
from deepinv_tpu.physics.generator import SigmaGenerator


def main():
    H = 32 if _util.fast() else 64
    tmp = tempfile.mkdtemp()

    # ---- 1. generate_dataset writes the convention ---------------------
    xs = jnp.stack([jnp.asarray(shepp_logan(H)) for _ in range(6)])[:, None]
    physics = Denoising(noise_model=GaussianNoise(0.1))
    path = generate_dataset(
        TensorDataset(x=xs[:4]), physics, tmp,
        test_dataset=TensorDataset(x=xs[4:]),
        physics_generator=SigmaGenerator(), batch_size=2,
        key=jax.random.key(0))
    with h5py.File(path, "r") as f:
        print("members:", sorted(f.keys()))  # x/y/sigma per split, FLAT

    ds = HDF5Dataset(path, split="train", load_physics_generator_params=True)
    x, y, params = ds[0]
    print(f"train item: x{x.shape} y{y.shape} params={list(params)}")

    # params ride the DataLoader as a dict of stacked arrays
    xb, yb, pb = next(iter(DataLoader(ds, batch_size=2)))
    print(f"batch: x{xb.shape} sigma{pb['sigma'].shape}")

    # ---- 2. free-form split names + measurement-only splits ------------
    p2 = _os.path.join(tmp, "byhand.h5")
    mask = (np.random.default_rng(0).random((1, H, H)) < 0.6).astype(np.float32)
    inp = Inpainting(img_size=(1, H, H), mask=jnp.asarray(mask))
    with h5py.File(p2, "w") as f:
        f["x_val"] = np.asarray(xs[:2])
        f["y_val"] = np.asarray(inp.A(xs[:2]))
        f["mask_val"] = np.stack([mask, mask])     # fallback -> params
        f["y_deploy"] = np.asarray(inp.A(xs[2:4]))  # no ground truth!
    val = HDF5Dataset(p2, split="val", load_physics_generator_params=True)
    xv, yv, pv = val[0]
    print(f"val: x{np.asarray(xv).shape} params={list(pv)}")
    deploy = HDF5Dataset(p2, split="deploy")
    xd, yd = deploy[0]
    print(f"deploy: ground truth is NaN placeholder -> {np.isnan(xd)}; "
          f"y{yd.shape}")

    # ---- 3. stacked multi-operator measurements -> TensorList ----------
    p3 = _os.path.join(tmp, "stacked.h5")
    with h5py.File(p3, "w") as f:
        f.attrs["stacked"] = 2
        f["x_train"] = np.asarray(xs[:3])
        f["y0_train"] = np.asarray(inp.A(xs[:3]))          # operator 0
        f["y1_train"] = np.asarray(xs[:3]) + 0.05          # operator 1
    st = HDF5Dataset(p3, split="train")
    x3, y3 = st[0]
    print(f"stacked: y is a TensorList of {len(y3.x)} parts, "
          f"shapes {[tuple(p.shape) for p in y3.x]}")

    # ---- 4. dtype control + transform on ground truth only -------------
    ds32 = HDF5Dataset(path, split="train", dtype=np.float32,
                       transform=lambda v: v[..., : H // 2, : H // 2])
    xt, yt = ds32[0]
    print(f"transform applies to x only: x{xt.shape} vs y{yt.shape}")
    assert xt.shape[-1] == H // 2 and yt.shape[-1] == H
    return path


if __name__ == "__main__":
    main()
