"""CMRxRecon and SKM-TEA raw-archive slice datasets
(reference deepinv/datasets/cmrxrecon.py, skmtea.py).

Both wrap real challenge archives:

* **CMRxRecon 2023** (dynamic cardiac cine MRI): MATLAB 7.3 ``.mat`` volumes
  of fully-sampled k-space under
  ``SingleCoil/Cine/TrainingSet/FullSample/PXXX/cine_{lax,sax}.mat`` with
  acceleration masks in sibling ``AccFactorXX`` trees
  (``cine_xax_mask.mat``). Items are ``(x, y, params)`` with 2D+t images
  ``(2, T, W, H)`` compatible with :class:`deepinv_tpu.physics.DynamicMRI`.
* **SKM-TEA** (quantitative knee MRI): ``.h5`` files each holding ``kspace``
  ``(slice, H, W, E, N)``, SENSE ``target`` ``(slice, H, W, E, 1)``, JSENSE
  ``maps`` and elliptical Poisson-disc ``masks/poisson_<acc>x``. Items are
  ``(x, y, params)`` compatible with
  :class:`deepinv_tpu.physics.MultiCoilMRI`.

Shared machinery (metadata cache, ``SliceSampleID``) comes from
:class:`deepinv_tpu.datasets.FastMRISliceDataset`, mirroring the reference
class hierarchy.
"""

from __future__ import annotations

import os
import re
import warnings
from typing import Callable, Optional

import numpy as np

from ..physics.mri import MRIMixin
from ..utils.io import load_mat
from .fastmri import FastMRISliceDataset, MRISliceTransform

__all__ = ["CMRxReconSliceDataset", "SKMTEASliceDataset"]


def natsorted(items):
    """Natural (numeric-aware) sort, standing in for the `natsort` package
    used by the reference (cmrxrecon.py:6)."""

    def key(s):
        return [
            int(t) if t.isdigit() else t.lower()
            for t in re.split(r"(\d+)", str(s))
        ]

    return sorted(items, key=key)


def _rglob(root, suffix):
    out = []
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.endswith(suffix):
                out.append(os.path.join(dirpath, f))
    return natsorted(out)


class CMRxReconSliceDataset(FastMRISliceDataset, MRIMixin):
    """CMRxRecon 2023 dynamic-MRI slice dataset (reference cmrxrecon.py:105).

    Walks ``root/data_dir`` for ``cine_*.mat`` MATLAB-7.3 volumes of shape
    ``WH(N)DT`` (width, height, [coils,] slices, time), serving one slice
    per item as ``(x, y, params)``:

    * ``x``: normalized 2D+t magnitude-complex image ``(2, T, W, H)``;
    * ``y``: masked k-space of ``x``, same shape;
    * ``params["mask"]``: the acceleration mask, loaded from ``mask_dir``
      (``*_mask.mat``) or drawn from ``mask_generator``.

    :param root: archive root.
    :param data_dir: subdir of fully-sampled data (reference default
        ``SingleCoil/Cine/TrainingSet/FullSample``).
    :param apply_mask: mask the k-space (else return ``(x, y)`` fully
        sampled).
    :param mask_dir: subdir of provided masks (``AccFactor04`` by default).
    :param mask_generator: per-sample random mask generator (exclusive with
        ``mask_dir``).
    :param transform: applied to the target sequence before padding.
    :param pad_size: (W, H) zero-pad target/mask (reference pads to
        (512, 256)).
    :param noise_model: optional k-space noise model.
    """

    def __init__(
        self,
        root: str,
        data_dir: str = "SingleCoil/Cine/TrainingSet/FullSample",
        load_metadata_from_cache: bool = False,
        save_metadata_to_cache: bool = False,
        metadata_cache_file: str = "dataset_cache.pkl",
        apply_mask: bool = True,
        mask_dir: Optional[str] = "SingleCoil/Cine/TrainingSet/AccFactor04",
        mask_generator=None,
        transform: Optional[Callable] = None,
        pad_size=(512, 256),
        noise_model=None,
    ):
        self.root = str(root)
        self.data_dir = data_dir
        self.mask_dir = mask_dir
        self.transform = transform
        self.mask_generator = mask_generator
        self.apply_mask = apply_mask
        self.load_metadata_from_cache = load_metadata_from_cache
        self.save_metadata_to_cache = save_metadata_to_cache
        self.metadata_cache_file = metadata_cache_file
        self.pad_size = pad_size
        self.noise_model = noise_model

        if not self.apply_mask and (
            self.mask_generator is not None or self.mask_dir is not None
        ):
            warnings.warn(
                "mask_generator or mask_dir specified but apply_mask is "
                "False; they will not be used."
            )
            self.mask_dir = self.mask_generator = None
        if (
            self.apply_mask
            and self.mask_generator is not None
            and self.mask_dir is not None
        ):
            raise ValueError(
                "Only one of mask_generator or mask_dir should be specified."
            )

        data_root = os.path.join(self.root, self.data_dir)
        if not os.path.isdir(data_root) or (
            self.mask_dir is not None
            and not os.path.isdir(os.path.join(self.root, self.mask_dir))
        ):
            raise ValueError(
                "Data or mask folder does not exist; set root, data_dir and "
                "mask_dir properly."
            )

        all_fnames = [
            f for f in _rglob(data_root, ".mat") if not f.endswith("_mask.mat")
        ]

        with self.metadata_cache_manager(self.root, []) as samples:
            if len(samples) == 0:
                for fname in all_fnames:
                    metadata = self._retrieve_metadata(fname)
                    for slice_ind in range(metadata["num_slices"]):
                        samples.append(
                            self.SliceSampleID(fname, slice_ind, metadata)
                        )
            self.samples = samples

    @staticmethod
    def _loadmat(fname) -> np.ndarray:
        """First non-header array of a MATLAB 7.3 file
        (reference cmrxrecon.py:166)."""
        return next(
            v
            for k, v in load_mat(fname, mat73=True).items()
            if not k.startswith("__")
        )

    def _retrieve_metadata(self, fname) -> dict:
        """Width/height/slices/timeframes (+coils) from the ``WH(N)DT``
        array shape (reference cmrxrecon.py:172)."""
        shape = self._loadmat(fname).shape
        md = {
            "width": shape[0],
            "height": shape[1],
            "num_slices": shape[-2],
            "timeframes": shape[-1],
        }
        if len(shape) == 5:
            md["coils"] = shape[2]
        return md

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        fname, slice_ind, metadata = self.samples[i]

        kspace = self._loadmat(fname)  # WH(N)DT
        kspace = kspace[..., slice_ind, :]  # WH(N)T
        if kspace.ndim == 4:
            kspace = kspace[:, :, 0]  # first coil, WHT
        kspace = np.stack([kspace.real, kspace.imag], axis=0)  # (2, W, H, T)
        kspace = np.moveaxis(kspace, -1, 1).astype(np.float32)  # (2, T, W, H)

        if self.apply_mask:
            if self.mask_generator is None:
                mpath = fname.replace(
                    os.path.normpath(self.data_dir),
                    os.path.normpath(self.mask_dir),
                ).replace(".mat", "_mask.mat")
                if not os.path.exists(mpath):
                    raise FileNotFoundError(
                        "Mask not found in mask_dir and mask_generator not "
                        "specified."
                    )
                mask = self._loadmat(mpath)  # (T, W, H) or (W, H)
                mask = np.asarray(
                    self.check_mask(mask, three_d=True)[0], np.float32
                )  # -> (2, T, W, H) / (2, 1, W, H), as reference cmrxrecon.py:228
            else:
                mask = MRISliceTransform(
                    mask_generator=self.mask_generator
                ).generate_mask(kspace, str(fname) + str(slice_ind))
            mask = np.broadcast_to(mask, kspace.shape).astype(np.float32)
        else:
            mask = np.ones_like(kspace)

        # ground truth from fully-sampled kspace
        target = np.asarray(
            self.kspace_to_im(kspace[None])[0], np.float32
        )  # (2, T, W, H)

        if self.transform is not None:
            target = self.transform(target)

        if self.pad_size is not None:
            w = self.pad_size[0] - target.shape[-2]
            h = self.pad_size[1] - target.shape[-1]
            pad = [(0, 0)] * (target.ndim - 2) + [
                (w // 2, w // 2),
                (h // 2, h // 2),
            ]
            target = np.pad(target, pad)
            mask = np.pad(mask, pad)

        target = (target - target.mean()) / (target.std() + 1e-11)
        kspace = np.asarray(self.im_to_kspace(target[None])[0], np.float32)

        if self.noise_model is not None:
            import zlib

            import jax

            key = jax.random.key(
                zlib.crc32(f"{fname}{slice_ind}".encode()) & 0x7FFFFFFF
            )
            kspace = np.asarray(
                self.noise_model(kspace, key=key), np.float32
            ) * mask

        if self.apply_mask:
            return target, (kspace * mask).astype(np.float32), {"mask": mask}
        return target, kspace.astype(np.float32)


class SKMTEASliceDataset(FastMRISliceDataset, MRIMixin):
    """SKM-TEA raw multicoil k-space slice dataset (reference skmtea.py:17).

    Items are ``(x, y, params)``: SENSE target ``(2, H, W)``, undersampled
    k-space ``(2, N, H, W)``, and ``params = {'mask', 'coil_maps'}`` — the
    archive's elliptical Poisson-disc mask (zero-padded to the k-space
    shape) and JSENSE sensitivity maps ``(N, H, W)`` complex — directly
    compatible with :class:`deepinv_tpu.physics.MultiCoilMRI`.

    :param root: directory of SKM-TEA ``.h5`` files.
    :param echo: which qDESS echo (0 or 1).
    :param acc: mask acceleration: 4, 6, 8, 10, 12 or 16.
    :param filter_id: optional predicate on ``SliceSampleID``.
    """

    def __init__(
        self,
        root: str,
        echo: int = 0,
        acc: int = 6,
        load_metadata_from_cache: bool = False,
        save_metadata_to_cache: bool = False,
        metadata_cache_file: str = "skmtea_dataset_cache.pkl",
        filter_id: Optional[Callable] = None,
    ):
        self.root = str(root)
        self.echo = echo
        self.acc = acc
        self.load_metadata_from_cache = load_metadata_from_cache
        self.save_metadata_to_cache = save_metadata_to_cache
        self.metadata_cache_file = metadata_cache_file

        all_fnames = _rglob(self.root, ".h5")

        with self.metadata_cache_manager(self.root, []) as samples:
            if len(samples) == 0:
                for fname in all_fnames:
                    metadata = self._retrieve_metadata(fname)
                    for slice_ind in range(metadata["num_slices"]):
                        samples.append(
                            self.SliceSampleID(fname, slice_ind, metadata)
                        )
            self.samples = samples

        if filter_id is not None:
            self.samples = list(filter(filter_id, self.samples))

    @staticmethod
    def _retrieve_metadata(fname) -> dict:
        """kspace dims ``(slice, H, W, E, N)`` (reference skmtea.py:113)."""
        import h5py

        with h5py.File(fname, "r") as hf:
            shape = hf["kspace"].shape
            return {
                "num_slices": shape[0],
                "height": shape[1],
                "width": shape[2],
                "echos": shape[3],
                "coils": shape[4],
            }

    @staticmethod
    def zero_pad(x: np.ndarray, shape, mode="constant", value=0) -> np.ndarray:
        """Center zero-pad dims 1..len(shape) of ``x`` to ``shape``
        (reference skmtea.py:123; ``None`` keeps a dim)."""
        x_shape = x.shape[1 : 1 + len(shape)]
        pad = [(0, 0)]
        for current, desired in zip(x_shape, shape):
            total = 0 if desired is None else desired - current
            pad.append((total // 2, total - total // 2))
        pad += [(0, 0)] * (x.ndim - len(pad))
        kw = {"constant_values": value} if mode == "constant" else {}
        return np.pad(x, pad, mode=mode, **kw)

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx):
        import h5py

        fname, slice_ind, metadata = self.samples[idx]
        with h5py.File(fname, "r") as f:
            x = np.asarray(f["target"][slice_ind, :, :, self.echo, 0])
            y = np.asarray(f["kspace"][slice_ind, :, :, self.echo, :])
            mask = np.asarray(f[f"masks/poisson_{self.acc}.0x"])
            maps = np.asarray(f["maps"][slice_ind, :, :, :, 0])

        # (h, w) bool -> (1, H, W) float, padded to the kspace shape
        mask = self.zero_pad(mask[None].astype(np.float32), y.shape[:2])

        y = np.moveaxis(y, -1, 0)  # (H, W, N) -> (N, H, W) complex
        y = np.stack([y.real, y.imag], axis=0).astype(np.float32)  # (2,N,H,W)
        y = y * mask[None]

        x = np.stack([x.real, x.imag], axis=0).astype(np.float32)  # (2, H, W)
        maps = np.moveaxis(maps, -1, 0).astype(np.complex64)  # (N, H, W)
        return x, y, {"mask": mask, "coil_maps": maps}
