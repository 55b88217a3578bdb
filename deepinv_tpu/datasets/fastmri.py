"""FastMRI slice datasets (reference deepinv/datasets/fastmri.py, 748 LoC).

Reads the standard fastMRI ``.h5`` volumes (k-space + reconstruction) and
serves 2D slices in this framework's (2, H, W) real/imag convention.
Features mirrored from the reference:

- pickle-backed **metadata cache** (``load_metadata_from_cache`` /
  ``save_metadata_to_cache`` / ``metadata_cache_file`` — fastmri.py:309-337)
  so large archives don't require a full scan per construction;
- :class:`MRISliceTransform` raw-data preprocessing (mask simulation with
  per-sample seeding, k-space normalization, coil prewhitening, low-res
  coil-map estimation — fastmri.py MRISliceTransform).

No downloads: point ``root`` at local fastMRI files.
"""

from __future__ import annotations

import os
import pickle
import warnings
import zlib
from contextlib import contextmanager
from typing import Any, NamedTuple, Optional

import numpy as np

from ..physics.mri import MRIMixin
from .base import ImageDataset

__all__ = ["FastMRISliceDataset", "SimpleFastMRISliceDataset", "MRISliceTransform"]


class FastMRISliceDataset(ImageDataset, MRIMixin):
    """Slices from raw fastMRI k-space volumes (reference fastmri.py:339).

    Each item is ``(x, y)``: magnitude target (1, H, W) and k-space
    measurement (2, H, W) (single-coil) or (2, N, H, W) (multi-coil), or
    ``(x, y, params)`` when the transform produces physics params (mask,
    coil maps).

    :param root: directory of ``.h5`` fastMRI files.
    :param slice_index: 'all' | 'middle' | int.
    :param transform: optional :class:`MRISliceTransform` or callable
        ``(x, y) -> ...``.
    :param load_metadata_from_cache: read the file/slice index from
        ``metadata_cache_file`` instead of scanning ``root``.
    :param save_metadata_to_cache: write the scanned index to
        ``metadata_cache_file``.
    """

    class SliceSampleID(NamedTuple):
        """ID + metadata of one slice within an MRI volume file
        (reference fastmri.py:294)."""

        fname: str
        slice_ind: int
        metadata: dict

    @staticmethod
    def torch_shuffle(x: list, generator=None, seed: int = 0) -> list:
        """Reproducibly shuffle a list (reference fastmri.py:285 uses a torch
        generator; here a numpy Generator or an int seed)."""
        rng = generator if generator is not None else np.random.default_rng(seed)
        return [x[i] for i in rng.permutation(len(x))]

    @contextmanager
    def metadata_cache_manager(self, root, samples):
        """Read/write the pickle metadata cache while populating ``samples``
        (reference fastmri.py:302). Yields cached samples when
        ``load_metadata_from_cache`` and the cache exists, else yields the
        blank container for the caller to fill, saving it afterwards when
        ``save_metadata_to_cache``."""
        if self.load_metadata_from_cache and os.path.exists(
            self.metadata_cache_file
        ):
            with open(self.metadata_cache_file, "rb") as f:
                cache = pickle.load(f)
            if cache.get(root) is None:
                raise ValueError(
                    "`metadata_cache_file` doesn't contain the metadata. "
                    "Either deactivate `load_metadata_from_cache` or set "
                    "`metadata_cache_file` properly."
                )
            yield cache[root]
        else:
            if self.load_metadata_from_cache and not os.path.exists(
                self.metadata_cache_file
            ):
                warnings.warn(
                    f"Couldn't find dataset cache at {self.metadata_cache_file}."
                    " Loading dataset from scratch."
                )
            yield samples
            if self.save_metadata_to_cache:
                cache = {}
                if os.path.exists(self.metadata_cache_file):
                    with open(self.metadata_cache_file, "rb") as f:
                        cache = pickle.load(f)
                cache[root] = samples
                with open(self.metadata_cache_file, "wb") as f:
                    pickle.dump(cache, f)

    def __init__(self, root: str, slice_index="all", transform=None,
                 load_metadata_from_cache: bool = False,
                 save_metadata_to_cache: bool = False,
                 metadata_cache_file="dataset_cache.pkl"):
        self.root = root
        self.transform = transform
        self.metadata_cache_file = metadata_cache_file
        self.load_metadata_from_cache = load_metadata_from_cache
        self.save_metadata_to_cache = save_metadata_to_cache

        with self.metadata_cache_manager(root, []) as metadata:
            if not metadata:
                metadata.extend(self._scan(root))

        # metadata: list of (filename, n_slices). slice_index semantics
        # mirror the reference (fastmri.py:380): "all" | int | list/tuple |
        # "middle" / "middle+i" (a 2i+1 window) | "random" (per volume).
        self.samples = []
        for vol_i, (fname, n_slices) in enumerate(metadata):
            if slice_index == "all":
                idxs = range(n_slices)
            elif isinstance(slice_index, (tuple, list)):
                idxs = [int(i) for i in slice_index]
            elif isinstance(slice_index, str) and "middle" in slice_index:
                i = slice_index.split("+")[-1]
                i = int(i) if "+" in slice_index and i.isdigit() else 0
                mid = n_slices // 2
                idxs = range(max(mid - i, 0), min(mid + i + 1, n_slices))
            elif slice_index == "random":
                import random as _random

                idxs = [_random.Random(vol_i).randrange(n_slices)]
            else:
                idxs = [int(slice_index)]
            self.samples += [(os.path.join(root, fname), i) for i in idxs]

    @staticmethod
    def _scan(root):
        import h5py

        files = sorted(f for f in os.listdir(root) if f.endswith(".h5"))
        if not files:
            raise FileNotFoundError(f"no fastMRI .h5 files in {root}")
        metadata = []
        for f in files:
            with h5py.File(os.path.join(root, f), "r") as fh:
                metadata.append((f, fh["kspace"].shape[0]))
        return metadata

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
            if isinstance(self.transform, MRISliceTransform):
                return self.transform(
                    x, y, seed=f"{os.path.basename(path)}_{sl}"
                )
            return self.transform(x, y)
        return x, y

    def save_simple_dataset(self, dataset_path: str,
                            pad_to_size=(320, 320)) -> "SimpleFastMRISliceDataset":
        """Convert to an in-memory 2D single-coil magnitude dataset and save
        it (reference fastmri.py:505 writes a ``.pt``; here a ``.npy``).
        Images are rescaled to [0, 1] and center-cropped/padded to
        ``pad_to_size`` so they stack. Returns the loaded
        :class:`SimpleFastMRISliceDataset`."""
        xs = []
        for i in range(len(self)):
            x = np.asarray(self[i][0], np.float32)  # (1, H, W) magnitude
            lo, hi = x.min(), x.max()
            x = (x - lo) / max(hi - lo, 1e-12)
            if pad_to_size is not None:
                H, W = x.shape[-2:]
                th, tw = pad_to_size
                # center crop then symmetric zero-pad to the target size
                if H > th:
                    o = (H - th) // 2
                    x = x[..., o : o + th, :]
                if W > tw:
                    o = (W - tw) // 2
                    x = x[..., :, o : o + tw]
                ph, pw = th - x.shape[-2], tw - x.shape[-1]
                if ph > 0 or pw > 0:
                    x = np.pad(
                        x,
                        [(0, 0)] * (x.ndim - 2)
                        + [(ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2)],
                    )
            xs.append(x[0])
        arr = np.stack(xs).astype(np.float32)
        np.save(dataset_path, arr)
        return SimpleFastMRISliceDataset(arr)


class MRISliceTransform(MRIMixin):
    """FastMRI raw-data preprocessing (reference fastmri.py
    MRISliceTransform).

    * mask simulation with a mask generator, optionally seeded per sample
      (deterministic masks for test sets);
    * k-space normalization (99th percentile of the ACS RSS reconstruction,
      or ``normalize / kspace.max()`` when a number is given);
    * coil noise prewhitening from a corner noise block (Cholesky);
    * low-resolution (ACS) coil-map estimation for
      :class:`deepinv_tpu.physics.MultiCoilMRI` (the reference runs full
      ESPIRiT; the low-res estimate is its standard initialization).

    Returns ``(x, y, params)`` with params containing ``mask`` and/or
    ``coil_maps`` when enabled, else ``(x, y)``.
    """

    def __init__(self, mask_generator=None, seed_mask_generator: bool = True,
                 estimate_coil_maps=False, acs: Optional[int] = None,
                 prewhiten=False, normalize=False):
        self.mask_generator = mask_generator
        self.seed_mask_generator = seed_mask_generator
        self.estimate_coil_maps = estimate_coil_maps
        self.acs = acs
        self.prewhiten = prewhiten
        if self.prewhiten is True:
            self.prewhiten = (slice(0, 30), slice(0, 30))
        self.normalize = normalize

    # -- helpers ----------------------------------------------------------
    def get_acs(self):
        if self.acs is not None:
            return self.acs
        if self.mask_generator is not None and hasattr(
            self.mask_generator, "n_center"
        ):
            return self.mask_generator.n_center
        if isinstance(self.estimate_coil_maps, int) and not isinstance(
            self.estimate_coil_maps, bool
        ):
            return self.estimate_coil_maps
        raise ValueError(
            "ACS size not specified: pass acs=, or a mask_generator with "
            "n_center, or estimate_coil_maps=<int>."
        )

    @staticmethod
    def _to_complex(y):
        return y[0] + 1j * y[1]  # (..., H, W) complex

    def generate_mask(self, kspace, seed):
        """Mask of shape (H, W) from the generator; seeded per sample when
        ``seed_mask_generator`` (reference fastmri.py generate_mask)."""
        import jax

        if self.seed_mask_generator and seed is not None:
            seed_int = zlib.crc32(str(seed).encode()) & 0x7FFFFFFF
            key = jax.random.key(seed_int)
        else:
            key = None
        m = self.mask_generator.step(1, key=key)["mask"]
        m = np.asarray(m)
        while m.ndim > 2:
            m = m[0]
        return m.astype(np.float32)

    def prewhiten_kspace(self, y):
        """Cholesky noise whitening across coils from a corner noise block
        (reference prewhiten_kspace)."""
        if y.ndim < 4:
            raise ValueError("kspace must be multicoil for prewhitening.")
        ksp = self._to_complex(y)  # (N, H, W)
        n = ksp[:, self.prewhiten[0], self.prewhiten[1]].reshape(ksp.shape[0], -1)
        n = n - n.mean(axis=-1, keepdims=True)
        cov = (n @ n.conj().T) / n.shape[-1]
        L = np.linalg.cholesky(cov + 1e-12 * np.eye(cov.shape[0]))
        white = np.linalg.solve(L, ksp.reshape(ksp.shape[0], -1)).reshape(ksp.shape)
        return np.stack([white.real, white.imag]).astype(np.float32)

    def _acs_block(self, ksp, acs):
        H, W = ksp.shape[-2:]
        cw = slice(W // 2 - acs // 2, W // 2 + (acs + 1) // 2)
        block = np.zeros_like(ksp)
        block[..., cw] = ksp[..., cw]
        return block

    def normalize_kspace(self, y):
        ksp = self._to_complex(y)
        if self.normalize is True:
            acs = self.get_acs()
            lowres = np.fft.fftshift(
                np.fft.ifft2(
                    np.fft.ifftshift(self._acs_block(ksp, acs), axes=(-2, -1)),
                    norm="ortho",
                ),
                axes=(-2, -1),
            )
            rss = np.sqrt(
                (np.abs(lowres) ** 2).reshape(-1, *lowres.shape[-2:]).sum(0)
            )
            scale = np.percentile(rss, 99)
        else:
            scale = np.abs(ksp).max() / float(self.normalize)
        return (y / max(scale, 1e-12)).astype(np.float32), scale

    def generate_maps(self, y):
        """Low-res (ACS) coil sensitivity estimate, shape (N, H, W)
        complex: coil images from the central k-space block normalized by
        their RSS."""
        ksp = self._to_complex(y)  # (N, H, W)
        if ksp.ndim != 3:
            raise ValueError("coil maps need multicoil kspace (2, N, H, W)")
        acs = self.get_acs()
        lowres = np.fft.fftshift(
            np.fft.ifft2(
                np.fft.ifftshift(self._acs_block(ksp, acs), axes=(-2, -1)),
                norm="ortho",
            ),
            axes=(-2, -1),
        )
        rss = np.sqrt((np.abs(lowres) ** 2).sum(0, keepdims=True))
        return (lowres / np.clip(rss, 1e-12, None)).astype(np.complex64)

    def __call__(self, x, y, seed=None):
        params = {}
        if self.prewhiten:
            y = self.prewhiten_kspace(y)
        if self.normalize:
            y, scale = self.normalize_kspace(y)
            x = (x / max(scale, 1e-12)).astype(np.float32)
        if self.estimate_coil_maps:
            params["coil_maps"] = self.generate_maps(y)
        if self.mask_generator is not None:
            mask = self.generate_mask(y, seed)
            params["mask"] = mask
            y = (y * mask).astype(np.float32)
        if params:
            return x, y, params
        return x, y


class SimpleFastMRISliceDataset(ImageDataset):
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
