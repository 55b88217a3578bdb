"""Dataset and loader primitives (reference deepinv/datasets/base.py).

Host-side data handling is numpy; device transfer happens once per batch at
the jit boundary (the reference moves tensors per-sample in torch
DataLoaders). A dataset is anything with ``__len__``/``__getitem__``
returning numpy arrays or tuples thereof.
"""

from __future__ import annotations

import numpy as np

__all__ = ["ImageDataset", "ArrayDataset", "TensorDataset", "DataLoader", "PatchDataset", "RandomPatchSampler", "random_split", "check_dataset"]


class ImageDataset:
    """Base class for imaging datasets (reference datasets/base.py:107).

    ``__getitem__`` may return ``x``, ``(x, y)``, ``(x, params)`` or
    ``(x, y, params)``; :func:`check_dataset` validates the contract.
    """

    def check_dataset(self) -> None:
        check_dataset(self)

    def __len__(self):
        raise NotImplementedError

    def __getitem__(self, idx):
        raise NotImplementedError


def check_dataset(dataset) -> None:
    """Validate that a dataset returns one of the supported item formats
    (reference datasets/base.py check_dataset)."""
    item = dataset[0]
    ok_leaf = lambda v: (isinstance(v, np.ndarray) or hasattr(v, "shape")
                         or (np.isscalar(v) and not isinstance(v, str)))
    ok_params = lambda d: isinstance(d, dict) and all(
        isinstance(k, str) and ok_leaf(v) for k, v in d.items())
    if ok_leaf(item):
        return
    if isinstance(item, (tuple, list)):
        if len(item) == 2 and ok_leaf(item[0]) and (ok_leaf(item[1]) or ok_params(item[1])):
            return
        if (
            len(item) == 3
            and ok_leaf(item[0])
            and ok_leaf(item[1])
            and ok_params(item[2])
        ):
            return
        raise RuntimeError(
            f"dataset must return x, (x, y), (x, params) or (x, y, params); got tuple of length {len(item)}"
        )
    raise RuntimeError(f"dataset returned unsupported type {type(item)}")


class ArrayDataset(ImageDataset):
    """In-memory dataset over one or more aligned arrays.

    :Examples:

        >>> import numpy as np
        >>> from deepinv_tpu.datasets import ArrayDataset, DataLoader
        >>> ds = ArrayDataset(np.arange(40.0).reshape(10, 2, 2))
        >>> len(ds)
        10
        >>> loader = DataLoader(ds, batch_size=4)
        >>> [b.shape for b in loader]
        [(4, 2, 2), (4, 2, 2)]
    """

    def __init__(self, *arrays):
        self.arrays = [np.asarray(a) for a in arrays]
        n = len(self.arrays[0])
        assert all(len(a) == n for a in self.arrays)

    def __len__(self):
        return len(self.arrays[0])

    def __getitem__(self, i):
        items = tuple(a[i] for a in self.arrays)
        return items if len(items) > 1 else items[0]


class TensorDataset(ImageDataset):
    """Dataset over explicitly passed arrays (reference datasets/base.py:142):
    any of ``x``, ``y``, ``params`` keyword batches; missing ``x`` yields NaN
    placeholders so ground-truth-free pipelines batch uniformly."""

    def __init__(self, *, x=None, y=None, params=None):
        if x is None and y is None:
            raise ValueError("at least one of x or y must be given")
        self._x = None if x is None else np.asarray(x)
        self._y = None if y is None else np.asarray(y)
        self._params = params
        if self._x is not None and self._y is not None and len(self._x) != len(self._y):
            raise ValueError(
                f"x and y must have the same leading dim, got {len(self._x)} vs {len(self._y)}"
            )

    # read-only views, as in the reference (datasets/base.py:209-219)
    @property
    def x(self):
        return self._x

    @property
    def y(self):
        return self._y

    @property
    def params(self):
        return self._params

    def __len__(self):
        return len(self.x) if self.x is not None else len(self.y)

    def __getitem__(self, i):
        x = self.x[i] if self.x is not None else np.float32(np.nan)
        out = [x]
        if self.y is not None:
            out.append(self.y[i])
        if self.params is not None:
            out.append({k: np.asarray(v)[i] for k, v in self.params.items()})
        return tuple(out) if len(out) > 1 else out[0]


class RandomPatchSampler(ImageDataset):
    """One random fixed-size patch per volume per epoch
    (reference datasets/random_sampler.py:11). Works on directories of
    ``.npy`` nD images (or any loader callable), returning channel-first
    patches; patch axes of size 1 are squeezed (slice extraction).

    :param x_dir / y_dir: directory of ground-truth / measurement volumes
        (either or both).
    :param patch_size: int or per-spatial-axis tuple.
    :param ch_axis: None (add singleton), 0 (channel-first) or -1
        (channel-last, transposed).
    :param seed: numpy seed; each ``__getitem__`` draws fresh coordinates.
    """

    def __init__(self, x_dir=None, y_dir=None, patch_size=32,
                 file_format: str = ".npy", ch_axis=None, loader=None, seed=0):
        import os

        if x_dir is None and y_dir is None:
            raise ValueError("provide x_dir and/or y_dir")
        self.loader = loader if loader is not None else np.load
        self.ch_axis = ch_axis
        self.patch_size = patch_size
        self.rng = np.random.default_rng(seed)

        def listdir(d):
            return sorted(f for f in os.listdir(d) if f.endswith(file_format))

        if x_dir is not None and y_dir is not None:
            common = sorted(set(listdir(x_dir)) & set(listdir(y_dir)))
            self.files = [(os.path.join(x_dir, f), os.path.join(y_dir, f)) for f in common]
        elif x_dir is not None:
            self.files = [(os.path.join(x_dir, f), None) for f in listdir(x_dir)]
        else:
            self.files = [(None, os.path.join(y_dir, f)) for f in listdir(y_dir)]
        if not self.files:
            raise FileNotFoundError("no volumes found")

    def _to_chw(self, a):
        a = np.asarray(a, np.float32)
        if self.ch_axis is None:
            return a[None]
        if self.ch_axis == -1:
            return np.moveaxis(a, -1, 0)
        return a

    def __len__(self):
        return len(self.files)

    def load(self, f, start_coords, patch_size=None):
        """Load ``f`` and slice the patch starting at ``start_coords``
        (reference datasets/random_sampler.py:241). ``None`` sizes keep the
        whole axis."""
        ps = self.patch_size if patch_size is None else patch_size
        vol = self._to_chw(self.loader(f))
        if isinstance(ps, int):
            ps = (ps,) * (vol.ndim - 1)
        sl = (slice(None),) + tuple(
            slice(o, o + p) if p is not None else slice(None)
            for o, p in zip(start_coords, ps)
        )
        return vol[sl]

    def __getitem__(self, i):
        xf, yf = self.files[i]
        vol = self._to_chw(self.loader(xf if xf is not None else yf))
        sp = vol.shape[1:]
        ps = self.patch_size
        if isinstance(ps, int):
            ps = (ps,) * len(sp)
        ps = tuple(min(p, s) for p, s in zip(ps, sp))
        start = tuple(self.rng.integers(0, s - p + 1) for p, s in zip(ps, sp))
        sl = (slice(None),) + tuple(slice(o, o + p) for o, p in zip(start, ps))

        def cut(v):
            out = v[sl]
            keep = [0] + [ax + 1 for ax, p in enumerate(ps) if p != 1]
            return np.squeeze(out, axis=tuple(
                ax + 1 for ax, p in enumerate(ps) if p == 1
            )) if any(p == 1 for p in ps) else out

        patch = cut(vol)
        if xf is not None and yf is not None:
            voly = self._to_chw(self.loader(yf))
            return patch, cut(voly)
        return patch


from ..utils.mixins import TiledMixin2d


class PatchDataset(TiledMixin2d, ImageDataset):
    """Grid patches from a stack of images (reference
    datasets/patch_dataset.py:9, which inherits ``TiledMixin2d`` for the
    patch-geometry helpers ``image_to_patches``/``patches_to_image``/
    ``get_num_patches``/``get_needed_pad``/``get_compatible_img_size``).

    :param imgs: array (N, C, H, W); patches of ``patch_size`` are extracted
        on a regular grid with stride ``stride``.
    """

    def __init__(self, imgs, patch_size: int = 8, stride: int = 4, transforms=None):
        super().__init__(patch_size=patch_size, stride=stride)
        self.imgs = np.asarray(imgs)
        self.transforms = transforms
        N, C, H, W = self.imgs.shape
        ph, pw = self.patch_size
        sh, sw = self.stride
        self.per_row = (H - ph) // sh + 1
        self.per_col = (W - pw) // sw + 1
        self.per_img = self.per_row * self.per_col

    def __len__(self):
        return len(self.imgs) * self.per_img

    def __getitem__(self, idx):
        n, r = divmod(idx, self.per_img)
        i, j = divmod(r, self.per_col)
        ph, pw = self.patch_size
        sh, sw = self.stride
        patch = self.imgs[n, :, i * sh : i * sh + ph, j * sw : j * sw + pw]
        if self.transforms is not None:
            patch = self.transforms(patch)
        return patch


def random_split(dataset, lengths, seed: int = 0):
    """Split a dataset into random non-overlapping subsets."""
    n = len(dataset)
    idx = np.random.RandomState(seed).permutation(n)
    out, o = [], 0
    for l in lengths:
        out.append(_Subset(dataset, idx[o : o + l]))
        o += l
    return out


class _Subset:
    def __init__(self, dataset, indices):
        self.dataset = dataset
        self.indices = np.asarray(indices)

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i):
        return self.dataset[int(self.indices[i])]


def _collate(items):
    """Stack a list of per-sample items into one batch, recursing through
    tuples and dicts (torch ``default_collate`` semantics: a batch of
    ``(x, y, params)`` with ``params`` a dict becomes
    ``(X, Y, {k: stacked})``). TensorLists collate per part."""
    first = items[0]
    if isinstance(first, (tuple, list)):
        # torch default_collate treats lists like tuples (a dataset
        # returning [x, y] — accepted by check_dataset — must yield an
        # (X, Y) pair, not one stacked array)
        return tuple(_collate([it[k] for it in items])
                     for k in range(len(first)))
    if isinstance(first, dict):
        return {k: _collate([it[k] for it in items]) for k in first}
    from ..core.tensorlist import TensorList

    if isinstance(first, TensorList):
        return TensorList([
            _collate([np.asarray(it.x[k]) for it in items])
            for k in range(len(first.x))
        ])
    return np.stack(items)


class DataLoader:
    """Minimal batching iterator over a dataset (numpy stacking).

    :param drop_last: drop the trailing incomplete batch (default True: jit
        programs want static batch shapes).
    """

    def __init__(self, dataset, batch_size: int = 1, shuffle: bool = False, seed: int = 0, drop_last: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self):
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            np.random.RandomState(self.seed + self._epoch).shuffle(idx)
        self._epoch += 1
        stop = n - (n % self.batch_size) if self.drop_last else n
        for o in range(0, stop, self.batch_size):
            items = [self.dataset[int(i)] for i in idx[o : o + self.batch_size]]
            yield _collate(items)
