"""Dataset and loader primitives (reference deepinv/datasets/base.py).

Host-side data handling is numpy; device transfer happens once per batch at
the jit boundary (the reference moves tensors per-sample in torch
DataLoaders). A dataset is anything with ``__len__``/``__getitem__``
returning numpy arrays or tuples thereof.
"""

from __future__ import annotations

import numpy as np

__all__ = ["ArrayDataset", "DataLoader", "PatchDataset", "random_split"]


class ArrayDataset:
    """In-memory dataset over one or more aligned arrays."""

    def __init__(self, *arrays):
        self.arrays = [np.asarray(a) for a in arrays]
        n = len(self.arrays[0])
        assert all(len(a) == n for a in self.arrays)

    def __len__(self):
        return len(self.arrays[0])

    def __getitem__(self, i):
        items = tuple(a[i] for a in self.arrays)
        return items if len(items) > 1 else items[0]


class PatchDataset:
    """Random patches from a stack of images (reference datasets/patch_ds).

    :param imgs: array (N, C, H, W); patches of ``patch_size`` are extracted
        on a regular grid with stride ``stride``.
    """

    def __init__(self, imgs, patch_size: int = 8, stride: int = 4, transforms=None):
        self.imgs = np.asarray(imgs)
        self.patch_size = patch_size
        self.stride = stride
        self.transforms = transforms
        N, C, H, W = self.imgs.shape
        self.per_row = (H - patch_size) // stride + 1
        self.per_col = (W - patch_size) // stride + 1
        self.per_img = self.per_row * self.per_col

    def __len__(self):
        return len(self.imgs) * self.per_img

    def __getitem__(self, idx):
        n, r = divmod(idx, self.per_img)
        i, j = divmod(r, self.per_col)
        p = self.patch_size
        patch = self.imgs[
            n, :, i * self.stride : i * self.stride + p, j * self.stride : j * self.stride + p
        ]
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
            if isinstance(items[0], tuple):
                yield tuple(np.stack([it[k] for it in items]) for k in range(len(items[0])))
            else:
                yield np.stack(items)
