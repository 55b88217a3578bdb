"""Offline measurement generation to HDF5 (reference
deepinv/datasets/datagenerator.py:486 generate_dataset, :25 HDF5Dataset).

File layout matches the reference: per-operator files ``dinv_dataset{i}.h5``
with datasets ``x_train / y_train / x_test / y_test`` plus flat
``{param}_{split}`` datasets for physics-generator parameters (the
reference's current convention; the repo's historical ``params_*`` group
layout is still READ for backward compatibility), so datasets generated
by either framework are interchangeable.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..core.rng import ensure_key
from .base import DataLoader

__all__ = ["generate_dataset", "HDF5Dataset"]


def generate_dataset(
    train_dataset,
    physics,
    save_dir: str,
    test_dataset=None,
    physics_generator=None,
    batch_size: int = 4,
    dataset_filename: str = "dinv_dataset",
    train_datapoints: Optional[int] = None,
    test_datapoints: Optional[int] = None,
    key=None,
    verbose: bool = False,
):
    """Generate (x, y[, params]) pairs and write HDF5 files.

    :param physics: one physics or a list — datapoints are split round-robin
        across operators like the reference (datagenerator.py:486-763).
    :returns: path (single operator) or list of paths.
    """
    import h5py

    key = ensure_key(key, 0)
    physics_list = physics if isinstance(physics, (list, tuple)) else [physics]
    os.makedirs(save_dir, exist_ok=True)
    paths = []

    def _measure(p, xb, k):
        params = {}
        if physics_generator is not None:
            k, kg = jax.random.split(k)
            params = physics_generator.step(xb.shape[0], key=kg)
            p = p.update(**params)
        yb = p(jnp.asarray(xb), key=k)
        return np.asarray(yb), {kk: np.asarray(v) for kk, v in params.items()}

    for i, p in enumerate(physics_list):
        path = os.path.join(save_dir, f"{dataset_filename}{i}.h5")
        with h5py.File(path, "w") as f:
            for split, dataset, limit in (
                ("train", train_dataset, train_datapoints),
                ("test", test_dataset, test_datapoints),
            ):
                if dataset is None:
                    continue
                n = len(dataset) if limit is None else min(limit, len(dataset))
                # round-robin split across operators
                indices = [
                    j for j in range(n) if j % len(physics_list) == i
                ] if split == "train" and len(physics_list) > 1 else list(range(n))
                xs, ys, ps = [], [], []
                for o in range(0, len(indices), batch_size):
                    idxs = indices[o : o + batch_size]
                    xb = np.stack([np.asarray(dataset[j] if not isinstance(dataset[j], tuple) else dataset[j][0]) for j in idxs])
                    key, kb = jax.random.split(key)
                    yb, params = _measure(p, xb, kb)
                    xs.append(xb)
                    ys.append(yb)
                    ps.append(params)
                if not xs:
                    continue
                f.create_dataset(f"x_{split}", data=np.concatenate(xs))
                f.create_dataset(f"y_{split}", data=np.concatenate(ys))
                if ps and ps[0]:
                    # flat `{param}_{split}` members: the REFERENCE file
                    # layout (datagenerator.py:100 fallback logic), so files
                    # written here load in the reference and vice versa
                    for kk in ps[0]:
                        f.create_dataset(
                            f"{kk}_{split}",
                            data=np.concatenate([d[kk] for d in ps]))
        paths.append(path)
    return paths[0] if len(paths) == 1 else paths


from .base import ImageDataset


class HDF5Dataset(ImageDataset):
    """Loads datasets in the reference's HDF5 file convention
    (reference datagenerator.py:25): returns ``(x, y)`` or
    ``(x, y, params)``.

    Member registration follows the reference's fallback logic
    (datagenerator.py:100): for the selected split every ``{name}_{split}``
    member is interpreted as ground truths (``x``), measurements (``y``),
    one part of a stacked measurement (``y{i}`` with the file-level
    ``stacked`` attribute set — loaded as a :class:`TensorList`), or —
    for any other prefix — a physics parameter. The repo's historical
    ``params_{split}`` HDF5 *group* layout is also read.

    :param path: HDF5 file (written by :func:`generate_dataset`, by the
        reference's generator, or by hand following the convention).
    :param train: selects the ``train``/``test`` split when ``split`` is
        not given.
    :param split: free-form split name (e.g. ``"val"``); takes precedence
        over ``train`` (with the reference's warning when both are given).
    :param transform: optional callable applied to the GROUND TRUTH only
        (reference datagenerator.py:116).
    :param load_physics_generator_params: return the parameter dict with
        each entry (empty dict when the file has none).
    :param dtype: cast for real-valued arrays (default float32).
    :param complex_dtype: cast for complex-valued arrays (default
        complex64).
    """

    @property
    def unsupervised(self) -> bool:
        """True when the split stores no ground truths — i.e. ``x`` entries
        are NaN placeholders (reference datagenerator.py:403, deprecated
        there; kept for API parity)."""
        import warnings

        warnings.warn(
            "The attribute 'unsupervised' is deprecated and will be removed "
            "in future versions. Please check the dataset entries directly "
            "instead.",
            DeprecationWarning,
        )
        if self.x is None:
            return True
        x0 = np.asarray(self.x[0])
        return bool(np.isnan(x0).all())

    def __init__(self, path: str, train: bool = None, split: str = None,
                 transform=None, load_physics_generator_params: bool = False,
                 dtype=np.float32, complex_dtype=np.complex64):
        import re
        import warnings

        import h5py

        self.path = path
        if split is not None:
            if train is not None:
                warnings.warn(
                    "The parameters 'split' and 'train' are both provided. "
                    "'split' takes precedence and 'train' is ignored.",
                    UserWarning)
            self.split = split
        else:
            self.split = "train" if (train is None or train) else "test"
        self.load_params = load_physics_generator_params
        self.transform = transform
        self.dtype, self.complex_dtype = dtype, complex_dtype
        self._f = f = h5py.File(path, "r")

        stacked = int(f.attrs.get("stacked", 0))
        suffix = f"_{self.split}"
        self.x = None
        self.y = [None] * stacked if stacked else None
        params = {}
        sizes = {}
        for name, member in f.items():
            if not name.endswith(suffix):
                continue
            prefix = name[: -len(suffix)]
            if prefix == "x":
                self.x = member
                sizes["x"] = len(member)
            elif prefix == "y" and not stacked:
                self.y = member
                sizes["y"] = len(member)
            elif stacked and re.fullmatch(r"y(0|[1-9]\d*)", prefix):
                if int(prefix[1:]) < stacked:
                    self.y[int(prefix[1:])] = member
                    sizes[prefix] = len(member)
                else:
                    # reference datagenerator warns on out-of-range
                    # stacking indices instead of silently reinterpreting
                    # them as physics parameters (likely file corruption)
                    warnings.warn(
                        f"member {name!r} has stacking index outside "
                        f"[0, {stacked}) — probably an error; ignored",
                        UserWarning)
            elif prefix == "params" and isinstance(member, h5py.Group):
                # repo's historical group layout
                for k in member:
                    params[k] = member[k]
                    sizes[f"params.{k}"] = len(member[k])
            else:
                params[prefix] = member
                sizes[f"params.{prefix}"] = len(member)
        if self.y is None or (stacked and None in self.y):
            raise ValueError(
                f"split {self.split!r} of {path} has no (complete) "
                "measurements")
        if not load_physics_generator_params:
            # parameter members only constrain the dataset length when
            # they are actually loaded (reference update_split_size
            # semantics): a short auxiliary member must not collapse
            # len(dataset) for plain (x, y) iteration
            sizes = {k: v for k, v in sizes.items()
                     if not k.startswith("params.")}
        if len(set(sizes.values())) > 1:
            warnings.warn(
                f"fields of split {self.split!r} have different sizes "
                f"({sizes}); using the minimum", UserWarning)
        self.params = params if load_physics_generator_params else None
        self._len = min(sizes.values())

    def _cast(self, a):
        a = np.asarray(a)
        return a.astype(self.complex_dtype if np.iscomplexobj(a)
                        else self.dtype)

    def __len__(self):
        return self._len

    def __getitem__(self, i):
        if self.x is not None:
            x = self._cast(self.x[i])
            if self.transform is not None:
                x = self.transform(x)
        else:
            # conventions: scalar NaN placeholder when no ground truth
            x = np.asarray(np.nan, dtype=self.dtype)
        if isinstance(self.y, list):
            from ..core.tensorlist import TensorList

            y = TensorList([jnp.asarray(self._cast(yk[i])) for yk in self.y])
        else:
            y = self._cast(self.y[i])
        if self.params is not None:
            params = {k: self._cast(v[i]) for k, v in self.params.items()}
            return x, y, params
        return x, y

    def close(self):
        self._f.close()
