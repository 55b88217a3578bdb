"""Pytree ``Module`` base class.

TPU-native replacement for the reference's ``torch.nn.Module`` usage
(e.g. deepinv/physics/forward.py:19, deepinv/models/base.py:11). Instead of
stateful modules with registered buffers, every component here is a *pytree*:
JAX arrays (filters, masks, network weights, noise levels) are leaves, while
configuration (padding modes, flags, callables) is static auxiliary data.
This makes every Physics / Denoiser / Prior directly compatible with
``jax.jit`` / ``jax.vmap`` / ``jax.grad`` / ``jax.sharding`` with no wrapper
layer: transform over the module itself.

Design rules
------------
- An attribute is a *leaf* (traced, differentiable, shardable) iff it is a
  ``jax.Array`` / ``numpy.ndarray``, another ``Module``, or a list/tuple/dict
  that (recursively) contains one of those.
- Everything else (str, int, float, bool, None, callables, shapes) is static:
  stored in the pytree aux data, hashed for jit-cache identity.
- Modules are mutable during ``__init__`` like normal Python objects, but
  should be treated as frozen afterwards; use :meth:`Module.replace` (or
  :func:`update`) for functional updates. This replaces the reference's
  ``update_parameters`` buffer mutation (deepinv/physics/noise.py:123).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["Module", "update", "is_array", "partition_arrays", "combine"]


def is_array(x) -> bool:
    """True for array-like values that should be pytree leaves."""
    return isinstance(x, (jax.Array, np.ndarray, np.generic))


def _is_dynamic(x) -> bool:
    """True if ``x`` contains any array or Module anywhere (→ pytree child)."""
    if is_array(x) or isinstance(x, Module):
        return True
    if isinstance(x, (list, tuple)):
        return any(_is_dynamic(v) for v in x)
    if isinstance(x, dict):
        return any(_is_dynamic(v) for v in x.values())
    # Generic registered pytrees (e.g. TensorList) with array leaves.
    if type(x) in _extra_dynamic_types:
        return True
    return False


# Types (beyond Module) that are always treated as dynamic children.
_extra_dynamic_types: set = set()


def register_dynamic_type(cls):
    """Mark a registered-pytree class as always-dynamic inside Modules."""
    _extra_dynamic_types.add(cls)
    return cls


class _Static:
    """Hashable wrapper for static aux values that may not be hashable."""

    __slots__ = ("value", "_hash")

    def __init__(self, value):
        self.value = value
        try:
            self._hash = hash(value)
        except TypeError:
            self._hash = hash(repr(value))

    def __hash__(self):
        return self._hash

    def __eq__(self, other):
        if not isinstance(other, _Static):
            return False
        try:
            eq = bool(self.value == other.value)
        except Exception:
            eq = self.value is other.value
        return eq

    def __repr__(self):
        return f"Static({self.value!r})"


class Module:
    """Base class: subclasses are automatically registered as pytrees."""

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        jax.tree_util.register_pytree_with_keys(
            cls,
            flatten_with_keys=_flatten_with_keys,
            flatten_func=_flatten,
            unflatten_func=lambda aux, children: _unflatten(cls, aux, children),
        )

    # -- functional update ------------------------------------------------
    def replace(self, **changes) -> "Module":
        """Return a shallow copy with the given attributes replaced."""
        new = object.__new__(type(self))
        new.__dict__.update(self.__dict__)
        for k, v in changes.items():
            if k not in self.__dict__:
                raise AttributeError(f"{type(self).__name__} has no attribute {k!r}")
            new.__dict__[k] = v
        return new

    def update(self, **params) -> "Module":
        """Functional analogue of the reference's ``update_parameters``.

        Unknown keys are ignored (the reference's generators emit parameter
        dicts consumed by whichever physics understands them —
        deepinv/physics/forward.py:139).
        """
        known = {k: v for k, v in params.items() if k in self.__dict__ and v is not None}
        return self.replace(**known) if known else self

    def __repr__(self):
        cls = type(self).__name__
        parts = []
        for k, v in self.__dict__.items():
            if is_array(v):
                parts.append(f"{k}={type(v).__name__}{tuple(v.shape)}")
            else:
                r = repr(v)
                parts.append(f"{k}={r if len(r) < 40 else r[:37] + '...'}")
        return f"{cls}({', '.join(parts)})"


def _flatten(mod: Module):
    keys = sorted(mod.__dict__.keys())
    dyn_keys, children, static_items = [], [], []
    for k in keys:
        v = mod.__dict__[k]
        if _is_dynamic(v):
            dyn_keys.append(k)
            children.append(v)
        else:
            static_items.append((k, _Static(v)))
    aux = (tuple(dyn_keys), tuple(static_items))
    return children, aux


def _flatten_with_keys(mod: Module):
    children, aux = _flatten(mod)
    keyed = [(jax.tree_util.GetAttrKey(k), c) for k, c in zip(aux[0], children)]
    return keyed, aux


def _unflatten(cls, aux, children):
    dyn_keys, static_items = aux
    new = object.__new__(cls)
    d = new.__dict__
    for k, c in zip(dyn_keys, children):
        d[k] = c
    for k, s in static_items:
        d[k] = s.value
    return new


def update(mod: Module, **params) -> Module:
    """Free-function form of :meth:`Module.update`."""
    return mod.update(**params)


def partition_arrays(tree):
    """Split a pytree into ``(arrays, static)``: ``arrays`` is a leaf list
    (None where the leaf is not an array — a valid pytree optax can
    update), ``static`` carries the treedef plus the non-array leaves.

    Flatten-based rather than tree_map-based: for :class:`Module` pytrees
    a None attribute is *structural* (it lands in the treedef), so mapping
    arrays to None changes the structure and the naive two-tree_map
    version could never be recombined (caught by
    tests/test_core.py::test_partition_and_combine_roundtrip).
    """
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = [l if is_array(l) else None for l in leaves]
    others = [None if is_array(l) else l for l in leaves]
    return arrays, (treedef, others)


def combine(arrays, static):
    """Inverse of :func:`partition_arrays`."""
    treedef, others = static
    leaves = [a if a is not None else s for a, s in zip(arrays, others)]
    return jax.tree_util.tree_unflatten(treedef, leaves)
