"""TensorList: heterogeneous stacks of arrays as a first-class pytree.

Reimplements the reference container ``deepinv.utils.TensorList``
(deepinv/utils/tensorlist.py:5-397) the JAX way: a registered pytree whose
children are the member arrays. Because it is a pytree, it flows through
``jit`` / ``grad`` / ``vmap`` / collectives with zero special-casing — the
reference needed bespoke gather/reduce code for it
(deepinv/distributed/distributed_utils.py); here ``jax.lax.psum`` et al.
handle it natively.

Used for stacked physics (``stack``): measurements ``y = [A_1 x, ..., A_k x]``
with heterogeneous shapes.
"""

from __future__ import annotations

import operator

import jax
import jax.numpy as jnp

from .module import register_dynamic_type

__all__ = ["TensorList", "randn_like", "zeros_like", "ones_like", "rand_like"]


class TensorList:
    """A list of arrays supporting elementwise arithmetic.

    ``TensorList([a, b]) + TensorList([c, d]) == TensorList([a+c, b+d])``;
    scalars and single arrays broadcast across all members. Registered as a
    pytree, so stacked-physics measurements flow through jit/grad/optimizers
    with no special casing (unlike the reference's custom TensorList class,
    utils/tensorlist.py:5).

    :Examples:

        >>> import jax.numpy as jnp
        >>> from deepinv_tpu.core import TensorList
        >>> tl = TensorList([jnp.ones((2, 2)), jnp.zeros(3)])
        >>> out = tl * 2.0 + 1.0
        >>> float(out[0][0, 0]), float(out[1][0])
        (3.0, 1.0)
        >>> len(out.flatten()) == 2 * 2 + 3
        True
    """

    __slots__ = ("x",)

    def __init__(self, x):
        if isinstance(x, TensorList):
            x = list(x.x)
        elif isinstance(x, (jax.Array,)) or hasattr(x, "shape"):
            x = [x]
        else:
            x = list(x)
        self.x = x

    # -- list protocol ----------------------------------------------------
    def __len__(self):
        return len(self.x)

    def __iter__(self):
        return iter(self.x)

    def __getitem__(self, i):
        if isinstance(i, slice):
            return TensorList(self.x[i])
        return self.x[i]

    def append(self, other):
        new = list(self.x)
        if isinstance(other, TensorList):
            new.extend(other.x)
        else:
            new.append(other)
        return TensorList(new)

    @property
    def shape(self):
        return [v.shape for v in self.x]

    @property
    def dtype(self):
        return [v.dtype for v in self.x]

    def flatten(self):
        """Concatenate all members, each flattened, into one 1D array."""
        return jnp.concatenate([v.reshape(-1) for v in self.x])

    # -- arithmetic -------------------------------------------------------
    def _binary(self, other, op):
        if isinstance(other, TensorList):
            if len(other) != len(self):
                raise ValueError("TensorList length mismatch")
            return TensorList([op(a, b) for a, b in zip(self.x, other.x)])
        return TensorList([op(a, other) for a in self.x])

    def _rbinary(self, other, op):
        return TensorList([op(other, a) for a in self.x])

    def __add__(self, o):
        return self._binary(o, operator.add)

    def __radd__(self, o):
        return self._rbinary(o, operator.add)

    def __sub__(self, o):
        return self._binary(o, operator.sub)

    def __rsub__(self, o):
        return self._rbinary(o, operator.sub)

    def __mul__(self, o):
        return self._binary(o, operator.mul)

    def __rmul__(self, o):
        return self._rbinary(o, operator.mul)

    def __truediv__(self, o):
        return self._binary(o, operator.truediv)

    def __rtruediv__(self, o):
        return self._rbinary(o, operator.truediv)

    def __pow__(self, o):
        return self._binary(o, operator.pow)

    def __neg__(self):
        return TensorList([-a for a in self.x])

    def __abs__(self):
        return TensorList([jnp.abs(a) for a in self.x])

    def conj(self):
        return TensorList([jnp.conj(a) for a in self.x])

    def sum(self):
        """Sum of all elements of all members (scalar)."""
        return sum(jnp.sum(a) for a in self.x)

    # -- reference conveniences (deepinv/utils/tensorlist.py:41-305) --------
    def abs(self):
        """Member-wise absolute value (reference tensorlist.py:59)."""
        return TensorList([jnp.abs(a) for a in self.x])

    def max(self):
        """TensorList of each member's maximum (reference tensorlist.py:65)."""
        return TensorList([jnp.max(a) for a in self.x])

    def clone(self):
        """Copy of the TensorList (reference tensorlist.py:41; arrays are
        immutable in JAX, so members are shared)."""
        return TensorList(list(self.x))

    def detach(self):
        """Gradient-stopped copy (reference tensorlist.py:47)."""
        return TensorList([jax.lax.stop_gradient(a) for a in self.x])

    def numpy(self):
        """List of numpy arrays (reference tensorlist.py:71)."""
        import numpy as np

        return [np.asarray(a) for a in self.x]

    def isnan(self):
        """TensorList of NaN masks (reference tensorlist.py:294)."""
        return TensorList([jnp.isnan(a) for a in self.x])

    def numel(self):
        """Total number of elements (reference tensorlist.py:300)."""
        return sum(a.size for a in self.x)

    def any(self):
        """True if any member has a True element (reference tensorlist.py:234)."""
        return any(bool(jnp.any(a)) for a in self.x)

    def all(self):
        """True if every element of every member is True (reference
        tensorlist.py:250)."""
        return all(bool(jnp.all(a)) for a in self.x)

    def __gt__(self, o):
        return self._binary(o, operator.gt)

    def __lt__(self, o):
        return self._binary(o, operator.lt)

    def squeeze(self, axis=None):
        """Member-wise squeeze (reference tensorlist.py:274)."""
        return TensorList([
            jnp.squeeze(a) if axis is None else jnp.squeeze(a, axis=axis)
            for a in self.x
        ])

    def unsqueeze(self, axis):
        """Member-wise expand_dims (reference tensorlist.py:283)."""
        return TensorList([jnp.expand_dims(a, axis) for a in self.x])

    def reshape(self, shapes):
        return TensorList([a.reshape(s) for a, s in zip(self.x, shapes)])

    def astype(self, dtype):
        return TensorList([a.astype(dtype) for a in self.x])

    def __repr__(self):
        return f"TensorList({[tuple(v.shape) for v in self.x]})"


jax.tree_util.register_pytree_with_keys(
    TensorList,
    flatten_with_keys=lambda tl: (
        [(jax.tree_util.SequenceKey(i), v) for i, v in enumerate(tl.x)],
        len(tl.x),
    ),
    flatten_func=lambda tl: (tl.x, len(tl.x)),
    unflatten_func=lambda n, xs: TensorList(list(xs)),
)
register_dynamic_type(TensorList)


def zeros_like(y):
    return jax.tree_util.tree_map(jnp.zeros_like, y)


def ones_like(y):
    return jax.tree_util.tree_map(jnp.ones_like, y)


def randn_like(key, y):
    """Normal sample with the same (pytree) structure/shape/dtype as ``y``."""
    leaves, treedef = jax.tree_util.tree_flatten(y)
    keys = jax.random.split(key, len(leaves))
    out = []
    for k, v in zip(keys, leaves):
        if jnp.issubdtype(v.dtype, jnp.complexfloating):
            kr, ki = jax.random.split(k)
            real_dt = jnp.finfo(v.dtype).dtype
            out.append(
                (
                    jax.random.normal(kr, v.shape, real_dt)
                    + 1j * jax.random.normal(ki, v.shape, real_dt)
                ).astype(v.dtype)
                / jnp.sqrt(2.0).astype(real_dt)
            )
        else:
            out.append(jax.random.normal(k, v.shape, v.dtype))
    return jax.tree_util.tree_unflatten(treedef, out)


def rand_like(key, y):
    """Uniform[0,1) sample matching the structure of ``y`` (real dtypes)."""
    leaves, treedef = jax.tree_util.tree_flatten(y)
    keys = jax.random.split(key, len(leaves))
    out = [jax.random.uniform(k, v.shape, v.dtype) for k, v in zip(keys, leaves)]
    return jax.tree_util.tree_unflatten(treedef, out)
