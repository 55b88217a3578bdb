"""Group-action transforms (reference deepinv/transform/base.py:29).

A Transform samples random group parameters, applies the action, and can
invert it — the machinery behind equivariant-imaging losses (loss/ei.py) and
EquivariantDenoiser. JAX design: parameters are explicit pytrees
(``get_params(key)`` → dict), application is pure
(``transform(x, **params)``), so the whole pipeline jits and vmaps; the
reference's ``TransformParam`` negation trick (base.py:8) becomes plain
negation in ``invert_params``.

Composition mirrors the reference: ``t1 * t2`` chains actions, ``t1 + t2``
stacks them batchwise (base.py:319).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import Module
from ..utils.mixins import TimeMixin
from ..core.rng import ensure_key

__all__ = ["Transform", "Identity", "TransformParam"]


class TransformParam:
    """Parameter wrapper overriding negation (reference
    deepinv/transform/base.py:8).

    The reference subclasses ``torch.Tensor`` so that ``-p`` applies a
    custom inverse (e.g. reciprocal for zoom factors). In this JAX port,
    parameter inversion is centralized in ``Transform.invert_params``, so
    this wrapper exists for API parity and for user code that carries
    custom-inverse parameters explicitly.

    :param p: parameter array (or scalar).
    :param neg: callable applied by unary ``-``; default plain negation.
    """

    def __init__(self, p, neg=None):
        self.p = jnp.asarray(p)
        self._neg = neg if neg is not None else (lambda v: -v)

    def __neg__(self):
        return TransformParam(self._neg(self.p), self._neg)

    def __getitem__(self, idx):
        return TransformParam(self.p[idx], self._neg)

    def __array__(self, dtype=None):
        import numpy as _np

        return _np.asarray(self.p, dtype=dtype)

    def __jax_array__(self):
        return self.p

    def __iter__(self):
        return iter(self.p)

    def __len__(self):
        return len(self.p)

    @property
    def shape(self):
        return self.p.shape

    def __repr__(self):
        return f"TransformParam({self.p!r})"


class Transform(Module, TimeMixin):
    """Base class for random group-action transforms.

    :param n_trans: number of transformed versions generated per call.

    :Examples:

        Transforms invert exactly and compose with ``*`` (chain) / ``+``
        (stack):

        >>> import jax, jax.numpy as jnp
        >>> from deepinv_tpu.transform import Rotate, Reflect
        >>> t = Rotate(multiples=90) * Reflect(dim=(-1,))
        >>> x = jax.random.uniform(jax.random.key(0), (1, 1, 8, 8))
        >>> params = t.get_params(x, jax.random.key(1))
        >>> xt = t.transform(x, **params)
        >>> bool(jnp.allclose(t.inverse(xt, **params), x, atol=1e-6))
        True
    """

    def __init__(self, n_trans: int = 1, seed: int = 0):
        self.n_trans = n_trans
        self.seed = seed

    # -- protocol ---------------------------------------------------------
    def get_params(self, x, key=None) -> dict:
        raise NotImplementedError

    def invert_params(self, params: dict) -> dict:
        """Negate/invert every parameter (reference base.py:143)."""
        return {k: -v for k, v in params.items()}

    def transform(self, x, **params):
        raise NotImplementedError

    def __call__(self, x, key=None, **kwargs):
        params = self.get_params(x, key)
        return self.transform(x, **params)

    def inverse(self, x, key=None, **params):
        """Apply the inverse action (reference base.py:175). With no
        params given, fresh ones are drawn from ``key`` like the
        reference — this also makes parameter-free transforms (whose
        get_params returns ``{}``) invertible."""
        if not params:
            params = self.get_params(x, key)
        return self.transform(x, **self.invert_params(params))

    def identity(self, x):
        return x

    def iterate_params(self, params: dict) -> list:
        """Expand drawn parameters into all singleton combinations
        (reference base.py:252) — e.g. full-group averaging in
        ``EquivariantDenoiser`` enumerates every element once instead of
        Monte-Carlo sampling. Host-side (trace-time) enumeration."""
        from itertools import product
        import numpy as np

        keys = list(params.keys())
        negs = [getattr(params[k], "_neg", None) for k in keys]
        lists = [np.asarray(params[k]).ravel().tolist() for k in keys]
        out = []
        for comb in product(*lists):
            d = {}
            for i, k in enumerate(keys):
                v = jnp.asarray([comb[i]])
                d[k] = v if negs[i] is None else TransformParam(v, neg=negs[i])
            out.append(d)
        return out

    def symmetrize(self, f, average: bool = True):
        """Return the symmetrized function x -> mean_t t^{-1}(f(t(x)))
        (reference base.py:259)."""

        def sym(x, *args, key=None, **kwargs):
            key = ensure_key(key, self.seed)
            params = self.get_params(x, key)
            xt = self.transform(x, **params)
            fx = f(xt, *args, **kwargs)
            out = self.inverse(fx, **params)
            if average and self.n_trans > 1:
                B = x.shape[0]
                out = out.reshape(self.n_trans, B, *out.shape[1:]).mean(0)
            return out

        return sym

    # -- algebra ----------------------------------------------------------
    def __mul__(self, other: "Transform") -> "Transform":
        return _ChainTransform(self, other)

    def __add__(self, other: "Transform") -> "Transform":
        return _StackTransform(self, other)

    def __or__(self, other: "Transform") -> "Transform":
        return _EitherTransform(self, other)

    # helper: repeat batch for n_trans versions
    def _repeat(self, x):
        return jnp.tile(x, (self.n_trans,) + (1,) * (x.ndim - 1))


class Identity(Transform):
    def get_params(self, x, key=None):
        return {}

    def invert_params(self, params):
        return {}

    def transform(self, x, **params):
        return x


class _ChainTransform(Transform):
    """t1 * t2: apply t2 then t1 (reference base.py:319)."""

    def __init__(self, t1: Transform, t2: Transform):
        super().__init__(n_trans=t1.n_trans * t2.n_trans)
        self.t1 = t1
        self.t2 = t2

    def get_params(self, x, key=None):
        key = ensure_key(key, 0)
        k1, k2 = jax.random.split(key)
        # t2 expands the batch to n_trans2*B before t1 acts, so t1's params
        # must be drawn for the *expanded* batch (reference ChainTransform
        # applies each factor's params per final batch element, base.py:319)
        p2 = self.t2.get_params(x, k2)
        x2 = self.t2._repeat(x)
        return {"p1": self.t1.get_params(x2, k1), "p2": p2}

    def invert_params(self, params):
        return {
            "p1": self.t1.invert_params(params["p1"]),
            "p2": self.t2.invert_params(params["p2"]),
        }

    def transform(self, x, p1=None, p2=None):
        return self.t1.transform(self.t2.transform(x, **p2), **p1)

    def _tile_p2(self, p2):
        # after t1 expands the batch to n1*(n2*B), t2's params must repeat
        # across the n1 copies (t1's _repeat tiles whole batch blocks)
        n1 = self.t1.n_trans
        return jax.tree_util.tree_map(
            lambda p: jnp.tile(p, (n1,) + (1,) * (p.ndim - 1)), p2
        )

    def inverse(self, x, p1=None, p2=None):
        y = self.t1.inverse(x, **p1)
        return self.t2.inverse(y, **self._tile_p2(p2))


class _EitherTransform(Transform):
    """t1 | t2: randomly select ONE of the two per parameter draw
    (reference base.py:401 EitherTransform). The choice is drawn into the
    params dict (host-side, from the key) so transform/inverse agree on it
    — the JAX analogue of the reference's ``recent_choice`` state."""

    def __init__(self, t1: Transform, t2: Transform):
        super().__init__(n_trans=t1.n_trans)
        self.t1 = t1
        self.t2 = t2

    def get_params(self, x, key=None):
        key = ensure_key(key, 0)
        kc, k1, k2 = jax.random.split(key, 3)
        choice = jax.random.bernoulli(kc)
        if not isinstance(choice, jax.core.Tracer):
            # concrete (trace-time) choice, like the reference's host
            # randint; under jit the traced bool selects via lax.cond in
            # transform/inverse instead
            choice = int(choice)
        return {
            "choice": choice,
            "p1": self.t1.get_params(x, k1),
            "p2": self.t2.get_params(x, k2),
        }

    def invert_params(self, params):
        return {
            "choice": params["choice"],
            "p1": self.t1.invert_params(params["p1"]),
            "p2": self.t2.invert_params(params["p2"]),
        }

    def transform(self, x, choice=0, p1=None, p2=None):
        if isinstance(choice, jax.core.Tracer):
            # jit-safe branch: both transforms produce the same output
            # shape (same n_trans), so a traced bool can select
            return jax.lax.cond(
                choice,
                lambda v: self.t1.transform(v, **p1),
                lambda v: self.t2.transform(v, **p2), x)
        t = self.t1 if choice else self.t2
        return t.transform(x, **(p1 if choice else p2))

    def inverse(self, x, choice=0, p1=None, p2=None):
        if isinstance(choice, jax.core.Tracer):
            return jax.lax.cond(
                choice,
                lambda v: self.t1.inverse(v, **p1),
                lambda v: self.t2.inverse(v, **p2), x)
        t = self.t1 if choice else self.t2
        return t.inverse(x, **(p1 if choice else p2))


class _StackTransform(Transform):
    """t1 + t2: concatenate transformed versions along batch (base.py:346)."""

    def __init__(self, t1: Transform, t2: Transform):
        super().__init__(n_trans=t1.n_trans + t2.n_trans)
        self.t1 = t1
        self.t2 = t2

    def get_params(self, x, key=None):
        key = ensure_key(key, 0)
        k1, k2 = jax.random.split(key)
        return {"p1": self.t1.get_params(x, k1), "p2": self.t2.get_params(x, k2)}

    def transform(self, x, p1=None, p2=None):
        return jnp.concatenate(
            [self.t1.transform(x, **p1), self.t2.transform(x, **p2)], axis=0
        )

    def invert_params(self, params):
        return {
            "p1": self.t1.invert_params(params["p1"]),
            "p2": self.t2.invert_params(params["p2"]),
        }

    def inverse(self, x, p1=None, p2=None):
        # the stacked batch is [t1's n1*B samples, then t2's n2*B samples]
        n1 = self.t1.n_trans * (x.shape[0] // self.n_trans)
        return jnp.concatenate(
            [self.t1.inverse(x[:n1], **p1), self.t2.inverse(x[n1:], **p2)],
            axis=0,
        )
