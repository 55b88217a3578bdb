"""PRNG conventions.

The reference threads stateful per-object ``torch.Generator`` instances
through noise models, generators and samplers (deepinv/physics/noise.py:22-37,
physics/generator/base.py:110-132). The JAX design replaces this with
explicit ``jax.random`` key threading plus a *key-derivation convention* that
reproduces the reference's "reset_rng → same measurements each epoch"
semantics (deepinv/training/trainer.py:1352-1358):

- every stochastic call takes ``key=``;
- ``key=None`` falls back to a key derived from the object's static ``seed``
  field, giving deterministic-per-instance behavior like a freshly seeded
  torch.Generator;
- epoch reproducibility = ``epoch_key(base, epoch)`` then
  ``jax.random.fold_in(k, step)`` per batch.
"""

from __future__ import annotations

import jax

__all__ = ["ensure_key", "epoch_key", "split_like"]


def ensure_key(key, seed: int = 0):
    """Return ``key`` if given, else a key derived from ``seed``."""
    if key is None:
        return jax.random.key(seed)
    if isinstance(key, int):
        return jax.random.key(key)
    return key


def epoch_key(base_key, epoch: int):
    """Key for a given epoch; refolding the same epoch reproduces it."""
    return jax.random.fold_in(base_key, epoch)


def split_like(key, tree):
    """Split a key into one key per leaf of ``tree`` (same structure)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    keys = jax.random.split(key, len(leaves))
    return jax.tree_util.tree_unflatten(treedef, list(keys))
