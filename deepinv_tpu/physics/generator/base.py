"""Random physics-parameter generators
(reference deepinv/physics/generator/base.py:20-183).

``step(batch_size, key) -> dict`` emits parameter dicts consumed by
``physics.update(**params)``. Mixing: ``g1 + g2`` merges dicts;
:class:`GeneratorMixture` picks one generator at random per step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core import Module
from ...core.rng import ensure_key

__all__ = ["PhysicsGenerator", "GeneratorMixture", "seed_from_string"]


def seed_from_string(seed: str) -> int:
    """64-bit integer seed hashed from a string (reference
    generator/base.py:9) — e.g. a file path, for per-sample deterministic
    physics in datasets."""
    from hashlib import sha256

    return int(sha256(seed.encode("utf-8")).hexdigest(), 16) % 0xFFFF_FFFF_FFFF_FFFF


class PhysicsGenerator(Module):
    """Random physics-parameter sampler with the reference's ``.step()``
    dict protocol (generator/base.py:20): ``gen.step(batch_size)`` returns a
    dict consumed by ``physics.update(**params)`` / ``physics(x, **params)``.

    :Examples:

        Generators compose with ``+`` (joint parameter dicts):

        >>> import jax
        >>> from deepinv_tpu.physics.generator import (SigmaGenerator,
        ...     GaussianMaskGenerator)
        >>> gen = SigmaGenerator() + GaussianMaskGenerator((16, 16),
        ...                                                acceleration=4)
        >>> params = gen.step(batch_size=2, key=jax.random.key(0))
        >>> sorted(params)
        ['mask', 'sigma']
        >>> params["sigma"].shape
        (2,)
    """

    def __init__(self, seed: int = 0):
        self.seed = seed
        self.initial_seed = seed

    def sample(self, batch_size: int, key, **kwargs) -> dict:
        raise NotImplementedError

    def rng_manual_seed(self, seed=None):
        """Set the generator's default seed (reference generator/base.py:110).

        JAX analogue of ``torch.Generator.manual_seed``: subsequent
        ``step(key=None)`` calls derive their key from this seed. String
        seeds are hashed like the reference.
        """
        if seed is not None:
            if isinstance(seed, str):
                # reduce like step() does: jax.random.key needs an
                # int64-representable seed, and set_seed('s');step() must
                # derive the same key as step(seed='s')
                seed = seed_from_string(seed) % (1 << 63)
            self.seed = int(seed)
        return self

    def reset_rng(self):
        """Reset the RNG to its initial state (reference generator/base.py:130):
        restores the construction-time seed so ``step(key=None)`` reproduces
        the first epoch's draws."""
        self.seed = self.initial_seed
        return self

    def step(self, batch_size: int = 1, key=None, seed=None, **kwargs) -> dict:
        seed = seed if seed is not None else self.seed
        if isinstance(seed, str):
            # jax.random.key needs an int64-representable seed
            seed = seed_from_string(seed) % (1 << 63)
        key = ensure_key(key, seed)
        return self.sample(batch_size, key, **kwargs)

    def average(self, n: int = 2000, batch_size: int = 1, key=None, **kwargs) -> dict:
        """Monte-Carlo average of the generated parameters over ``n`` draws
        (reference generator/base.py:152) — e.g. the expected mask / pdf of a
        mask generator, used by the K-weighted splitting losses."""
        if n <= 0:
            raise ValueError("n must be positive")
        key = ensure_key(key, self.seed)
        params_sum = None
        n_processed = 0
        while n_processed < n:
            n_batch = min(n - n_processed, max(batch_size, 1))
            key, sub = jax.random.split(key)
            params = self.step(batch_size=n_batch, key=sub, **kwargs)
            n_processed += n_batch
            partial = {
                k: jnp.sum(v, axis=0, keepdims=True) if hasattr(v, "ndim") and v.ndim
                else v * n_batch
                for k, v in params.items()
            }
            if params_sum is None:
                params_sum = partial
            else:
                if set(partial) != set(params_sum):
                    raise ValueError(
                        "PhysicsGenerator.step returned inconsistent keys across calls"
                    )
                params_sum = {k: params_sum[k] + partial[k] for k in params_sum}
        return {k: v / n for k, v in params_sum.items()}

    def __add__(self, other: "PhysicsGenerator") -> "PhysicsGenerator":
        return _JointGenerator(self, other)


class _JointGenerator(PhysicsGenerator):
    """g1 + g2: union of parameter dicts (base.py:146)."""

    def __init__(self, g1, g2):
        super().__init__()
        self.g1 = g1
        self.g2 = g2

    def sample(self, batch_size, key, **kwargs):
        k1, k2 = jax.random.split(key)
        out = dict(self.g1.sample(batch_size, k1, **kwargs))
        out.update(self.g2.sample(batch_size, k2, **kwargs))
        return out


class GeneratorMixture(PhysicsGenerator):
    """Mix several generators (reference base.py:185).

    With ``use_batch_sampling`` (default, reference base.py:221) each batch
    ELEMENT gets its own generator drawn from ``probs`` — possible only
    when all members emit the same parameter keys/shapes, checked once at
    construction by a probe draw; otherwise (or when disabled) ONE
    generator is drawn per step for the whole batch.
    """

    def __init__(self, generators, probs=None, use_batch_sampling: bool = True,
                 verbose: bool = False):
        super().__init__()
        self.generators = list(generators)
        import numpy as np

        p = np.asarray(probs if probs is not None else [1 / len(generators)] * len(generators))
        self.probs = p / p.sum()
        self.use_batch_sampling = bool(use_batch_sampling) and self._compatible(
            self.generators, verbose
        )

    @staticmethod
    def _compatible(generators, verbose=False):
        """Probe each member once; batch sampling needs identical parameter
        keys and per-sample shapes across members (reference base.py:241)."""
        import warnings

        import numpy as np

        dicts = [g.step(batch_size=1, key=jax.random.key(0)) for g in generators]
        keys0 = set(dicts[0])
        for i, d in enumerate(dicts[1:], 1):
            if set(d) != keys0:
                if verbose:
                    warnings.warn(
                        f"Generators 0 and {i} have different keys "
                        f"({sorted(keys0)} vs {sorted(d)}); a single "
                        "generator will be sampled per batch.")
                return False
        for k in keys0:
            shapes = {tuple(np.shape(d[k])) for d in dicts}
            if () in shapes:
                # scalar params (e.g. a static factor) cannot be
                # concatenated along a batch axis
                if verbose:
                    warnings.warn(
                        f"Param {k!r} is scalar-shaped; a single generator "
                        "will be sampled per batch.")
                return False
            if len(shapes) > 1:
                if verbose:
                    warnings.warn(
                        f"Generators emit different shapes for {k!r} "
                        f"({sorted(shapes)}); a single generator will be "
                        "sampled per batch.")
                return False
        return True

    def sample(self, batch_size, key, **kwargs):
        kc, kg = jax.random.split(key)
        # host-side choice (parameter dict structure may differ per generator)
        import numpy as np

        rng = np.random.RandomState(
            int(jax.random.randint(kc, (), 0, 2**31 - 1)))
        if self.use_batch_sampling and batch_size > 1:
            idx = rng.choice(len(self.generators), size=batch_size, p=self.probs)
            keys = jax.random.split(kg, batch_size)
            outs = [self.generators[int(i)].sample(1, k, **kwargs)
                    for i, k in zip(idx, keys)]
            return {
                k: jnp.concatenate([jnp.asarray(o[k]) for o in outs], axis=0)
                for k in outs[0]
            }
        idx = int(rng.choice(len(self.generators), p=self.probs))
        return self.generators[idx].sample(batch_size, kg, **kwargs)
