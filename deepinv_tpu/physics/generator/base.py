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

__all__ = ["PhysicsGenerator", "GeneratorMixture"]


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
                import hashlib

                seed = int(hashlib.sha256(seed.encode()).hexdigest()[:8], 16)
            self.seed = int(seed)
        return self

    def reset_rng(self):
        """Reset the RNG to its initial state (reference generator/base.py:130):
        restores the construction-time seed so ``step(key=None)`` reproduces
        the first epoch's draws."""
        self.seed = self.initial_seed
        return self

    def step(self, batch_size: int = 1, key=None, seed=None, **kwargs) -> dict:
        key = ensure_key(key, seed if seed is not None else self.seed)
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
    """Pick one generator per step with given probabilities (base.py:185)."""

    def __init__(self, generators, probs=None):
        super().__init__()
        self.generators = list(generators)
        import numpy as np

        p = np.asarray(probs if probs is not None else [1 / len(generators)] * len(generators))
        self.probs = p / p.sum()

    def sample(self, batch_size, key, **kwargs):
        kc, kg = jax.random.split(key)
        # host-side choice (parameter dict structure may differ per generator)
        import numpy as np

        idx = int(np.random.RandomState(int(jax.random.randint(kc, (), 0, 2**31 - 1))).choice(
            len(self.generators), p=self.probs
        ))
        return self.generators[idx].sample(batch_size, kg, **kwargs)
