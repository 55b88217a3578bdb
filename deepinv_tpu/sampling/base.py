"""MCMC chain driver (reference deepinv/sampling/sampling.py:19 BaseSampling).

The whole chain — burn-in, thinning, online Welford mean/variance
(sampling/utils.py:6) — compiles to one ``lax.scan``: the Welford moments
ride in the carry with 0/1 inclusion weights, so there is no host-side
bookkeeping per step (the reference steps the chain in Python).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..core import Module, tree_norm
from ..core.rng import ensure_key
from ..optim.data_fidelity import L2
from .iterators import SamplingIterator, ULAIterator, SKRockIterator

__all__ = ["BaseSampling", "sampling_builder", "ULA", "SKRock"]


class BaseSampling(Module):
    """Monte-Carlo sampler over a sampling iterator (sampling.py:19).

    :param iterator: a :class:`SamplingIterator`.
    :param data_fidelity: negative log-likelihood term.
    :param prior: score prior.
    :param max_iter: chain length.
    :param burnin_ratio: fraction of iterations discarded.
    :param thinning: keep every k-th sample after burn-in.
    """

    def __init__(
        self,
        iterator: SamplingIterator,
        data_fidelity=None,
        prior=None,
        max_iter: int = 100,
        burnin_ratio: float = 0.2,
        thinning: int = 1,
        thresh_conv: float = 1e-3,
        history_size: int = 5,
        verbose: bool = False,
    ):
        self.iterator = iterator
        self.data_fidelity = data_fidelity if data_fidelity is not None else L2()
        self.prior = prior
        self.max_iter = max_iter
        self.burnin_ratio = burnin_ratio
        self.thinning = thinning
        self.thresh_conv = thresh_conv
        self.history_size = history_size
        self.verbose = verbose
        # populated by sample() (reference sampling.py:102,109)
        self.mean_convergence = False
        self.var_convergence = False
        self.history = []

    def sample(self, y, physics, x_init=None, key=None, seed: int = 0):
        """Run the chain; returns (mean, var) of included samples."""
        key = ensure_key(key, seed)
        if x_init is None:
            x_init = physics.A_adjoint(y)
        X0 = self.iterator.initialize(x_init)
        burnin = int(self.max_iter * self.burnin_ratio)

        zeros = jnp.zeros_like(x_init)
        if self.history_size is True:
            # reference semantics (sampling.py history_size: int | bool):
            # True stores EVERY included sample
            hsize = max((self.max_iter - burnin - 1) // self.thinning + 1, 1)
        else:
            hsize = max(int(self.history_size or 0), 0)
        ring0 = jnp.zeros((max(hsize, 1),) + x_init.shape, x_init.dtype)
        carry0 = (X0, zeros, zeros, jnp.asarray(0.0), ring0,
                  jnp.asarray(jnp.inf), jnp.asarray(jnp.inf))

        keys = jax.random.split(key, self.max_iter)
        its = jnp.arange(self.max_iter)

        def body(carry, inp):
            X, mean, m2, count, ring, dmean, dvar = carry
            k, it = inp
            X = self.iterator(
                X, y, physics, self.data_fidelity, self.prior, it, k
            )
            include = jnp.logical_and(
                it >= burnin, (it - burnin) % self.thinning == 0
            ).astype(x_init.dtype)
            x = X["x"]
            count_new = count + include
            delta = x - mean
            mean_new = mean + include * delta / jnp.maximum(count_new, 1.0)
            m2_new = m2 + include * delta * (x - mean_new)
            # last-samples ring buffer (the reference's deque history)
            if hsize:
                slot = (jnp.maximum(count_new - 1.0, 0.0) % hsize).astype(jnp.int32)
                new_ring = jax.lax.dynamic_update_index_in_dim(ring, x, slot, 0)
                ring = jnp.where(include > 0, new_ring, ring)
            # relative change of the running statistics at included steps
            # (drives mean/var_has_converged, reference sampling.py:269)
            eps = 1e-12
            dm = tree_norm(mean_new - mean) / (tree_norm(mean_new) + eps)
            dv = tree_norm(m2_new - m2) / (tree_norm(m2_new) + eps)
            dmean = jnp.where(include > 0, dm, dmean)
            dvar = jnp.where(include > 0, dv, dvar)
            return (X, mean_new, m2_new, count_new, ring, dmean, dvar), None

        (Xf, mean, m2, count, ring, dmean, dvar), _ = jax.lax.scan(
            body, carry0, (keys, its)
        )
        var = m2 / jnp.maximum(count - 1.0, 1.0)
        # host-side bookkeeping (sample() is an eager entry point)
        if not isinstance(mean, jax.core.Tracer):
            n_kept = int(count)
            if hsize and n_kept:
                k_avail = min(hsize, n_kept)
                start = n_kept % hsize
                order = [(start - k_avail + i) % hsize for i in range(k_avail)]
                self.history = [ring[i] for i in order]
            self.mean_convergence = bool(dmean < self.thresh_conv)
            self.var_convergence = bool(dvar < self.thresh_conv)
        return mean, var

    # -- reference chain/diagnostics API (sampling.py:300-348) -------------
    def get_chain(self):
        """Last ``history_size`` included samples, oldest first (all of
        them when ``history_size=True``)."""
        if self.history_size is False or self.history_size == 0:
            # reference sampling.py:331 raises instead of returning an
            # empty chain the caller might silently average over
            raise RuntimeError(
                "Samples have not been saved: set history_size to True or "
                "an int when constructing the sampler")
        return list(self.history)

    def mean_has_converged(self) -> bool:
        """Whether the running mean moved < ``thresh_conv`` (relative) at
        the last included sample."""
        return self.mean_convergence

    def var_has_converged(self) -> bool:
        """Whether the running variance moved < ``thresh_conv`` (relative)
        at the last included sample."""
        return self.var_convergence

    def __call__(self, y, physics, x_init=None, key=None, seed: int = 0):
        mean, _ = self.sample(y, physics, x_init=x_init, key=key, seed=seed)
        return mean

    forward = __call__


def sampling_builder(
    iteration, data_fidelity=None, prior=None, params_algo=None, max_iter=100, **kwargs
) -> BaseSampling:
    """Build a sampler by name (reference sampling.py:366)."""
    its = {"ULA": ULAIterator, "SKROCK": SKRockIterator}
    if isinstance(iteration, SamplingIterator):
        it = iteration
    else:
        cls = its.get(str(iteration).upper())
        if cls is None:
            raise ValueError(f"unknown sampling iteration {iteration!r}")
        it = cls(params_algo or {})
    return BaseSampling(it, data_fidelity=data_fidelity, prior=prior, max_iter=max_iter, **kwargs)


def ULA(prior, data_fidelity, step_size=1e-4, sigma=0.05, alpha=1.0, max_iter=1000, burnin_ratio=0.2, thinning=10, clip=(-1.0, 2.0), **kwargs):
    """Unadjusted Langevin sampler preset (reference langevin.py:15).

    :Examples:

        The whole chain (burn-in, thinning, Welford mean/var) compiles to
        one ``lax.scan``:

        >>> import jax
        >>> from deepinv_tpu.sampling import ULA
        >>> from deepinv_tpu.optim import L2, ScorePrior
        >>> from deepinv_tpu.models import MedianFilter
        >>> from deepinv_tpu.physics import Denoising, GaussianNoise
        >>> physics = Denoising(noise_model=GaussianNoise(0.1))
        >>> x = jax.random.uniform(jax.random.key(0), (1, 1, 8, 8))
        >>> y = physics(x, key=jax.random.key(1))
        >>> sampler = ULA(ScorePrior(MedianFilter()), L2(sigma=0.1),
        ...               step_size=1e-3, max_iter=50, thinning=5)
        >>> mean, var = sampler.sample(y, physics, key=jax.random.key(2))
        >>> mean.shape == x.shape and var.shape == x.shape
        True
    """
    it = ULAIterator(
        {"step_size": step_size, "alpha": alpha, "sigma": sigma}, clip=clip
    )
    return BaseSampling(
        it, data_fidelity=data_fidelity, prior=prior, max_iter=max_iter,
        burnin_ratio=burnin_ratio, thinning=thinning, **kwargs,
    )


def SKRock(prior, data_fidelity, step_size=1e-4, sigma=0.05, alpha=1.0, inner_iter=10, eta=0.05, max_iter=1000, burnin_ratio=0.2, thinning=10, clip=(-1.0, 2.0), **kwargs):
    """SK-ROCK sampler preset (reference langevin.py:118)."""
    it = SKRockIterator(
        {
            "step_size": step_size, "alpha": alpha, "sigma": sigma,
            "inner_iter": inner_iter, "eta": eta,
        },
        clip=clip,
    )
    return BaseSampling(
        it, data_fidelity=data_fidelity, prior=prior, max_iter=max_iter,
        burnin_ratio=burnin_ratio, thinning=thinning, **kwargs,
    )


class DiffusionSampler(BaseSampling):
    """Turn a diffusion method into a Monte-Carlo posterior sampler
    (reference diffusion.py:20): run the diffusion ``max_iter`` times and
    compute mean/variance with Welford accumulation.

    :param diffusion: a diffusion reconstructor ``model(y, physics, key)``
        (e.g. :class:`DDRM`, :class:`DiffPIR`, :class:`DPS`,
        :class:`PosteriorDiffusion`).
    """

    def __init__(self, diffusion, max_iter: int = 100, clip=(-1.0, 2.0),
                 thres_conv: float = 1e-1, verbose: bool = False,
                 save_chain: bool = False):
        from .iterators import DiffusionIterator

        super().__init__(
            DiffusionIterator(clip=clip),
            data_fidelity=None,
            prior=diffusion,
            max_iter=int(max_iter),
            burnin_ratio=0.0,
            thinning=1,
            thresh_conv=thres_conv,
            verbose=verbose,
            # reference diffusion sampler: save_chain gates chain storage
            history_size=True if save_chain else False,
        )
