"""MRI-specific self-supervised losses
(reference deepinv/loss/mri/{measplit.py,sure.py}: WeightedSplittingLoss:19,
RobustSplittingLoss:194, Phase2PhaseLoss:306, Artifact2ArtifactLoss:493,
ENSURELoss).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.rng import ensure_key
from .base import Loss
from .metric import MSE

__all__ = [
    "WeightedSplittingLoss",
    "RobustSplittingLoss",
    "Phase2PhaseLoss",
    "Artifact2ArtifactLoss",
    "ENSURELoss",
]


class WeightedSplittingLoss(Loss):
    r"""K-weighted splitting loss (Millard & Chiew; reference mri/measplit.py:19).

    The split residual is weighted in k-space by ``w = (1 - P_2)^{-1/2}``
    where ``P_2`` is the probability a line lands in the loss subset —
    removes the bias of plain splitting for non-uniform sampling densities.
    """

    def __init__(self, mask_generator, physics_generator=None, metric=None, eps: float = 1e-3):
        self.mask_generator = mask_generator
        self.physics_generator = physics_generator
        self.metric = metric if metric is not None else MSE()
        self.eps = eps

    def __call__(self, x_net=None, y=None, physics=None, model=None, key=None, **kwargs):
        key = ensure_key(key, 14)
        k1, k2 = jax.random.split(key)
        base_mask = getattr(physics, "mask", None)
        split = self.mask_generator.step(y.shape[0], key=k1)["mask"]
        split = jnp.broadcast_to(split, y.shape)
        m1 = split * (base_mask if base_mask is not None else 1.0)
        y1 = m1 * y
        p1 = physics.update(mask=m1)
        x1 = model(y1, p1)
        # complementary subset
        m2 = (1 - split) * (base_mask if base_mask is not None else 1.0)
        # density weight: approximate P_2 by the empirical complement density
        p2_density = jnp.mean(m2, axis=(0, 2), keepdims=True)
        w = 1.0 / jnp.sqrt(jnp.clip(1.0 - p2_density, self.eps, None))
        resid = w * m2 * (physics.A(x1) - y)
        return jnp.mean(resid.reshape(y.shape[0], -1) ** 2, axis=1)

    def adapt_model(self, model):
        """Input-splitting wrapper; weighted losses evaluate on the full
        input (reference mri/measplit.py:134 eval_split_input=False)."""
        from .measplit import SplittingModel

        if isinstance(model, SplittingModel):
            return model
        return SplittingModel(
            model, mask_generator=self.mask_generator,
            eval_n_samples=1, eval_split_input=False, pixelwise=True,
        )


class RobustSplittingLoss(WeightedSplittingLoss):
    r"""Robust SSDU: weighted splitting + extra noise injection on the input
    split (reference mri/measplit.py:194)."""

    def __init__(self, mask_generator, noise_model=None, physics_generator=None, metric=None, alpha: float = 0.75):
        super().__init__(mask_generator, physics_generator, metric)
        from ..physics.noise import GaussianNoise

        self.noise_model = noise_model if noise_model is not None else GaussianNoise(0.01)
        self.alpha = alpha

    def __call__(self, x_net=None, y=None, physics=None, model=None, key=None, **kwargs):
        key = ensure_key(key, 15)
        kn, ks = jax.random.split(key)
        y_noisy = y + self.alpha * (self.noise_model(y, key=kn) - y)
        return super().__call__(
            x_net=x_net, y=y_noisy, physics=physics, model=model, key=ks, **kwargs
        )


class Phase2PhaseLoss(Loss):
    r"""Phase2Phase for dynamic MRI (reference mri/measplit.py:306): train on
    even frames to predict odd frames."""

    def __init__(self, img_size, metric=None):
        from ..physics.generator import Phase2PhaseSplittingMaskGenerator

        self.generator = Phase2PhaseSplittingMaskGenerator(img_size)
        self.metric = metric if metric is not None else MSE()

    def __call__(self, x_net=None, y=None, physics=None, model=None, key=None, **kwargs):
        from .measplit import SplittingModel

        key = ensure_key(key, 17)
        base_mask = getattr(physics, "mask", 1.0)
        if isinstance(model, SplittingModel):
            x1, split = model(y, physics, key=key, train=True, return_mask=True)
            m2 = base_mask - split
        else:
            split = self.generator.step(y.shape[0], key=key)["mask"]
            m1 = split * base_mask
            m2 = (1 - split) * base_mask
            x1 = model(m1 * y, physics.update(mask=m1))
        resid = m2 * (physics.update(mask=m2).A(x1) - y)
        return jnp.mean(jnp.abs(resid).reshape(y.shape[0], -1) ** 2, axis=1)

    def adapt_model(self, model):
        """Phase/chunk-splitting input wrapper; full input at evaluation
        (reference mri/measplit.py:457 adapt_model, eval_split_input=False)."""
        from .measplit import SplittingModel

        if isinstance(model, SplittingModel):
            return model
        return SplittingModel(
            model, mask_generator=self.generator,
            eval_n_samples=1, eval_split_input=False, pixelwise=True,
        )


class Artifact2ArtifactLoss(Phase2PhaseLoss):
    r"""Artifact2Artifact (reference mri/measplit.py:493): random time-chunk
    input, loss on another random chunk."""

    def __init__(self, img_size, split_size: int = 2, metric=None):
        from ..physics.generator import Artifact2ArtifactSplittingMaskGenerator

        self.generator = Artifact2ArtifactSplittingMaskGenerator(img_size, split_size)
        self.metric = metric if metric is not None else MSE()


class ENSURELoss(Loss):
    r"""ENSURE (reference mri/sure.py:17): SURE corrected for undersampled
    MRI with density-compensated projection."""

    def __init__(self, sigma: float, physics_generator=None, tau: float = 1e-2):
        self.sigma = sigma
        self.physics_generator = physics_generator
        self.tau = tau

    def __call__(self, x_net=None, y=None, physics=None, model=None, key=None, **kwargs):
        key = ensure_key(key, 16)
        b = jax.random.normal(key, y.shape, y.dtype)

        def f(u):
            return physics.A(model(u, physics))

        y1, jvp_b = jax.jvp(f, (y,), (b,))
        div = 2 * self.sigma**2 * jnp.mean(
            (b * jvp_b).reshape(y.shape[0], -1), axis=1
        )
        mse = jnp.mean(((y1 - y) ** 2).reshape(y.shape[0], -1), axis=1)
        return mse + div - self.sigma**2
