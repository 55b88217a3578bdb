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
    r"""K-weighted Noisier2Noise-SSDU loss (Millard & Chiew; reference
    mri/measplit.py:19).

    The split residual is weighted in k-space by ``w = (1 - K)^{-1/2}`` with
    ``K = (1 - P~ P)^{-1} (1 - P)`` where ``P`` / ``P~`` are the 1-D sampling
    pdfs of the acceleration-mask and splitting-mask generators (estimated
    Monte-Carlo via ``PhysicsGenerator.average``, reference
    measplit.py:144-191) — removes the bias of plain splitting for
    non-uniform sampling densities.
    """

    def __init__(self, mask_generator, physics_generator=None, metric=None,
                 eps: float = 1e-9):
        self.mask_generator = mask_generator
        self.physics_generator = physics_generator
        self.metric = metric if metric is not None else MSE()
        self.eps = eps
        if physics_generator is not None:
            self.weight = self.compute_weight(mask_generator, physics_generator,
                                              eps=eps)
        else:
            self.weight = jnp.asarray(1.0)

    @staticmethod
    def compute_weight(mask_generator, physics_generator, eps: float = 1e-9,
                       img_size=None, n: int = 2000, key=None):
        """Reference measplit.py:144: 1-D pdfs -> K -> ``(1-K)^{-1/2}``,
        returned with shape ``(1, W)``."""
        kwargs = {} if img_size is None else {"img_size": img_size}
        P = physics_generator.average(n=n, key=ensure_key(key, 101), **kwargs)["mask"]
        P_tilde = mask_generator.average(n=n, key=ensure_key(key, 102), **kwargs)["mask"]
        P, P_tilde = jnp.asarray(P), jnp.asarray(P_tilde)
        # the pdfs are reduced to 1-D along W, so only (H, W) must agree
        if P.shape[-2:] != P_tilde.shape[-2:]:
            raise ValueError(
                "physics_generator and mask_generator should produce same size masks."
            )
        while P.ndim > 1:
            P, P_tilde = P[0], P_tilde[0]
        P_tilde = jnp.minimum(P_tilde, 1 - eps)
        k_weight = (1 - P) / jnp.clip(1 - P_tilde * P, eps, None)
        k_weight = k_weight[None]  # (1, W)
        return jnp.clip(1 - k_weight, eps, None) ** (-0.5)

    def _forward(self, y, physics, model, key):
        """One split + model pass; returns (x1, mask1)."""
        from .measplit import SplittingModel, sample_split_mask, split as split_fn

        if isinstance(model, SplittingModel):
            # same key -> the model's input mask equals the loss mask
            x1, mask1 = model(y, physics, key=key, train=True, return_mask=True)
        else:
            mask1 = sample_split_mask(y, physics, key, 0.6, True,
                                      self.mask_generator)
            y1, p1 = split_fn(mask1, y, physics)
            x1 = model(y1, p1)
        return x1, mask1

    def _recon_loss(self, x1, mask1, y, physics):
        base_mask = getattr(physics, "mask", None)
        base = base_mask if base_mask is not None else 1.0
        mask2 = base - mask1 * base
        # route through the user metric like the reference's WeightedMetric
        # wrapper (mri/measplit.py:100): weight both inputs, then metric
        w = self.weight * mask2
        return self.metric(w * physics.A(x1), w * y)

    def __call__(self, x_net=None, y=None, physics=None, model=None, key=None, **kwargs):
        key = ensure_key(key, 14)
        x1, mask1 = self._forward(y, physics, model, key)
        return self._recon_loss(x1, mask1, y, physics)

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
    r"""Robust-SSDU (Millard & Chiew 2024; reference mri/measplit.py:274):
    weighted splitting on a further-noised input split plus a
    Noisier2Noise correction term
    ``||(1 + 1/alpha^2) M_1 M (A(x_net) - y)||^2``.

    The adapted model noises its split input ``y_1`` with
    ``alpha * sigma`` Gaussian noise during training (reference
    RobustSplittingModel.split:299).
    """

    def __init__(self, mask_generator, physics_generator=None, noise_model=None,
                 alpha: float = 0.75, metric=None):
        from ..physics.noise import GaussianNoise

        super().__init__(mask_generator, physics_generator, metric)
        if noise_model is None:
            noise_model = GaussianNoise(0.1)
        self.alpha = alpha
        # reference measplit.py:239: the injected noise std is alpha * sigma
        self.noise_model = noise_model.update(sigma=noise_model.sigma * alpha)

    def __call__(self, x_net=None, y=None, physics=None, model=None, key=None, **kwargs):
        key = ensure_key(key, 15)
        x1, mask1 = self._forward(y, physics, model, key)
        recon_loss = self._recon_loss(x1, mask1, y, physics)
        # Noisier2Noise correction on the *input* subset M_1 (same mask as
        # the recon term and the model's internal split)
        base_mask = getattr(physics, "mask", None)
        base = base_mask if base_mask is not None else 1.0
        w = (1 + 1 / (self.alpha**2)) * mask1 * base
        resid = w * (physics.A(x1) - y)
        n2n = jnp.mean(jnp.abs(resid).reshape(y.shape[0], -1) ** 2, axis=1)
        return recon_loss + n2n

    def adapt_model(self, model):
        """Wrap with a splitting model that noises the split input during
        training (reference RobustSplittingModel, measplit.py:287)."""
        from .measplit import SplittingModel

        if isinstance(model, SplittingModel):
            return model
        return SplittingModel(
            model, mask_generator=self.mask_generator,
            eval_n_samples=1, eval_split_input=False, pixelwise=True,
            noise_model=self.noise_model,
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
        # user metric, like the reference (mri/measplit.py metric arg)
        return self.metric(m2 * physics.update(mask=m2).A(x1), m2 * y)

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
    MRI/inpainting with varying masks — the residual is weighted by
    ``W^{-1/2}`` where ``W = E[mask]`` over the physics generator (the
    density compensation that defines ENSURE; without it the loss is just
    Gaussian SURE and its estimate is biased under undersampling)."""

    def __init__(self, sigma: float, physics_generator=None, tau: float = 1e-2):
        self.sigma = sigma
        self.physics_generator = physics_generator
        self.tau = tau
        if physics_generator is not None:
            d = jnp.asarray(physics_generator.average()["mask"])
            self.dsqrti = 1.0 / jnp.sqrt(jnp.clip(d, 1e-8, None))
        else:
            self.dsqrti = None

    def __call__(self, x_net=None, y=None, physics=None, model=None, key=None, **kwargs):
        key = ensure_key(key, 16)
        b = jax.random.normal(key, y.shape, y.dtype)

        def f(u):
            return physics.A(model(u, physics))

        y1, jvp_b = jax.jvp(f, (y,), (b,))
        div = 2 * self.sigma**2 * jnp.mean(
            (b * jvp_b).reshape(y.shape[0], -1), axis=1
        )
        resid = y1 - y
        if self.dsqrti is not None:
            # reference mri/sure.py:90: density-compensated residual
            # (k-space weighting; for MRI the reference additionally maps
            # to image domain with an orthonormal FFT, which leaves the
            # squared norm unchanged — Parseval)
            resid = resid * self.dsqrti
        mse = jnp.mean((resid ** 2).reshape(y.shape[0], -1), axis=1)
        return mse + div - self.sigma**2
