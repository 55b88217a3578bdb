"""Augmentation-based self-supervised losses.

- :class:`AugmentConsistencyLoss` — reference loss/augmentation.py:16
  (VORTEX, Desai et al. 2021): consistency between the reconstruction and the
  reconstruction of an augmented measurement under invariant (``T_i``, noise/
  phase in measurement domain) and equivariant (``T_e``, geometric) actions.
- :class:`EquivariantSplittingLoss` — reference loss/es.py:15: measurement
  splitting with an added prediction term, on a reconstructor made
  equivariant by Reynolds averaging.
- :class:`ReducedResolutionLoss` — reference loss/sup.py:53 (Wald's
  protocol / zero-shot super-resolution): train on further-degraded
  measurements with the original measurement as supervision.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.rng import ensure_key
from .base import Loss
from .metric import MSE

__all__ = [
    "AugmentConsistencyLoss",
    "EquivariantSplittingLoss",
    "ReducedResolutionLoss",
]


def _transformed_physics(physics, transform, params):
    from ..physics.base import LinearPhysics

    return LinearPhysics(
        A=lambda x: physics.A(transform.inverse(x, **params)),
        A_adjoint=lambda y: transform.transform(physics.A_adjoint(y), **params),
    )


class AugmentConsistencyLoss(Loss):
    r"""Data-augmentation consistency (reference augmentation.py:16):
    ``metric(T_e x_net, R(A T_e^{-1} T_e A^+ T_i y, A T_e^{-1}))`` — the
    model must be invariant to measurement-domain actions ``T_i`` and
    equivariant to image-domain actions ``T_e``.

    :param T_i: invariant transform on ``y`` (default: RandomNoise).
    :param T_e: equivariant transform (default: Shift then small Rotate).
    :param no_grad: stop gradients through the unaugmented branch (as in the
        original paper).
    """

    def __init__(self, T_i=None, T_e=None, metric=None, no_grad: bool = True):
        from ..transform import Identity, Shift, Rotate, RandomNoise

        self.metric = metric if metric is not None else MSE()
        self.T_i = T_i if T_i is not None else Identity()
        self.T_e = T_e if T_e is not None else (Shift() * Rotate(multiples=15.0, limits=15.0))
        self.no_grad = no_grad

    def __call__(self, x_net=None, y=None, physics=None, model=None, key=None, **kwargs):
        key = ensure_key(key, 31)
        k1, k2 = jax.random.split(key)
        if self.no_grad:
            x_net = jax.lax.stop_gradient(x_net)
        e_params = self.T_e.get_params(x_net, k1)
        y_i = self.T_i(y, key=k2)
        x_aug = self.T_e.transform(physics.A_adjoint(y_i), **e_params)
        phys2 = _transformed_physics(physics, self.T_e, e_params)
        x_aug_net = model(phys2.A(x_aug), phys2)
        return self.metric(self.T_e.transform(x_net, **e_params), x_aug_net)


class EquivariantSplittingLoss(Loss):
    r"""Equivariant splitting loss (reference es.py:15): transform the
    problem by a random ``T_g``, split the measurements into (y1, y2) with a
    Bernoulli mask, reconstruct from y1 and penalize consistency on y1 plus
    prediction on y2. The model should be (made) equivariant — see
    :class:`deepinv_tpu.models.EquivariantReconstructor`.

    :param transform: group action ``T_g`` (default: 90-degree rotations).
    :param split_ratio: fraction of measurements kept as input.
    """

    def __init__(self, transform=None, metric=None, split_ratio: float = 0.9,
                 pixelwise: bool = True):
        from ..transform import Rotate

        self.metric = metric if metric is not None else MSE()
        self.transform = transform if transform is not None else Rotate(multiples=90.0)
        self.split_ratio = split_ratio
        self.pixelwise = pixelwise

    def _mask(self, y, key):
        shape = list(y.shape)
        if self.pixelwise and len(shape) > 2:
            shape[1] = 1
        m = jax.random.bernoulli(key, self.split_ratio, tuple(shape)).astype(y.dtype)
        return jnp.broadcast_to(m, y.shape)

    def __call__(self, x_net=None, y=None, physics=None, model=None, key=None, **kwargs):
        key = ensure_key(key, 37)
        kg, km = jax.random.split(key)
        g_params = self.transform.get_params(physics.A_adjoint(y), kg)
        phys_g = _transformed_physics(physics, self.transform, g_params)
        mask = self._mask(y, km)
        # reconstruct from the kept split of the transformed problem
        from ..physics.base import LinearPhysics

        phys1 = LinearPhysics(
            A=lambda x: mask * phys_g.A(x),
            A_adjoint=lambda v: phys_g.A_adjoint(mask * v),
        )
        x1 = model(mask * y, phys1)
        yhat = phys_g.A(x1)
        consistency = self.metric(mask * yhat, mask * y) / max(self.split_ratio, 1e-6)
        prediction = self.metric((1 - mask) * yhat, (1 - mask) * y) / max(
            1 - self.split_ratio, 1e-6
        )
        return consistency + prediction


class ReducedResolutionLoss(Loss):
    r"""Reduced-resolution (Wald protocol / ZSSR) loss (reference sup.py:53):
    ``metric(R(A y), y)`` — degrade the measurement again, reconstruct, and
    supervise with the original measurement.

    :param physics: optional fixed degradation; defaults to the training
        physics (must be applicable to ``y``, e.g. blur/downsampling).
    """

    class ReducedResolutionModel:
        """Wald-protocol wrapper (reference sup.py:118): at train time feed
        the re-degraded measurement through the model; at eval, identity."""

        def __init__(self, model, physics=None):
            self.model = model
            self.physics = physics
            self.training = True

        def __call__(self, y, physics, **kwargs):
            if self.training:
                phys = self.physics if self.physics is not None else physics
                return self.model(phys(y), phys)
            return self.model(y, physics)

        forward = __call__

    def __init__(self, metric=None, physics=None):
        self.metric = metric if metric is not None else MSE()
        self.physics = physics

    def adapt_model(self, model):
        """Wrap ``model`` into :class:`ReducedResolutionModel` (reference
        sup.py:110)."""
        if isinstance(model, ReducedResolutionLoss.ReducedResolutionModel):
            return model
        return self.ReducedResolutionModel(model, self.physics)

    def __call__(self, x_net=None, y=None, physics=None, model=None, key=None, **kwargs):
        # the adapted model already reconstructed from the re-degraded
        # measurement, so the loss is just metric(x_net, y) (reference
        # sup.py:94 — re-degrading here again would double-degrade)
        return self.metric(x_net, y)
