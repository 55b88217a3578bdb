"""Measurement-splitting losses (reference deepinv/loss/measplit.py, 519 LoC).

SplittingLoss: split measurements into disjoint input/target subsets with a
random mask each step — self-supervision without ground truth. The mask
enters through ``physics.update(mask=...)`` (functional), replacing the
reference's stateful SplittingModel wrapper (measplit.py:11, adapt_model).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.rng import ensure_key
from .base import Loss
from .metric import MSE

__all__ = ["SplittingLoss", "Neighbor2Neighbor"]


class SplittingLoss(Loss):
    r"""Measurement splitting (reference measplit.py:11).

    ``y1 = M y`` feeds the model, the loss is evaluated on the complement:
    ``loss = metric((1-M) A(xhat), (1-M) y) / (1 - split_ratio)``.

    :param split_ratio: fraction of measurements kept as input.
    :param pixelwise: share the mask across channels.

    :Examples:

        Self-supervised from measurements alone — ``adapt_model`` makes the
        model consume the masked input (reference measplit.py adapt_model):

        >>> import jax
        >>> from deepinv_tpu.loss import SplittingLoss
        >>> from deepinv_tpu.physics import Denoising, GaussianNoise
        >>> from deepinv_tpu.models import MedianFilter
        >>> physics = Denoising(noise_model=GaussianNoise(0.1))
        >>> x = jax.random.uniform(jax.random.key(0), (2, 1, 16, 16))
        >>> y = physics(x, key=jax.random.key(1))
        >>> loss = SplittingLoss(split_ratio=0.8)
        >>> model = loss.adapt_model(lambda yv, p, **kw: MedianFilter()(yv, 0.1))
        >>> x_net = model(y, physics, key=jax.random.key(2))
        >>> l = loss(x_net=x_net, y=y, physics=physics, model=model,
        ...          key=jax.random.key(3))
        >>> l.shape
        (2,)
    """

    def __init__(self, metric=None, split_ratio: float = 0.9, pixelwise: bool = True, eval_n_samples: int = 5):
        self.metric = metric if metric is not None else MSE()
        self.split_ratio = split_ratio
        self.pixelwise = pixelwise
        self.eval_n_samples = eval_n_samples

    def sample_mask(self, y, key):
        shape = list(y.shape)
        if self.pixelwise:
            shape[1] = 1
        m = jax.random.bernoulli(key, self.split_ratio, tuple(shape)).astype(y.dtype)
        return jnp.broadcast_to(m, y.shape)

    def __call__(self, x_net=None, y=None, physics=None, model=None, key=None, **kwargs):
        key = ensure_key(key, 12)
        mask = self.sample_mask(y, key)
        y1 = mask * y
        base_mask = getattr(physics, "mask", None)
        if base_mask is not None and not isinstance(base_mask, float):
            p1 = physics.update(mask=mask * base_mask)
        else:
            p1 = physics
        x1 = model(y1, p1)
        resid = (1 - mask) * (physics.A(x1) - y)
        loss = jnp.mean(resid.reshape(y.shape[0], -1) ** 2, axis=1)
        return loss / max(1 - self.split_ratio, 1e-6)

    def adapt_model(self, model):
        return model


class Neighbor2Neighbor(Loss):
    r"""Neighbor2Neighbor loss (reference measplit.py, Huang et al. 2021):
    random neighbor subsampling pairs + consistency regularizer."""

    def __init__(self, metric=None, gamma: float = 2.0):
        self.metric = metric if metric is not None else MSE()
        self.gamma = gamma

    @staticmethod
    def _subsample(y, choice, offset):
        """Pick one pixel of each 2x2 cell; ``choice`` in {0..3} per cell."""
        B, C, H, W = y.shape
        H2, W2 = H // 2, W // 2
        cells = y[:, :, : H2 * 2, : W2 * 2].reshape(B, C, H2, 2, W2, 2)
        cells = jnp.moveaxis(cells, 3, -2).reshape(B, C, H2, W2, 4)
        idx = (choice + offset) % 4
        return jnp.take_along_axis(cells, idx[..., None], axis=-1)[..., 0]

    def __call__(self, y=None, physics=None, model=None, x_net=None, key=None, **kwargs):
        key = ensure_key(key, 13)
        B, C, H, W = y.shape
        H2, W2 = H // 2, W // 2
        kc, ko = jax.random.split(key)
        choice = jax.random.randint(kc, (B, 1, H2, W2), 0, 4)
        # neighbor offset in {1,2,3} => a different pixel of the same cell
        offset = jax.random.randint(ko, (B, 1, H2, W2), 1, 4)
        g1 = self._subsample(y, choice, jnp.zeros_like(choice))
        g2 = self._subsample(y, choice, offset)
        f_g1 = model(g1, physics)
        # consistency: denoise full image then subsample
        f_y = model(y, physics)
        f_y1 = self._subsample(f_y, choice, jnp.zeros_like(choice))
        f_y2 = self._subsample(f_y, choice, offset)
        l_rec = jnp.mean((f_g1 - g2).reshape(B, -1) ** 2, axis=1)
        l_reg = jnp.mean(
            ((f_g1 - g2) - (f_y1 - f_y2)).reshape(B, -1) ** 2, axis=1
        )
        return l_rec + self.gamma * l_reg
