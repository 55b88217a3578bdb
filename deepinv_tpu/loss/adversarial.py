"""Adversarial losses (reference deepinv/loss/adversarial/{base.py,
consistency.py, uair.py}).

LSGAN-style discriminator metric by default; generator/discriminator losses
take the discriminator ``D`` as an explicit argument so both networks stay
functional pytrees.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import Module
from .base import Loss

__all__ = [
    "DiscriminatorMetric",
    "GeneratorLoss",
    "DiscriminatorLoss",
    "SupAdversarialGeneratorLoss",
    "SupAdversarialDiscriminatorLoss",
    "UnsupAdversarialGeneratorLoss",
    "UnsupAdversarialDiscriminatorLoss",
    "UAIRGeneratorLoss",
]


class DiscriminatorMetric(Module):
    """LSGAN least-squares metric vs real/fake labels (base.py:10)."""

    def __init__(self, real_label: float = 1.0, fake_label: float = 0.0, no_grad: bool = False):
        self.real_label = real_label
        self.fake_label = fake_label
        self.no_grad = no_grad

    def __call__(self, pred, real: bool):
        target = self.real_label if real else self.fake_label
        if self.no_grad:
            pred = jax.lax.stop_gradient(pred)
        return jnp.mean((pred - target) ** 2)


class GeneratorLoss(Loss):
    """Base generator adversarial loss (base.py:59)."""

    def __init__(self, weight_adv: float = 1.0):
        self.weight_adv = weight_adv
        self.metric_gan = DiscriminatorMetric()

    def adversarial_loss(self, real, fake, D):
        """Generator wants D(fake) -> real label (base.py:98)."""
        pred_fake = D(fake)
        return self.weight_adv * self.metric_gan(pred_fake, real=True)


class DiscriminatorLoss(Loss):
    """Base discriminator adversarial loss (base.py:102)."""

    def __init__(self, weight_adv: float = 1.0):
        self.weight_adv = weight_adv
        self.metric_gan = DiscriminatorMetric()

    def adversarial_loss(self, real, fake, D):
        pred_real = D(real)
        pred_fake = D(jax.lax.stop_gradient(fake))
        return self.weight_adv * (
            self.metric_gan(pred_real, real=True) + self.metric_gan(pred_fake, real=False)
        )


class SupAdversarialGeneratorLoss(GeneratorLoss):
    """Supervised: fool D on (x, x_net) pairs (consistency.py:7).
    Default ``weight_adv=0.01`` from the original paper (consistency.py:38)."""

    def __init__(self, weight_adv: float = 0.01):
        super().__init__(weight_adv=weight_adv)

    def __call__(self, x=None, x_net=None, D=None, **kwargs):
        return self.adversarial_loss(x, x_net, D)


class SupAdversarialDiscriminatorLoss(DiscriminatorLoss):
    """Supervised discriminator loss; the reference halves this variant
    (consistency.py:81)."""

    def __call__(self, x=None, x_net=None, D=None, **kwargs):
        return self.adversarial_loss(x, x_net, D) * 0.5


class UnsupAdversarialGeneratorLoss(GeneratorLoss):
    """Unsupervised: discriminate measurements y vs re-measured y_hat
    (consistency.py:84)."""

    def __call__(self, y=None, x_net=None, physics=None, D=None, y_hat=None, **kwargs):
        if y_hat is None:
            y_hat = physics.A(x_net)
        return self.adversarial_loss(y, y_hat, D)


class UnsupAdversarialDiscriminatorLoss(DiscriminatorLoss):
    """Unsupervised discriminator loss (consistency.py:132)."""

    def __call__(self, y=None, x_net=None, physics=None, D=None, y_hat=None, **kwargs):
        if y_hat is None:
            y_hat = physics.A(x_net)
        return self.adversarial_loss(y, y_hat, D)


class UAIRGeneratorLoss(GeneratorLoss):
    r"""UAIR (Pajot et al.): adversarial measurement consistency +
    re-measurement cycle loss (uair.py:8)."""

    def __init__(self, weight_adv: float = 0.5, weight_mc: float = 1.0):
        super().__init__(weight_adv=weight_adv)
        self.weight_mc = weight_mc

    def __call__(self, y=None, x_net=None, physics=None, model=None, D=None, key=None, **kwargs):
        y_hat = physics.A(x_net)
        adv = self.adversarial_loss(y, y_hat, D)
        x_tilde = model(y_hat, physics)
        y_tilde = physics.A(x_tilde)
        mc = jnp.mean((y_tilde - y_hat) ** 2)
        return adv + self.weight_mc * mc
