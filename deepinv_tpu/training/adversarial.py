"""Adversarial trainer (reference deepinv/training/adversarial.py:88).

Alternating G/D optimization: two optax optimizers, one jitted step updating
both networks (the reference wraps two torch optimizers in
AdversarialOptimizer:19).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..core.rng import ensure_key
from ..loss.adversarial import (
    SupAdversarialGeneratorLoss,
    SupAdversarialDiscriminatorLoss,
)
from ..utils.logger import AverageMeter
from .trainer import Trainer, _to_list

__all__ = ["AdversarialTrainer", "AdversarialOptimizer"]


class AdversarialOptimizer:
    """Pair of optax optimizers for G and D (reference adversarial.py:19)."""

    def __init__(self, optimizer_g=None, optimizer_d=None):
        import optax

        self.g = optimizer_g if optimizer_g is not None else optax.adam(1e-4)
        self.d = optimizer_d if optimizer_d is not None else optax.adam(1e-4)


class AdversarialTrainer(Trainer):
    """Trainer with alternating generator/discriminator updates
    (reference adversarial.py:88)."""

    def __init__(
        self,
        model,
        physics,
        D=None,
        losses=None,
        losses_d=None,
        optimizer=None,
        optimizer_d=None,
        **kwargs,
    ):
        super().__init__(model, physics, optimizer=optimizer, losses=losses, **kwargs)
        if D is None:
            from ..models import PatchGANDiscriminator

            D = PatchGANDiscriminator()
        self.D = D
        self.losses_d = _to_list(losses_d) if losses_d is not None else [
            SupAdversarialDiscriminatorLoss()
        ]
        import optax

        self.optimizer_d = optimizer_d if optimizer_d is not None else optax.adam(1e-4)
        self.opt_state_d = self.optimizer_d.init(self.D)

    def _build_train_step(self):
        optimizer = self.optimizer
        optimizer_d = self.optimizer_d
        losses_g = self.losses
        losses_d = self.losses_d

        def g_loss(model, D, x, y, physics, key):
            x_net = model(y, physics)
            total = 0.0
            for i, l in enumerate(losses_g):
                li = l(
                    x_net=x_net, x=x, y=y, physics=physics, model=model, D=D,
                    key=jax.random.fold_in(key, i),
                )
                total = total + jnp.mean(li)
            return total, x_net

        def d_loss(D, model, x, y, physics, key):
            x_net = jax.lax.stop_gradient(model(y, physics))
            total = 0.0
            for i, l in enumerate(losses_d):
                li = l(
                    x_net=x_net, x=x, y=y, physics=physics, model=model, D=D,
                    key=jax.random.fold_in(key, 100 + i),
                )
                total = total + jnp.mean(li)
            return total

        def train_step(model, opt_state, D, opt_state_d, x, y, physics, key):
            (lg, x_net), g_grads = jax.value_and_grad(g_loss, has_aux=True)(
                model, D, x, y, physics, key
            )
            updates, opt_state = optimizer.update(g_grads, opt_state, model)
            model = jax.tree_util.tree_map(lambda a, b: a + b, model, updates)

            ld, d_grads = jax.value_and_grad(d_loss)(D, model, x, y, physics, key)
            updates_d, opt_state_d = optimizer_d.update(d_grads, opt_state_d, D)
            D = jax.tree_util.tree_map(lambda a, b: a + b, D, updates_d)
            return model, opt_state, D, opt_state_d, lg, ld, x_net

        return jax.jit(train_step)

    def train(self):
        step_fn = self._build_train_step()
        base_key = ensure_key(None, self.seed)

        for epoch in range(self.epoch_start, self.epochs):
            epoch_key = jax.random.fold_in(base_key, epoch)
            g_meter = AverageMeter("loss_G")
            d_meter = AverageMeter("loss_D")
            iters = [iter(dl) for dl in self.train_dataloader]
            counts = [len(dl) for dl in self.train_dataloader]
            order = np.concatenate([np.full(c, g) for g, c in enumerate(counts)])
            np.random.RandomState(self.seed + epoch).shuffle(order)

            for step, g in enumerate(order):
                batch = next(iters[g])
                physics = self.physics[g % len(self.physics)]
                step_key = jax.random.fold_in(epoch_key, step)
                x, y, cur_physics = self.get_samples(batch, physics, step_key)
                (
                    self.model, self.opt_state, self.D, self.opt_state_d,
                    lg, ld, x_net,
                ) = step_fn(
                    self.model, self.opt_state, self.D, self.opt_state_d,
                    x, y, cur_physics, step_key,
                )
                g_meter.update(float(lg), n=x.shape[0])
                d_meter.update(float(ld), n=x.shape[0])

            self.loss_history.append(g_meter.avg)
            if self.verbose:
                print(f"epoch {epoch}: G {g_meter.avg:.5g}  D {d_meter.avg:.5g}")
        return self.model
