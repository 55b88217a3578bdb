"""Adversarial trainer (reference deepinv/training/adversarial.py:88).

Alternating G/D optimization: two optax optimizers, one jitted step updating
both networks (the reference wraps two torch optimizers in
AdversarialOptimizer:19). Inherits the full :class:`Trainer` loop — epochs,
eval, checkpointing, early stopping — and overrides only the per-batch
:meth:`step`.
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
        self.reset_metrics()

    def reset_metrics(self):
        super().reset_metrics()
        self.logs_total_loss_d = AverageMeter("loss_D")
        self.check_grad_val_D = AverageMeter("grad_norm_D")

    def check_clip_grad_D(self, grad_norm=None):
        """Track the discriminator's gradient norm (reference
        adversarial.py check_clip_grad_D); clipping lives in the optax
        chain, as for the generator."""
        if grad_norm is not None and self.check_grad:
            self.check_grad_val_D.update(float(np.asarray(grad_norm)))
        return grad_norm

    def _build_train_step(self):
        optimizer = self.optimizer
        optimizer_d = self.optimizer_d
        losses_g = self._losses
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
            import optax

            (lg, x_net), g_grads = jax.value_and_grad(g_loss, has_aux=True)(
                model, D, x, y, physics, key
            )
            g_norm = optax.global_norm(g_grads)
            updates, opt_state = optimizer.update(g_grads, opt_state, model)
            model = jax.tree_util.tree_map(lambda a, b: a + b, model, updates)

            ld, d_grads = jax.value_and_grad(d_loss)(D, model, x, y, physics, key)
            d_norm = optax.global_norm(d_grads)
            updates_d, opt_state_d = optimizer_d.update(d_grads, opt_state_d, D)
            D = jax.tree_util.tree_map(lambda a, b: a + b, D, updates_d)
            return model, opt_state, D, opt_state_d, lg, ld, x_net, g_norm, d_norm

        return jax.jit(train_step)

    def step(self, epoch, progress_bar=None, train_ite=None, train: bool = True,
             last_batch: bool = False):
        """One G+D update per dataloader batch (reference adversarial.py
        step); eval batches fall back to the base implementation."""
        if not train:
            return super().step(
                epoch, progress_bar, train_ite=train_ite, train=False,
                last_batch=last_batch,
            )
        iterators = self.current_train_iterators
        G_perm = np.random.permutation(self.G)
        logs = {}
        x = y = x_net = physics_cur = None
        for g in G_perm:
            batch = next(iterators[g])
            physics_cur = self.physics[g % len(self.physics)]
            step_key = jax.random.fold_in(
                jax.random.fold_in(self._epoch_key, self._ite_in_epoch), int(g)
            )
            x, y, physics_cur = self.get_samples(batch, physics_cur, step_key)
            (
                self.model, self.opt_state, self.D, self.opt_state_d,
                lg, ld, x_net, g_norm, d_norm,
            ) = self._train_step_fn(
                self.model, self.opt_state, self.D, self.opt_state_d,
                x, y, physics_cur, step_key,
            )
            self.check_clip_grad(g_norm)
            self.check_clip_grad_D(d_norm)
            n = x.shape[0]
            self.logs_total_loss_train.update(float(np.asarray(lg)), n=n)
            self.logs_total_loss_d.update(float(np.asarray(ld)), n=n)
            logs["TotalLoss"] = self.logs_total_loss_train.avg
            logs["loss_D"] = self.logs_total_loss_d.avg
            if self.compute_train_metrics:
                x_net, logs = self.compute_metrics(
                    x, x_net, y, physics_cur, logs, train=True, epoch=epoch
                )
        if progress_bar is not None and hasattr(progress_bar, "set_postfix"):
            progress_bar.set_postfix(logs)
        self._ite_in_epoch += 1
        if last_batch:
            if self.verbose and not self.show_progress_bar:
                body = ", ".join(f"{k}={round(v, 5)}" for k, v in logs.items())
                print(f"Train epoch {epoch}: {body}")
            self.log_metrics_mlops(dict(logs, step=epoch), step=epoch)
            self.plot(epoch, physics_cur, x, y, x_net, train=True)
        return logs
