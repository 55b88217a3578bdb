"""Trainer battery wave 3 — the reference's forward-pass accounting matrix
(test_trainer.py:867 test_model_forward_passes), re-expressed for the
jitted-step JAX design: the reference counts model.forward calls; here the
model is traced once and executed via XLA, so the observable contract is
the number of Python-level ``step()`` invocations (train vs eval) and
batches consumed — verified per (epochs, eval_interval) combination, in
train() and in test().
"""

import jax.numpy as jnp
import numpy as np
import pytest

from deepinv_tpu.datasets import ArrayDataset, DataLoader
from deepinv_tpu.loss import SupLoss
from deepinv_tpu.physics import Denoising, GaussianNoise
from deepinv_tpu.training import Trainer


IMG = (1, 8, 8)


class CountingTrainer(Trainer):
    """Tallies Python-level step() (train) and test() (eval) invocations —
    the JAX design evaluates via test(), not step(train=False)."""

    def step(self, epoch, progress_bar=None, train_ite=None, train=True,
             last_batch=False):
        if not hasattr(self, "counts"):
            self.counts = {"train": 0, "eval_calls": 0}
        self.counts["train"] += 1
        return super().step(epoch, progress_bar=progress_bar,
                            train_ite=train_ite, train=train,
                            last_batch=last_batch)

    def test(self, dataloaders=None, train=False, key=None):
        if not hasattr(self, "counts"):
            self.counts = {"train": 0, "eval_calls": 0}
        self.counts["eval_calls"] += 1
        return super().test(dataloaders, train=train, key=key)


def _loaders(n_train=4, n_eval=2, batch=2):
    xs = jnp.linspace(0.0, 1.0, n_train * int(np.prod(IMG))).reshape(
        (n_train,) + IMG)
    xe = jnp.linspace(0.0, 1.0, n_eval * int(np.prod(IMG))).reshape(
        (n_eval,) + IMG)
    return (DataLoader(ArrayDataset(xs), batch_size=batch),
            DataLoader(ArrayDataset(xe), batch_size=batch))


def _trainer(train_loader, eval_loader, **kw):
    from deepinv_tpu.models import DnCNN

    model = DnCNN(in_channels=1, out_channels=1, depth=2, nf=4)
    return CountingTrainer(
        model=model,
        physics=Denoising(noise_model=GaussianNoise(0.05)),
        losses=SupLoss(),
        train_dataloader=train_loader,
        eval_dataloader=eval_loader,
        online_measurements=True,
        verbose=False,
        show_progress_bar=False,
        **kw,
    )


@pytest.mark.parametrize("epochs,eval_interval", [(1, 1), (2, 1), (4, 2)])
def test_step_invocation_counts(epochs, eval_interval):
    """train() invokes step(train=True) len(loader) times per epoch and
    step(train=False) len(eval_loader) times on every eval_interval-th
    epoch (reference test_model_forward_passes)."""
    train_loader, eval_loader = _loaders()
    t = _trainer(train_loader, eval_loader, epochs=epochs,
                 eval_interval=eval_interval)
    t.train()
    eval_epochs = sum(1 for e in range(epochs)
                      if (e + 1) % eval_interval == 0)
    assert t.counts["train"] == len(train_loader) * epochs
    assert t.counts["eval_calls"] == eval_epochs


def test_no_eval_loader_means_no_eval_steps():
    train_loader, _ = _loaders()
    t = _trainer(train_loader, None, epochs=2)
    t.train()
    assert t.counts["eval_calls"] == 0
    assert t.counts["train"] == 2 * len(train_loader)


def test_test_function_consumes_every_batch():
    """test() evaluates metrics over every batch of the given loaders and
    reports averages, with no training side effects (reference
    test_model_forward_passes tail: only eval-mode passes)."""
    train_loader, eval_loader = _loaders()
    t = _trainer(train_loader, eval_loader, epochs=0)
    before = getattr(t, "counts", {"train": 0}).get("train", 0)
    res = t.test(eval_loader)
    assert isinstance(res, dict) and len(res) > 0
    for k, v in res.items():
        assert np.isfinite(v), (k, v)
    assert getattr(t, "counts", {"train": 0}).get("train", 0) == before


def test_eval_interval_skips_intermediate_epochs():
    """eval_interval=3 with 3 epochs evaluates exactly once, at epoch 3."""
    train_loader, eval_loader = _loaders()
    t = _trainer(train_loader, eval_loader, epochs=3, eval_interval=3)
    t.train()
    assert t.counts["eval_calls"] == 1
