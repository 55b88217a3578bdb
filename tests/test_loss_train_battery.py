"""Trainer x loss sweep: the reference's universal "train with each loss and
the model improves" family (deepinv/tests/test_loss.py test_losses:349 and
test_loss_train.py), sized for the CPU CI gate.

Each configuration trains a tiny DnCNN for a few epochs through the real
Trainer loop (jitted train step, online measurements) and asserts the
training loss decreases; the supervised and measurement-consistency configs
additionally assert eval PSNR improves over the untrained model.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepinv_tpu.datasets import ArrayDataset, DataLoader, random_circles
from deepinv_tpu.loss import (EILoss, MCLoss, MOILoss, Neighbor2Neighbor,
                              PSNR, R2RLoss, SplittingLoss, SupLoss,
                              SureGaussianLoss, TVLoss)
from deepinv_tpu.models import DnCNN
from deepinv_tpu.physics import Denoising, GaussianNoise, Inpainting
from deepinv_tpu.training import Trainer
from deepinv_tpu.training import test as dinv_test
from deepinv_tpu.transform import Shift

IMSIZE = (1, 16, 16)


def _data(n=16):
    return np.stack([random_circles(16, seed=i) for i in range(n)])


def _loader():
    return DataLoader(ArrayDataset(_data()), batch_size=4, shuffle=True)


def _model():
    return DnCNN(in_channels=1, out_channels=1, depth=3, nf=8)


def _choose(name):
    """(losses, physics) per configuration — reference choose_loss:107."""
    den = Denoising(noise_model=GaussianNoise(0.1))
    inp = Inpainting(img_size=IMSIZE, mask=0.7, key=jax.random.key(0),
                     noise_model=GaussianNoise(0.05))
    return {
        "sup": (SupLoss(), den),
        "sure": (SureGaussianLoss(sigma=0.1), den),
        "r2r": (R2RLoss(sigma=0.1), den),
        "mcei": ([MCLoss(), EILoss(Shift(n_trans=1))], inp),
        "splitting": (SplittingLoss(split_ratio=0.8), inp),
        "n2n": (Neighbor2Neighbor(), den),
        "sup-tv": ([SupLoss(), TVLoss(weight=1e-4)], den),
    }[name]


@pytest.mark.parametrize("loss_name", [
    "sup", "sure", "r2r", "mcei", "splitting", "n2n", "sup-tv",
])
def test_loss_training_sweep(loss_name):
    """Training loss decreases under every loss family (reference
    test_losses:349 asserts trained > untrained; loss-decrease is the
    stable CPU-budget equivalent, plus PSNR for the strongest configs)."""
    losses, physics = _choose(loss_name)
    trainer = Trainer(
        _model(), physics, train_dataloader=_loader(), losses=losses,
        online_measurements=True, epochs=10, verbose=False,
    )
    model = trainer.train()
    h = trainer.loss_history
    assert len(h) == 10
    assert np.isfinite(h).all(), (loss_name, h)
    assert h[-1] < h[0], (loss_name, h[0], h[-1])

    if loss_name in ("sup", "sure"):
        # strongest configs: trained model beats the untrained one on PSNR
        untrained = _model()
        xs = jnp.asarray(_data(8))
        key = jax.random.key(3)
        ys = physics(xs, key=key)
        psnr = PSNR()
        p0 = float(jnp.mean(psnr(untrained(ys, 0.1), xs)))
        p1 = float(jnp.mean(psnr(model(ys, 0.1), xs)))
        assert p1 > p0, (loss_name, p0, p1)


def test_moi_loss_training():
    """Multi-operator imaging loss trains across a physics LIST (reference
    test_losses moi family): loss decreases and the step rotates
    operators."""
    phys = [
        Inpainting(img_size=IMSIZE, mask=0.6, key=jax.random.key(1),
                   noise_model=GaussianNoise(0.05)),
        Inpainting(img_size=IMSIZE, mask=0.8, key=jax.random.key(2),
                   noise_model=GaussianNoise(0.05)),
    ]
    trainer = Trainer(
        _model(), phys, train_dataloader=_loader(),
        losses=MOILoss(physics_list=phys), online_measurements=True,
        epochs=8, verbose=False,
    )
    trainer.train()
    h = trainer.loss_history
    assert np.isfinite(h).all() and h[-1] < h[0], h


def test_trainer_test_function_reports_both():
    """training.test returns PSNR for the model AND the no-learning
    baseline (reference test_notraining:331)."""
    physics = Denoising(noise_model=GaussianNoise(0.1))
    xs = _data(8)
    loader = DataLoader(ArrayDataset(xs), batch_size=4)
    out = dinv_test(
        _model(), loader, physics, metrics=PSNR(),
        online_measurements=True, compare_no_learning=True, verbose=False,
    )
    assert "PSNR" in out and "PSNR no learning" in out
    assert out["PSNR no learning"] == out["PSNR_no_learning"]
    assert np.isfinite(out["PSNR"])


@pytest.mark.parametrize("scheduler_kind", ["step", "random", "interleaved"])
def test_loss_schedulers_in_training(scheduler_kind):
    """Loss schedulers drive training without breaking the jitted step
    (reference test_loss_scheduler:755)."""
    from deepinv_tpu.loss import (InterleavedLossScheduler,
                                  RandomLossScheduler, StepLossScheduler)

    den = Denoising(noise_model=GaussianNoise(0.1))
    base = [SupLoss(), TVLoss(weight=1e-5)]
    sched = {
        "step": lambda: StepLossScheduler(base[1], epoch_thresh=2),
        "random": lambda: RandomLossScheduler(*base),
        "interleaved": lambda: InterleavedLossScheduler(*base),
    }[scheduler_kind]()
    losses = [base[0], sched] if scheduler_kind == "step" else sched
    trainer = Trainer(
        _model(), den, train_dataloader=_loader(), losses=losses,
        online_measurements=True, epochs=4, verbose=False,
    )
    trainer.train()
    assert np.isfinite(trainer.loss_history).all()
