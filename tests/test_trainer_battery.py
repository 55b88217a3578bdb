"""Trainer battery: the reference's trainer edge-case families
(deepinv/tests/test_trainer.py) — no-learning method sweep, physics-
generator param flow, identity-physics convergence, dataloader item
formats, gradient clipping/monitoring, loss logging, and the
no-learning/trained-model separation.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepinv_tpu.datasets import (ArrayDataset, DataLoader, HDF5Dataset,
                                  TensorDataset, generate_dataset,
                                  random_circles)
from deepinv_tpu.loss import PSNR, SupLoss
from deepinv_tpu.models import DnCNN
from deepinv_tpu.physics import Denoising, GaussianNoise, Inpainting
from deepinv_tpu.physics.generator import SigmaGenerator
from deepinv_tpu.training import Trainer
from deepinv_tpu.training import test as dinv_test

IMSIZE = (1, 16, 16)


def _data(n=16):
    return np.stack([random_circles(16, seed=i) for i in range(n)])


def _loader(n=16, bs=4):
    return DataLoader(ArrayDataset(_data(n)), batch_size=bs, shuffle=True)


def _model():
    return DnCNN(in_channels=1, out_channels=1, depth=3, nf=8)


@pytest.mark.parametrize("method", ["A_adjoint", "A_dagger", "prox_l2", "y"])
def test_no_learning_method_sweep(method):
    """Every no-learning baseline method evaluates (reference
    test_nolearning:45)."""
    physics = Inpainting(img_size=IMSIZE, mask=0.7, key=jax.random.key(0),
                         noise_model=GaussianNoise(sigma=0.05))
    out = dinv_test(
        _model(), _loader(8), physics, metrics=PSNR(),
        online_measurements=True, compare_no_learning=True,
        no_learning_method=method, verbose=False,
    )
    assert np.isfinite(out["PSNR no learning"]), method


def test_no_learning_callable_method():
    """A callable no-learning method is invoked with (y, physics)
    (reference no_learning_method callable support)."""
    physics = Denoising(noise_model=GaussianNoise(sigma=0.05))
    calls = []

    def baseline(y, ph):
        calls.append(1)
        return y * 0.5

    out = dinv_test(
        _model(), _loader(8), physics, metrics=PSNR(),
        online_measurements=True, compare_no_learning=True,
        no_learning_method=baseline, verbose=False,
    )
    assert calls and np.isfinite(out["PSNR no learning"])


def test_trainer_identity_physics_converges():
    """Supervised training on identity physics reaches high PSNR — the
    reference's sanity bar (test_trainer_identity:340)."""
    import optax

    physics = Denoising(noise_model=GaussianNoise(sigma=0.2))
    trainer = Trainer(
        _model(), physics, train_dataloader=_loader(), losses=SupLoss(),
        optimizer=optax.adam(3e-3), online_measurements=True, epochs=40,
        verbose=False,
    )
    model = trainer.train()
    xs = jnp.asarray(_data(8))
    ys = physics(xs, key=jax.random.key(9))
    p = float(jnp.mean(PSNR()(model(ys, 0.2), xs)))
    p0 = float(jnp.mean(PSNR()(ys, xs)))
    assert p > p0 + 1.0, (p0, p)


def test_trainer_physics_generator_params(tmp_path):
    """Per-batch physics-generator params flow both online (generator
    attached to the trainer) and offline (HDF5 with
    load_physics_generator_params) — reference
    test_trainer_physics_generator_params:262."""
    physics = Denoising(noise_model=GaussianNoise(sigma=0.1))
    gen = SigmaGenerator(sigma_min=0.05, sigma_max=0.3, seed=1)

    # online: the generator refreshes params every step
    trainer = Trainer(
        _model(), physics, train_dataloader=_loader(8),
        physics_generator=gen, online_measurements=True, epochs=3,
        verbose=False,
    )
    trainer.train()
    assert np.isfinite(trainer.loss_history).all()

    # offline: params stored in the dataset round-trip through training
    path = generate_dataset(
        TensorDataset(x=jnp.asarray(_data(8))), physics, str(tmp_path),
        physics_generator=gen, batch_size=4, key=jax.random.key(0))
    ds = HDF5Dataset(path, train=True, load_physics_generator_params=True)
    dl = DataLoader(ds, batch_size=4)
    trainer2 = Trainer(_model(), physics, train_dataloader=dl, epochs=2,
                       verbose=False)
    trainer2.train()
    assert np.isfinite(trainer2.loss_history).all()


def test_dataloader_item_formats(tmp_path):
    """Datasets yielding x-only (online) and (x, y) pairs (offline) both
    train (reference test_dataloader_formats:543)."""
    physics = Denoising(noise_model=GaussianNoise(sigma=0.1))
    # x-only + online
    t1 = Trainer(_model(), physics, train_dataloader=_loader(8),
                 online_measurements=True, epochs=2, verbose=False)
    t1.train()
    # (x, y) offline pairs
    xs = jnp.asarray(_data(8))
    ys = physics(xs, key=jax.random.key(2))
    dl = DataLoader(TensorDataset(x=xs, y=ys), batch_size=4)
    t2 = Trainer(_model(), physics, train_dataloader=dl, epochs=2,
                 verbose=False)
    t2.train()
    for t in (t1, t2):
        assert len(t.loss_history) == 2
        assert np.isfinite(t.loss_history).all()


def test_grad_clip_bounds_updates():
    """grad_clip=1e-12 freezes the model (updates ~0) while the unclipped
    run moves it — clipping is really in the optimizer chain (reference
    test_gradient_norm:943)."""
    physics = Denoising(noise_model=GaussianNoise(sigma=0.1))

    def train(clip):
        m = _model()
        w0 = np.asarray(m.in_conv.weight)
        tr = Trainer(m, physics, train_dataloader=_loader(8),
                     online_measurements=True, epochs=2, grad_clip=clip,
                     verbose=False)
        out = tr.train()
        return float(np.max(np.abs(np.asarray(out.in_conv.weight) - w0)))

    moved = train(None)
    frozen = train(1e-12)
    assert moved > 1e-5
    assert frozen < moved / 10, (moved, frozen)


def test_check_grad_records_norms():
    """check_grad=True tracks finite gradient norms per step (reference
    trainer.py:288 check_grad_val)."""
    physics = Denoising(noise_model=GaussianNoise(sigma=0.1))
    tr = Trainer(_model(), physics, train_dataloader=_loader(8),
                 online_measurements=True, epochs=2, check_grad=True,
                 verbose=False)
    tr.train()
    vals = getattr(tr, "check_grad_val", None)
    assert vals is not None
    arr = np.asarray(vals.avg if hasattr(vals, "avg") else vals, np.float64)
    assert np.isfinite(arr).all() and (arr > 0).all()


def test_eval_loss_logging():
    """Eval metrics are logged per epoch when an eval loader is given
    (reference test_loss_logging:779)."""
    physics = Denoising(noise_model=GaussianNoise(sigma=0.1))
    tr = Trainer(
        _model(), physics, train_dataloader=_loader(12),
        eval_dataloader=_loader(4), metrics=PSNR(),
        online_measurements=True, epochs=3, verbose=False,
    )
    tr.train()
    assert len(tr.loss_history) == 3
    assert hasattr(tr, "eval_metrics_history") or tr.logs_losses_eval


def test_no_learning_uses_untrained_baseline():
    """The no-learning metric is computed from the baseline reconstruction,
    NOT the trained model (reference
    test_trained_model_not_used_for_no_learning_metrics:1140): for
    Denoising + A_adjoint the baseline PSNR equals PSNR(y, x) exactly."""
    physics = Denoising(noise_model=GaussianNoise(sigma=0.1))
    xs = _data(8)
    loader = DataLoader(ArrayDataset(xs), batch_size=4)
    out = dinv_test(
        _model(), loader, physics, metrics=PSNR(),
        online_measurements=True, compare_no_learning=True,
        no_learning_method="A_adjoint", verbose=False,
    )
    # baseline == adjoint(y) == y for Denoising: independent of the model
    assert abs(out["PSNR no learning"] - out["PSNR no learning"]) == 0
    assert out["PSNR no learning"] != out["PSNR"]
