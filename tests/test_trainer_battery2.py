"""Trainer battery wave 2: the reference's remaining trainer test ideas —
get_samples matrix (reference test_trainer.py:122), model-forward-pass
counting (:867), early-stop patience (:686), checkpoint cadence, loss
logging names (:779).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from deepinv_tpu.core import Module
from deepinv_tpu.datasets import DataLoader, TensorDataset
from deepinv_tpu.loss import SupLoss
from deepinv_tpu.physics import BlurFFT, GaussianNoise, Inpainting
from deepinv_tpu.physics.generator import (DiffractionBlurGenerator,
                                           SigmaGenerator)
from deepinv_tpu.training import Trainer

IMSIZE = (1, 16, 16)


def _data(n=4, key=0):
    return TensorDataset(x=jax.random.uniform(jax.random.key(key), (n, *IMSIZE)))


class TinyModel(Module):
    """One learnable conv; signature model(y, physics)."""

    def __init__(self, key=None):
        self.w = 0.1 * jax.random.normal(key or jax.random.key(9), (3, 3))

    def __call__(self, y, physics=None, **kwargs):
        k = self.w[None, None]
        return jax.lax.conv_general_dilated(y, k, (1, 1), "SAME") + y


def _trainer(**kw):
    kw.setdefault("model", TinyModel())
    kw.setdefault("optimizer", optax.adam(1e-3))
    kw.setdefault("epochs", 1)
    kw.setdefault("verbose", False)
    kw.setdefault("show_progress_bar", False)
    kw.setdefault("losses", SupLoss())
    return Trainer(**kw)


# ----------------------------------------------------------- get_samples --
@pytest.mark.parametrize("physics_type", ["blur", "inpainting"])
@pytest.mark.parametrize("gen_kind", [None, "param", "noise", "param+noise"])
def test_get_samples_online_matrix(physics_type, gen_kind):
    """Reference :122: online sampling draws fresh measurements and feeds
    generator parameters into the physics."""
    if physics_type == "blur":
        physics = BlurFFT(img_size=IMSIZE, filter=jnp.ones((1, 1, 3, 3)) / 9,
                          noise_model=GaussianNoise(0.1))
        pgen = DiffractionBlurGenerator(psf_size=(5, 5))
        pname = "filter"
    else:
        physics = Inpainting(img_size=IMSIZE, mask=0.3, key=jax.random.key(0),
                             noise_model=GaussianNoise(0.1))
        pgen = None  # mask generators emit (B,1,H,W); use noise-only here
        pname = "mask"
    ngen = SigmaGenerator()
    gen = {None: None, "param": pgen, "noise": ngen,
           "param+noise": (pgen + ngen) if pgen else ngen}[gen_kind]
    if gen_kind in ("param", "param+noise") and pgen is None:
        pytest.skip("param generator not applicable")

    tr = _trainer(physics=physics, online_measurements=True,
                  physics_generator=gen,
                  train_dataloader=DataLoader(_data(), batch_size=2))
    batch = jax.random.uniform(jax.random.key(1), (2, *IMSIZE))
    x, y, phys_used = tr.get_samples((batch,), physics, jax.random.key(2))
    assert x.shape == (2, *IMSIZE) and y.shape[0] == 2
    # fresh keys -> fresh measurements
    _, y2, _ = tr.get_samples((batch,), physics, jax.random.key(3))
    assert not np.allclose(np.asarray(y), np.asarray(y2))
    if gen_kind in ("param", "param+noise"):
        base = np.asarray(getattr(physics, pname))
        used = np.asarray(getattr(phys_used, pname))
        assert used.shape[0] == 2 or not np.allclose(base, used)
    if gen_kind in ("noise", "param+noise"):
        sig = np.asarray(phys_used.noise_model.sigma)
        assert sig.shape == (2,) or sig.size == 2


def test_get_samples_offline_params_roundtrip():
    physics = Inpainting(img_size=IMSIZE, mask=0.3, key=jax.random.key(0))
    tr = _trainer(physics=physics, online_measurements=False,
                  train_dataloader=DataLoader(_data(), batch_size=2))
    x = jax.random.uniform(jax.random.key(1), (2, *IMSIZE))
    mask = (jax.random.uniform(jax.random.key(2), (2, *IMSIZE)) < 0.5
            ).astype(jnp.float32)
    y = x * mask
    xo, yo, phys = tr.get_samples((x, y, {"mask": mask}), physics,
                                  jax.random.key(3))
    np.testing.assert_array_equal(np.asarray(phys.mask), np.asarray(mask))
    # measurement consistency with the per-batch mask
    np.testing.assert_allclose(np.asarray(phys.A(xo)), np.asarray(yo),
                               atol=1e-6)


def test_get_samples_offline_rejects_bare_x():
    physics = Inpainting(img_size=IMSIZE, mask=0.3, key=jax.random.key(0))
    tr = _trainer(physics=physics, online_measurements=False,
                  train_dataloader=DataLoader(_data(), batch_size=2))
    with pytest.raises(ValueError):
        tr.get_samples(jax.random.uniform(jax.random.key(1), (2, *IMSIZE)),
                       physics, jax.random.key(2))


# --------------------------------------------------- forward-pass counting --
@pytest.mark.parametrize("eval_interval", [1, 2])
def test_eval_interval_controls_eval_passes(eval_interval):
    """Reference :867: the eval loop runs every `eval_interval` epochs —
    visible as one eval_metrics_history record per eval epoch."""
    physics = Inpainting(img_size=IMSIZE, mask=0.5, key=jax.random.key(0),
                         noise_model=GaussianNoise(0.05))
    tr = _trainer(physics=physics,
                  online_measurements=True, epochs=4,
                  eval_interval=eval_interval,
                  train_dataloader=DataLoader(_data(8), batch_size=4),
                  eval_dataloader=DataLoader(_data(4, key=5), batch_size=4))
    tr.train()
    n_eval_epochs = len([e for e in range(4) if (e + 1) % eval_interval == 0])
    history = next(iter(tr.eval_metrics_history.values()))
    assert len(history) == n_eval_epochs


# -------------------------------------------------------------- early stop --
def test_early_stop_patience_stops_before_max_epochs():
    """Reference :686: with early_stop, a plateaued eval metric ends
    training long before `epochs`."""
    physics = Inpainting(img_size=IMSIZE, mask=0.5, key=jax.random.key(0),
                         noise_model=GaussianNoise(0.05))
    tr = _trainer(physics=physics, online_measurements=True, epochs=60,
                  early_stop=True, patience=2,
                  optimizer=optax.sgd(0.0),  # lr 0: metric can never improve
                  train_dataloader=DataLoader(_data(4), batch_size=4),
                  eval_dataloader=DataLoader(_data(4, key=5), batch_size=4))
    tr.train()
    assert tr.epochs_run < 60


def test_no_early_stop_runs_all_epochs():
    physics = Inpainting(img_size=IMSIZE, mask=0.5, key=jax.random.key(0),
                         noise_model=GaussianNoise(0.05))
    tr = _trainer(physics=physics, online_measurements=True, epochs=3,
                  train_dataloader=DataLoader(_data(4), batch_size=4))
    tr.train()
    assert tr.epochs_run == 3


# ------------------------------------------------------------- checkpoints --
def test_ckpt_interval_writes_expected_files(tmp_path):
    physics = Inpainting(img_size=IMSIZE, mask=0.5, key=jax.random.key(0),
                         noise_model=GaussianNoise(0.05))
    tr = _trainer(physics=physics, online_measurements=True, epochs=4,
                  save_path=str(tmp_path), ckpt_interval=2,
                  train_dataloader=DataLoader(_data(4), batch_size=4))
    tr.train()
    names = sorted(os.listdir(tmp_path))
    assert any(n.startswith("ckp_1") for n in names)
    assert any(n.startswith("ckp_3") for n in names)
    assert not any(n.startswith("ckp_0.") for n in names)


def test_checkpoint_resume_preserves_state(tmp_path):
    physics = Inpainting(img_size=IMSIZE, mask=0.5, key=jax.random.key(0),
                         noise_model=GaussianNoise(0.05))
    tr = _trainer(physics=physics, online_measurements=True, epochs=2,
                  save_path=str(tmp_path), ckpt_interval=1,
                  train_dataloader=DataLoader(_data(4), batch_size=4))
    model = tr.train()
    ckpt = os.path.join(str(tmp_path), "ckp_1.pkl")
    assert os.path.exists(ckpt)
    tr2 = _trainer(physics=physics, online_measurements=True, epochs=2,
                   train_dataloader=DataLoader(_data(4), batch_size=4))
    tr2.load_model(ckpt)
    a = jax.tree_util.tree_leaves(model)
    b = jax.tree_util.tree_leaves(tr2.model)
    for u, v in zip(a, b):
        np.testing.assert_allclose(np.asarray(u), np.asarray(v))


# ------------------------------------------------------------ loss logging --
def test_multi_loss_logging_names():
    """Reference :779: each loss logs under its own name."""
    from deepinv_tpu.loss import MCLoss

    physics = Inpainting(img_size=IMSIZE, mask=0.5, key=jax.random.key(0),
                         noise_model=GaussianNoise(0.05))
    tr = _trainer(physics=physics, online_measurements=True, epochs=1,
                  losses=[SupLoss(), MCLoss()],
                  train_dataloader=DataLoader(_data(4), batch_size=4))
    tr.train()
    names = [m.name for m in tr.logs_losses_train]
    assert names == ["SupLoss", "MCLoss"]
    for m in tr.logs_losses_train:
        assert m.count > 0 and np.isfinite(m.avg)
    assert tr.logs_total_loss_train.avg == pytest.approx(
        sum(m.avg for m in tr.logs_losses_train), rel=1e-5)


def test_gradient_clipping_matrix():
    """grad_clip bounds every update (reference :943)."""
    physics = Inpainting(img_size=IMSIZE, mask=0.5, key=jax.random.key(0),
                         noise_model=GaussianNoise(0.05))
    for clip in (1e-8, 1.0):
        m0 = TinyModel()
        tr = _trainer(model=m0, physics=physics, online_measurements=True,
                      epochs=1, grad_clip=clip,
                      optimizer=optax.sgd(1.0),
                      train_dataloader=DataLoader(_data(4), batch_size=4))
        m1 = tr.train()
        delta = float(jnp.abs(m1.w - m0.w).max())
        if clip == 1e-8:
            assert delta < 1e-6  # tiny clip freezes the weights
        else:
            assert delta > 1e-6
