"""Trainer (reference deepinv/training/trainer.py:26, ~1.5k LoC).

Feature parity with the reference dataclass Trainer:

- multi-dataloader round-robin with per-epoch random permutation
  (trainer.py:996-1061);
- online measurement generation ``y = physics(x, key)`` with optional
  physics-generator resampling and *per-epoch key reset* reproducing
  ``loop_random_online_physics`` semantics (trainer.py:1352-1358) — the same
  measurements are drawn each epoch when ``loop_random_online_physics=True``;
- offline (pre-generated HDF5) measurements with physics param updates;
- loss lists with AverageMeter aggregation, metric train/eval histories;
- gradient clipping, early stopping, best-model tracking, checkpointing
  (orbax), no-learning baseline comparison (trainer.py:941).

JAX design: one jitted ``train_step(model, opt_state, batch, key)`` per
(loss-set, physics structure); the optimizer is optax; the model is a pytree
so grads/updates are plain tree ops. Host Python only moves batches and
bookkeeping — the hot path is a single XLA program.
"""

from __future__ import annotations

import os
import pickle
import time
from typing import Callable, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..core import Module, is_array
from ..core.rng import ensure_key
from ..loss import SupLoss, PSNR
from ..utils.logger import AverageMeter

__all__ = ["Trainer", "test"]


def _to_list(v):
    if v is None:
        return []
    return list(v) if isinstance(v, (list, tuple)) else [v]


class Trainer:
    """Train a reconstruction model (reference trainer.py:26).

    :param model: reconstructor ``model(y, physics)`` (pytree Module).
    :param physics: physics or list of physics (round-robin with loaders).
    :param optimizer: optax optimizer (default adam(1e-3)).
    :param train_dataloader: loader or list of loaders yielding x (online) or
        (x, y) / (x, y, params) (offline).
    :param losses: loss or list (default supervised).
    :param metrics: metric or list (default PSNR).
    :param online_measurements: generate y on the fly with physics + key.
    :param physics_generator: optional generator with ``step(n, key)->dict``.
    :param loop_random_online_physics: redraw the same measurement keys every
        epoch (reference trainer.py:1352).
    :param epochs, grad_clip, early_stop, patience: training control.

    :Examples:

        Two-epoch supervised denoiser training with online measurements:

        >>> import numpy as np, optax
        >>> from deepinv_tpu.training import Trainer
        >>> from deepinv_tpu.models import DnCNN, ArtifactRemoval
        >>> from deepinv_tpu.physics import Denoising, GaussianNoise
        >>> from deepinv_tpu.datasets import ArrayDataset, DataLoader
        >>> xs = np.random.default_rng(0).random((8, 1, 16, 16)).astype("float32")
        >>> trainer = Trainer(
        ...     model=ArtifactRemoval(DnCNN(1, 1, depth=2, nf=8)),
        ...     physics=Denoising(noise_model=GaussianNoise(0.1)),
        ...     optimizer=optax.adam(1e-3),
        ...     train_dataloader=DataLoader(ArrayDataset(xs), batch_size=4),
        ...     epochs=2, online_measurements=True,
        ...     verbose=False, show_progress_bar=False)
        >>> model = trainer.train()
        >>> len(trainer.loss_history) > 0
        True

    :param save_path: checkpoint directory (pickled numpy trees).
    :param eval_dataloader: optional eval loader(s).
    :param ckpt_interval: save every N epochs.
    """

    def __init__(
        self,
        model,
        physics,
        optimizer=None,
        train_dataloader=None,
        eval_dataloader=None,
        losses=None,
        metrics=None,
        epochs: int = 100,
        online_measurements: bool = False,
        physics_generator=None,
        loop_random_online_physics: bool = False,
        grad_clip: Optional[float] = None,
        early_stop: bool = False,
        patience: int = 5,
        save_path: Optional[str] = None,
        ckpt_interval: int = 1,
        ckpt_backend: str = "pickle",
        compare_no_learning: bool = False,
        no_learning_method: str = "A_adjoint",
        verbose: bool = True,
        show_progress_bar: bool = False,
        wandb_vis: bool = False,
        wandb_setup: dict = None,
        mlflow_vis: bool = False,
        mlflow_setup: dict = None,
        data_parallel: bool = False,
        seed: int = 0,
    ):
        import optax

        self.model = model
        self.physics = _to_list(physics)
        self.optimizer = optimizer if optimizer is not None else optax.adam(1e-3)
        if grad_clip is not None:
            self.optimizer = optax.chain(
                optax.clip_by_global_norm(grad_clip), self.optimizer
            )
        self.train_dataloader = _to_list(train_dataloader)
        self.eval_dataloader = _to_list(eval_dataloader)
        self.losses = _to_list(losses) if losses is not None else [SupLoss()]
        self.metrics = _to_list(metrics) if metrics is not None else [PSNR()]
        self.epochs = epochs
        self.online_measurements = online_measurements
        self.physics_generator = physics_generator
        self.loop_random_online_physics = loop_random_online_physics
        self.early_stop = early_stop
        self.patience = patience
        self.save_path = save_path
        self.ckpt_interval = ckpt_interval
        if ckpt_backend not in ("pickle", "orbax"):
            raise ValueError("ckpt_backend must be 'pickle' or 'orbax'")
        self.ckpt_backend = ckpt_backend
        self._orbax = None
        self.compare_no_learning = compare_no_learning
        self.no_learning_method = no_learning_method
        self.verbose = verbose
        self.seed = seed
        # data-parallel over all devices (reference: DataParallel/DDP story,
        # docs/user_guide/training/multigpu.rst): batches are sharded over a
        # "dp" mesh axis, parameters replicated; XLA inserts the gradient
        # psum automatically from the sharding propagation.
        self._dp_sharding = None
        self._repl_sharding = None
        if data_parallel and len(jax.devices()) > 1:
            from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

            mesh = Mesh(np.array(jax.devices()), ("dp",))
            self._dp_sharding = NamedSharding(mesh, P("dp"))
            self._repl_sharding = NamedSharding(mesh, P())

        # adapt model through losses (e.g. splitting)
        for l in self.losses:
            if hasattr(l, "adapt_model"):
                self.model = l.adapt_model(self.model)

        self.opt_state = self.optimizer.init(self.model)
        self.epoch_start = 0
        # optional MLOps logging (reference trainer.py:43-44,604): gated on
        # package availability (neither ships in this environment)
        self._wandb = None
        self._mlflow = None
        if wandb_vis:
            try:
                import wandb

                self._wandb = wandb
                wandb.init(**(wandb_setup or {}))
            except ImportError:
                print("wandb not available; disabling wandb logging")
        if mlflow_vis:
            try:
                import mlflow

                self._mlflow = mlflow
                mlflow.start_run(**(mlflow_setup or {}))
            except ImportError:
                print("mlflow not available; disabling mlflow logging")
        self.loss_history = []
        self.eval_metrics_history = {}
        self.best_metric = None
        self.best_model = None
        self._train_step_fn = None
        # jitted helpers: eager physics/metric evaluation is not supported on
        # all TPU runtimes (reductions/FFT outside jit), and jit also caches
        # the compiled program across steps
        self._measure_fn = None
        self._metric_fns = None
        self._nl_fn = None

    def _measure(self, physics, x, key):
        if self._measure_fn is None:
            self._measure_fn = jax.jit(lambda p, xv, k: p(xv, key=k))
        return self._measure_fn(physics, x, key)

    def _metric_value(self, i, x_net, x) -> float:
        if self._metric_fns is None:
            self._metric_fns = [
                jax.jit(lambda a, b, m=m: jnp.mean(m(a, b))) for m in self.metrics
            ]
        return float(np.asarray(self._metric_fns[i](x_net, x)))

    # -- overridable hooks (reference trainer.py:788,823) -------------------
    def model_inference(self, y, physics, model=None, train: bool = False,
                        key=None):
        """Reconstruct ``x_net = model(y, physics)`` (reference
        trainer.py:788). In train mode, loss-adapted models (e.g.
        ``SplittingModel``) draw their split from ``key``. Jax-traceable —
        safe to override with any functional computation."""
        model = self.model if model is None else model
        if train and getattr(model, "train_aware", False):
            return model(y, physics, train=True, key=key)
        return model(y, physics)

    def compute_loss(self, model, x, y, physics, key=None):
        """Total training loss + reconstruction ``(loss, x_net)``
        (reference trainer.py:823). The jitted train step differentiates
        THIS method with ``jax.value_and_grad``, so subclass overrides take
        effect — backward/step happen outside, in the optimizer update (the
        reference's ``loss.backward()`` has no functional analogue).
        Must stay jax-traceable (no Python side effects on traced values).
        """
        x_net = self.model_inference(
            y, physics, model=model, train=True,
            key=jax.random.fold_in(key, 0x7FFFFFFF) if key is not None else None,
        )
        total = 0.0
        for i, l in enumerate(self.losses):
            li = l(
                x_net=x_net, x=x, y=y, physics=physics, model=model,
                key=jax.random.fold_in(key, i) if key is not None else None,
            )
            total = total + jnp.mean(li)
        return total, x_net

    # -- jitted step ------------------------------------------------------
    def _build_train_step(self):
        optimizer = self.optimizer

        def train_step(model, opt_state, x, y, physics, key):
            (loss, x_net), grads = jax.value_and_grad(
                self.compute_loss, has_aux=True
            )(model, x, y, physics, key)
            updates, opt_state = optimizer.update(grads, opt_state, model)
            model = jax.tree_util.tree_map(
                lambda m, u: m + u, model, updates
            )
            return model, opt_state, loss, x_net

        return jax.jit(train_step)

    # -- sample handling --------------------------------------------------
    def get_samples_online(self, batch, physics, key):
        """Draw fresh measurements ``y = physics(x)`` each step, resampling
        generator parameters (reference trainer.py:656)."""
        x = jnp.asarray(batch[0] if isinstance(batch, (tuple, list)) else batch)
        kg, kn = jax.random.split(key)
        if self.physics_generator is not None:
            params = self.physics_generator.step(x.shape[0], key=kg)
            physics = physics.update(**params)
        y = self._measure(physics, x, kn)
        return x, y, physics

    def get_samples_offline(self, batch, physics):
        """Read stored ``(x, y[, params])`` pairs, e.g. from
        :class:`HDF5Dataset` (reference trainer.py:703)."""
        if not isinstance(batch, (tuple, list)) or len(batch) < 2:
            raise ValueError(
                "offline training requires (x, y) or (x, y, params) batches"
            )
        x = jnp.asarray(batch[0])
        y = jnp.asarray(batch[1])
        if len(batch) > 2 and isinstance(batch[2], dict):
            physics = physics.update(
                **{k: jnp.asarray(v) for k, v in batch[2].items()}
            )
        return x, y, physics

    def get_samples(self, batch, physics, key):
        """Normalize a batch to (x, y, physics) (reference trainer.py:766)."""
        if self.online_measurements:
            return self.get_samples_online(batch, physics, key)
        return self.get_samples_offline(batch, physics)

    # -- training loop ----------------------------------------------------
    def train(self):
        if self._train_step_fn is None:
            self._train_step_fn = self._build_train_step()
        base_key = ensure_key(None, self.seed)
        no_improve = 0

        for epoch in range(self.epoch_start, self.epochs):
            # per-epoch key: resets measurement draws if requested
            if self.loop_random_online_physics:
                epoch_key = jax.random.fold_in(base_key, 0)
            else:
                epoch_key = jax.random.fold_in(base_key, epoch)

            loss_meter = AverageMeter("loss")
            metric_meters = [AverageMeter(type(m).__name__) for m in self.metrics]

            iters = [iter(dl) for dl in self.train_dataloader]
            counts = [len(dl) for dl in self.train_dataloader]
            # round-robin with random permutation (reference trainer.py:1021)
            order = np.concatenate([np.full(c, g) for g, c in enumerate(counts)])
            np.random.RandomState(self.seed + epoch).shuffle(order)

            for step, g in enumerate(order):
                batch = next(iters[g])
                physics = self.physics[g % len(self.physics)]
                step_key = jax.random.fold_in(epoch_key, step)
                x, y, cur_physics = self.get_samples(batch, physics, step_key)
                if self._dp_sharding is not None:
                    x = jax.device_put(x, self._dp_sharding)
                    y = jax.device_put(y, self._dp_sharding)
                    self.model = jax.device_put(self.model, self._repl_sharding)
                self.model, self.opt_state, loss, x_net = self._train_step_fn(
                    self.model, self.opt_state, x, y, cur_physics, step_key
                )
                loss_meter.update(float(np.asarray(loss)), n=x.shape[0])
                for i, meter in enumerate(metric_meters):
                    meter.update(self._metric_value(i, x_net, x), n=x.shape[0])

            self.loss_history.append(loss_meter.avg)
            self.log_metrics_mlops(
                {"loss": loss_meter.avg, **{m.name: m.avg for m in metric_meters}},
                step=epoch,
            )
            if self.verbose:
                msg = f"epoch {epoch}: loss {loss_meter.avg:.5g}"
                for meter in metric_meters:
                    msg += f"  {meter.name} {meter.avg:.4g}"
                print(msg)

            # eval + best tracking + early stop
            if self.eval_dataloader:
                eval_metrics = self.test(self.eval_dataloader, train=False)
                first = list(eval_metrics.values())[0]
                for k, v in eval_metrics.items():
                    self.eval_metrics_history.setdefault(k, []).append(v)
                higher_better = not getattr(self.metrics[0], "lower_better", True)
                improved = (
                    self.best_metric is None
                    or (first > self.best_metric if higher_better else first < self.best_metric)
                )
                if improved:
                    self.best_metric = first
                    self.best_model = self.model
                    no_improve = 0
                    if self.save_path:
                        self.save_model(os.path.join(self.save_path, "ckp_best.pkl"), epoch)
                else:
                    no_improve += 1
                if self.early_stop and no_improve >= self.patience:
                    if self.verbose:
                        print(f"early stopping at epoch {epoch}")
                    break

            if self.save_path and (epoch + 1) % self.ckpt_interval == 0:
                self.save_model(os.path.join(self.save_path, f"ckp_{epoch}.pkl"), epoch)

        return self.model

    # -- evaluation -------------------------------------------------------
    def test(self, dataloaders=None, train: bool = False, key=None):
        """Evaluate metrics over loaders (reference trainer.py:1488).

        Returns dict metric_name -> average (plus _std entries).
        """
        dataloaders = _to_list(dataloaders) if dataloaders is not None else self.eval_dataloader
        key = ensure_key(key, self.seed + 10_000)
        meters = {type(m).__name__: AverageMeter() for m in self.metrics}
        if self.compare_no_learning:
            nl_meters = {type(m).__name__: AverageMeter() for m in self.metrics}

        if getattr(self.model, "train_aware", False):
            # eval mode: SplittingModel MC-averages its eval_n_samples splits
            infer = jax.jit(
                lambda model, y, p, k=key: model(y, p, key=k, train=False)
            )
        else:
            infer = jax.jit(lambda model, y, p: model(y, p))
        for g, dl in enumerate(dataloaders):
            physics = self.physics[g % len(self.physics)]
            for step, batch in enumerate(dl):
                x, y, cur_physics = self.get_samples(
                    batch, physics, jax.random.fold_in(key, step)
                )
                x_net = infer(self.model, y, cur_physics)
                for i, m in enumerate(self.metrics):
                    meters[type(m).__name__].update(
                        self._metric_value(i, x_net, x), n=x.shape[0]
                    )
                if self.compare_no_learning:
                    if self._nl_fn is None:
                        self._nl_fn = jax.jit(
                            lambda yv, p: self.no_learning_inference(yv, p)
                        )
                    x_nl = self._nl_fn(y, cur_physics)
                    for i, m in enumerate(self.metrics):
                        nl_meters[type(m).__name__].update(
                            self._metric_value(i, x_nl, x), n=x.shape[0]
                        )
        out = {}
        for name, meter in meters.items():
            out[name] = meter.avg
            out[name + "_std"] = meter.std
        if self.compare_no_learning:
            for name, meter in nl_meters.items():
                out[name + "_no_learning"] = meter.avg
        return out

    def no_learning_inference(self, y, physics):
        """Baseline reconstruction (reference trainer.py:941)."""
        m = self.no_learning_method
        if m == "A_adjoint":
            return physics.A_adjoint(y)
        if m == "A_dagger":
            return physics.A_dagger(y)
        if m == "prox_l2":
            return physics.prox_l2(physics.A_adjoint(y), y, 1.0)
        return y

    def log_metrics_mlops(self, metrics: dict, step: int = 0):
        """Push metrics to wandb/mlflow when enabled (trainer.py:604)."""
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)
        if self._mlflow is not None:
            for k, v in metrics.items():
                self._mlflow.log_metric(k, v, step=step)

    # -- checkpointing ----------------------------------------------------
    def _orbax_mgr(self, path):
        if self._orbax is None:
            from .checkpoint import OrbaxCheckpointer

            # all steps live in one manager directory: <save_path>/orbax
            # (pickle-style per-epoch filenames map onto orbax step numbers)
            d = path if os.path.splitext(path)[1] == "" else os.path.dirname(path) or "."
            self._orbax = OrbaxCheckpointer(os.path.join(d, "orbax"))
        return self._orbax

    def save_model(self, path: str, epoch: int = 0):
        """Save epoch, model, optimizer state and histories
        (reference trainer.py:1167). With ``ckpt_backend='orbax'`` the state
        is written asynchronously via Orbax (overlaps the next epoch)."""
        if self.ckpt_backend == "orbax":
            self._orbax_mgr(path).save(
                epoch, self.model, self.opt_state,
                extra={"loss_history": np.asarray(self.loss_history, np.float32)},
            )
            return
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        payload = {
            "epoch": epoch,
            "model": jax.tree_util.tree_map(np.asarray, self.model),
            "opt_state": jax.tree_util.tree_map(
                lambda v: np.asarray(v) if is_array(v) else v, self.opt_state
            ),
            "loss_history": self.loss_history,
            "eval_metrics_history": self.eval_metrics_history,
        }
        with open(path, "wb") as f:
            pickle.dump(payload, f)

    def load_model(self, path: str):
        """Restore a checkpoint (reference trainer.py:562)."""
        if self.ckpt_backend == "orbax":
            mgr = self._orbax_mgr(path)
            self.model, self.opt_state, extra, step = mgr.restore(
                self.model, self.opt_state
            )
            self.epoch_start = step + 1
            if "loss_history" in extra:
                self.loss_history = list(np.asarray(extra["loss_history"]))
            return self
        with open(path, "rb") as f:
            payload = pickle.load(f)
        self.model = jax.tree_util.tree_map(jnp.asarray, payload["model"])
        self.opt_state = jax.tree_util.tree_map(
            lambda v: jnp.asarray(v) if isinstance(v, np.ndarray) else v,
            payload["opt_state"],
        )
        self.epoch_start = payload["epoch"] + 1
        self.loss_history = payload["loss_history"]
        self.eval_metrics_history = payload.get("eval_metrics_history", {})
        return self

    def save_best_model(self):
        """Write the best-so-far model to ``save_path/ckp_best.pkl``
        (reference trainer.py:1233; called automatically during train)."""
        if not self.save_path:
            raise ValueError("save_best_model requires save_path")
        if self.best_model is not None:
            model, self.model = self.model, self.best_model
            try:
                self.save_model(os.path.join(self.save_path, "ckp_best.pkl"))
            finally:
                self.model = model

    def load_best_model(self):
        """Restore the best model tracked during training — in memory if
        available, else from ``save_path/ckp_best.pkl`` (reference
        trainer.py:1269)."""
        if self.best_model is not None:
            self.model = self.best_model
            return self
        if self.save_path:
            path = os.path.join(self.save_path, "ckp_best.pkl")
            if os.path.exists(path):
                return self.load_model(path)
        raise ValueError("no best model tracked (train with eval_dataloader)")


def test(model, test_dataloader, physics, metrics=None, online_measurements=False, physics_generator=None, **kwargs):
    """Standalone evaluation (reference testing.py:5)."""
    trainer = Trainer(
        model,
        physics,
        train_dataloader=None,
        metrics=metrics,
        online_measurements=online_measurements,
        physics_generator=physics_generator,
        verbose=False,
        **kwargs,
    )
    return trainer.test(_to_list(test_dataloader))
