"""Trainer (reference deepinv/training/trainer.py:26, ~1.5k LoC).

Feature parity with the reference dataclass Trainer:

- multi-dataloader training with the reference's per-step loader permutation
  (trainer.py:996-1061): every step draws one batch from *each* dataloader in
  random order, with either one optimizer step per dataset or a single step
  over the summed multi-dataset loss (``optimizer_step_multi_dataset``);
- online measurement generation ``y = physics(x, key)`` with optional
  physics-generator resampling and *per-epoch key reset* reproducing
  ``loop_random_online_physics`` semantics (trainer.py:1352-1358) — the same
  measurements are drawn each epoch when ``loop_random_online_physics=True``;
- offline (pre-generated HDF5) measurements with physics param updates;
- loss lists with AverageMeter aggregation, metric train/eval histories;
- the reference's documented customization hooks, all overridable:
  ``setup_train`` (trainer.py:330), ``check_clip_grad`` (:630),
  ``get_samples_*`` (:656,703), ``model_inference`` (:788), ``compute_loss``
  (:823), ``compute_metrics`` (:886), ``no_learning_inference`` (:941),
  ``step`` (:996), ``plot`` (:1090), ``reset_metrics`` (:1209),
  ``stop_criterion`` (:1287);
- gradient clipping + gradient-norm monitoring, early stopping, best-model
  tracking, checkpointing (pickle/orbax), no-learning baseline comparison.

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
    :param physics: physics or list of physics (paired with the loaders).
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
        ``early_stop`` accepts the reference's ``None | int`` (number of
        non-improving evals) or a bool (``True`` maps to ``patience``).
    :param optimizer_step_multi_dataset: if ``True`` (reference default,
        trainer.py:278) one optimizer step is taken on the summed loss over
        all dataloaders; if ``False``, one step per dataloader batch.
    :param compute_train_metrics: compute metrics on train batches
        (trainer.py:280).
    :param check_grad: track the gradient norm each step in
        ``check_grad_val`` (trainer.py:288).
    :param eval_interval: epochs between evaluations (trainer.py:294).
    :param plot_images, plot_interval, save_folder_im: reconstruction
        plotting controls (trainer.py:226,249).

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
        early_stop=False,
        patience: int = 5,
        optimizer_step_multi_dataset: bool = True,
        compute_train_metrics: bool = True,
        check_grad: bool = False,
        eval_interval: int = 1,
        plot_images: bool = False,
        plot_interval: int = 1,
        save_folder_im: Optional[str] = None,
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
        self.grad_clip = grad_clip
        self.optimizer = optimizer if optimizer is not None else optax.adam(1e-3)
        if grad_clip is not None:
            self.optimizer = optax.chain(
                optax.clip_by_global_norm(grad_clip), self.optimizer
            )
        self.train_dataloader = _to_list(train_dataloader)
        self.eval_dataloader = _to_list(eval_dataloader)
        self._losses = _to_list(losses) if losses is not None else [SupLoss()]
        self.metrics = _to_list(metrics) if metrics is not None else [PSNR()]
        self.epochs = epochs
        self.online_measurements = online_measurements
        self.physics_generator = physics_generator
        self.loop_random_online_physics = loop_random_online_physics
        # reference early_stop: None | int (#evals without improvement);
        # bool accepted for backwards compatibility (True -> patience)
        if isinstance(early_stop, bool):
            self.early_stop = patience if early_stop else None
        else:
            self.early_stop = early_stop
        self.patience = patience
        self.optimizer_step_multi_dataset = optimizer_step_multi_dataset
        self.compute_train_metrics = compute_train_metrics
        self.check_grad = check_grad
        self.eval_interval = eval_interval
        self.plot_images = plot_images
        self.plot_interval = plot_interval
        self.save_folder_im = save_folder_im
        self.save_path = save_path
        self.ckpt_interval = ckpt_interval
        if ckpt_backend not in ("pickle", "orbax"):
            raise ValueError("ckpt_backend must be 'pickle' or 'orbax'")
        self.ckpt_backend = ckpt_backend
        self._orbax = None
        self.compare_no_learning = compare_no_learning
        self.no_learning_method = no_learning_method
        self.verbose = verbose
        self.show_progress_bar = show_progress_bar
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
        for l in self._losses:
            if hasattr(l, "adapt_model"):
                self.model = l.adapt_model(self.model)

        self.opt_state = self.optimizer.init(self.model)
        self.epoch_start = 0
        self.epochs_run = 0
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
        self._grad_fn = None
        self._apply_fn = None
        # jitted helpers: eager physics/metric evaluation is not supported on
        # all TPU runtimes (reductions/FFT outside jit), and jit also caches
        # the compiled program across steps
        self._measure_fn = None
        self._metric_fns = None
        self._nl_fn = None
        self._eval_infer_fn = None
        # per-run loop state (populated by setup_train)
        self.G = len(self.train_dataloader) or 1
        self.current_train_iterators = None
        self.current_eval_iterators = None
        self._epoch_key = None
        self._ite_in_epoch = 0
        self.reset_metrics()

    # -- reference dataclass-field conveniences -----------------------------
    @property
    def losses(self) -> list:
        """Training losses (reference trainer.py dataclass field)."""
        return self._losses

    @losses.setter
    def losses(self, v):
        self._losses = _to_list(v)

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

    # -- setup (reference trainer.py:330) -----------------------------------
    def setup_train(self, train: bool = True, **kwargs):
        """Set up training: normalize dataloaders, sanity-check datasets,
        reset meters and build the jitted step (reference trainer.py:330)."""
        self.train_dataloader = _to_list(self.train_dataloader)
        self.eval_dataloader = _to_list(self.eval_dataloader)
        from ..datasets.base import check_dataset

        for loader in self.train_dataloader + self.eval_dataloader:
            ds = getattr(loader, "dataset", None)
            if ds is not None:
                check_dataset(ds)
        self.G = len(self.train_dataloader) or 1
        self.reset_metrics()
        if self._train_step_fn is None:
            self._train_step_fn = self._build_train_step()
        # fresh iterators + key so step() is usable standalone; train()
        # re-creates them per epoch
        self.current_train_iterators = [iter(dl) for dl in self.train_dataloader]
        self.current_eval_iterators = [iter(dl) for dl in self.eval_dataloader]
        if self._epoch_key is None:
            self._epoch_key = ensure_key(None, self.seed)

    # -- metric bookkeeping (reference trainer.py:1209) ----------------------
    def reset_metrics(self):
        """Reset all running meters (reference trainer.py:1209)."""
        self.img_counter = 0
        self.logs_total_loss_train = AverageMeter("loss")
        self.logs_total_loss_eval = AverageMeter("loss")
        self.logs_losses_train = [
            AverageMeter(type(l).__name__) for l in self._losses
        ]
        self.logs_losses_eval = [
            AverageMeter(type(l).__name__) for l in self._losses
        ]
        self.logs_metrics_train = [
            AverageMeter(type(m).__name__) for m in self.metrics
        ]
        self.logs_metrics_eval = [
            AverageMeter(type(m).__name__) for m in self.metrics
        ]
        self.logs_metrics_no_learning = [
            AverageMeter(type(m).__name__) for m in self.metrics
        ]
        self.check_grad_val = AverageMeter("grad_norm")

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
        total, x_net, _ = self._loss_terms(model, x, y, physics, key)
        return total, x_net

    def _loss_terms(self, model, x, y, physics, key=None):
        """(total, x_net, {loss_name: value}) — per-loss values feed the
        reference's per-loss meters (trainer.py:860-884)."""
        x_net = self.model_inference(
            y, physics, model=model, train=True,
            key=jax.random.fold_in(key, 0x7FFFFFFF) if key is not None else None,
        )
        total = 0.0
        terms = {}
        for i, l in enumerate(self._losses):
            li = l(
                x_net=x_net, x=x, y=y, physics=physics, model=model,
                key=jax.random.fold_in(key, i) if key is not None else None,
            )
            li = jnp.mean(li)
            terms[type(l).__name__] = li
            total = total + li
        return total, x_net, terms

    def compute_metrics(self, x, x_net, y, physics, logs, train: bool = True,
                        epoch: int = None):
        """Update metric meters over a batch and fill ``logs`` (reference
        trainer.py:886). Returns ``(x_net, logs)``."""
        if x_net is None:
            x_net = self.model_inference(y, physics, train=False)
        n = x.shape[0] if hasattr(x, "shape") else 1
        meters = self.logs_metrics_train if train else self.logs_metrics_eval
        for i, m in enumerate(self.metrics):
            meters[i].update(self._metric_value(i, x_net, x), n=n)
            logs[type(m).__name__] = meters[i].avg
            if not train and self.compare_no_learning:
                if self._nl_fn is None:
                    self._nl_fn = jax.jit(
                        lambda yv, p: self.no_learning_inference(yv, p)
                    )
                x_nl = self._nl_fn(y, physics)
                self.logs_metrics_no_learning[i].update(
                    self._metric_value(i, x_nl, x), n=n
                )
                logs[f"{type(m).__name__} no learning"] = (
                    self.logs_metrics_no_learning[i].avg
                )
        return x_net, logs

    def check_clip_grad(self, grad_norm=None):
        """Track the global gradient norm (reference trainer.py:630).

        Clipping itself lives inside the optax chain
        (``optax.clip_by_global_norm``) so it runs inside the jitted step;
        this hook records the pre-clip norm (computed in-graph and returned
        by the step) into ``check_grad_val`` when ``check_grad=True``.
        """
        if grad_norm is not None and self.check_grad:
            self.check_grad_val.update(float(np.asarray(grad_norm)))
        return grad_norm

    # -- jitted step ------------------------------------------------------
    def _build_train_step(self):
        """Fused loss+grad+update XLA program (single-dataset path)."""
        optimizer = self.optimizer

        def train_step(model, opt_state, x, y, physics, key):
            # trace the pure-XLA model path: fused Pallas inference kernels
            # are slower under autodiff (bench_train_chain.py: 20.8 vs
            # 8.7 ms DnCNN fwd+bwd), so training disables them at trace time
            from ..ops.pallas.conv_chain import fused_chains_disabled

            with fused_chains_disabled():
                (loss, (x_net, terms)), grads = jax.value_and_grad(
                    self._differentiable_loss, has_aux=True
                )(model, x, y, physics, key)
            import optax

            gnorm = optax.global_norm(grads)
            updates, opt_state = optimizer.update(grads, opt_state, model)
            model = jax.tree_util.tree_map(lambda m, u: m + u, model, updates)
            return model, opt_state, loss, x_net, terms, gnorm

        return jax.jit(train_step)

    def _differentiable_loss(self, model, x, y, physics, key):
        """compute_loss wrapper returning per-loss terms as aux. Respects
        compute_loss overrides (terms then reduce to the total only)."""
        if type(self).compute_loss is Trainer.compute_loss:
            total, x_net, terms = self._loss_terms(model, x, y, physics, key)
        else:
            total, x_net = self.compute_loss(model, x, y, physics, key)
            terms = {"TotalLoss": total}
        return total, (x_net, terms)

    def _build_grad_fns(self):
        """Split grad/apply programs for multi-dataset accumulation
        (``optimizer_step_multi_dataset=True`` with several loaders)."""
        optimizer = self.optimizer

        def grad_step(model, x, y, physics, key):
            from ..ops.pallas.conv_chain import fused_chains_disabled

            with fused_chains_disabled():
                (loss, (x_net, terms)), grads = jax.value_and_grad(
                    self._differentiable_loss, has_aux=True
                )(model, x, y, physics, key)
            return loss, x_net, terms, grads

        def apply_step(model, opt_state, grads):
            import optax

            gnorm = optax.global_norm(grads)
            updates, opt_state = optimizer.update(grads, opt_state, model)
            model = jax.tree_util.tree_map(lambda m, u: m + u, model, updates)
            return model, opt_state, gnorm

        return jax.jit(grad_step), jax.jit(apply_step)

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

    # -- one train/eval iteration (reference trainer.py:996) ----------------
    def step(self, epoch, progress_bar=None, train_ite=None, train: bool = True,
             last_batch: bool = False):
        """Process one batch from each dataloader (reference trainer.py:996).

        Draws one batch from every loader in random order; with
        ``optimizer_step_multi_dataset`` the gradients are accumulated over
        all loaders and applied in a single optimizer update, otherwise each
        loader batch takes its own step. Updates loss/metric meters and, on
        ``last_batch``, prints the epoch log line and calls :meth:`plot`.
        """
        iterators = (
            self.current_train_iterators if train else self.current_eval_iterators
        )
        G_perm = np.random.permutation(self.G if train else len(iterators))
        logs = {}
        ite = self._ite_in_epoch if train_ite is None else train_ite
        x = y = x_net = physics_cur = None

        multi = train and self.optimizer_step_multi_dataset and len(G_perm) > 1
        if multi and self._grad_fn is None:
            self._grad_fn, self._apply_fn = self._build_grad_fns()
        acc_grads = None

        for g in G_perm:
            batch = next(iterators[g])
            physics_cur = self.physics[g % len(self.physics)]
            step_key = jax.random.fold_in(
                jax.random.fold_in(self._epoch_key, self._ite_in_epoch), int(g)
            )
            x, y, physics_cur = self.get_samples(batch, physics_cur, step_key)
            if self._dp_sharding is not None:
                x = jax.device_put(x, self._dp_sharding)
                y = jax.device_put(y, self._dp_sharding)
                self.model = jax.device_put(self.model, self._repl_sharding)
            n = x.shape[0]

            if train:
                if multi:
                    loss, x_net, terms, grads = self._grad_fn(
                        self.model, x, y, physics_cur, step_key
                    )
                    acc_grads = grads if acc_grads is None else jax.tree_util.tree_map(
                        lambda a, b: a + b, acc_grads, grads
                    )
                else:
                    (self.model, self.opt_state, loss, x_net, terms,
                     gnorm) = self._train_step_fn(
                        self.model, self.opt_state, x, y, physics_cur, step_key
                    )
                    self.check_clip_grad(gnorm)
                self.logs_total_loss_train.update(float(np.asarray(loss)), n=n)
                logs["TotalLoss"] = self.logs_total_loss_train.avg
                for i, name in enumerate(
                    type(l).__name__ for l in self._losses
                ):
                    if name in terms:
                        self.logs_losses_train[i].update(
                            float(np.asarray(terms[name])), n=n
                        )
                        if len(self._losses) > 1:
                            logs[name] = self.logs_losses_train[i].avg
                if self.compute_train_metrics:
                    x_net, logs = self.compute_metrics(
                        x, x_net, y, physics_cur, logs, train=True, epoch=epoch
                    )
            else:
                x_net = self._eval_inference(y, physics_cur)
                x_net, logs = self.compute_metrics(
                    x, x_net, y, physics_cur, logs, train=False, epoch=epoch
                )

        if multi and acc_grads is not None:
            self.model, self.opt_state, gnorm = self._apply_fn(
                self.model, self.opt_state, acc_grads
            )
            self.check_clip_grad(gnorm)

        if progress_bar is not None and hasattr(progress_bar, "set_postfix"):
            progress_bar.set_postfix(logs)
        self._ite_in_epoch += 1

        if last_batch:
            if self.verbose and not self.show_progress_bar:
                kind = "Train" if train else "Eval"
                body = ", ".join(f"{k}={round(v, 5)}" for k, v in logs.items())
                print(f"{kind} epoch {epoch}: {body}")
            self.log_metrics_mlops(dict(logs, step=epoch), step=epoch)
            self.plot(epoch, physics_cur, x, y, x_net, train=train)
        return logs

    def _eval_inference(self, y, physics):
        if self._eval_infer_fn is None:
            if getattr(self.model, "train_aware", False):
                k = ensure_key(None, self.seed + 424242)
                self._eval_infer_fn = jax.jit(
                    lambda model, yv, p: model(yv, p, key=k, train=False)
                )
            else:
                self._eval_infer_fn = jax.jit(lambda model, yv, p: model(yv, p))
        return self._eval_infer_fn(self.model, y, physics)

    # -- plotting (reference trainer.py:1090) --------------------------------
    def plot(self, epoch, physics, x, y, x_net, train: bool = True):
        """Plot/save ground truth, measurement and reconstruction panels
        (reference trainer.py:1090). Active when ``plot_images`` (every
        ``plot_interval`` epochs) or ``save_folder_im`` is set."""
        do_plot = self.plot_images and ((epoch + 1) % self.plot_interval == 0)
        do_save = self.save_folder_im is not None
        if not (do_plot or do_save) or x is None or x_net is None:
            return
        from ..utils.plotting import plot

        imgs, titles = [x], ["Ground truth"]
        if y is not None and getattr(y, "ndim", 0) == getattr(x, "ndim", 0):
            imgs.append(y)
            titles.append("Measurement")
        imgs.append(x_net)
        titles.append("Reconstruction")
        save_fn = None
        if do_save:
            sub = "Training" if train else "Eval"
            folder = os.path.join(self.save_folder_im, sub)
            os.makedirs(folder, exist_ok=True)
            save_fn = os.path.join(folder, f"epoch_{epoch}.png")
            self.img_counter += 1
        plot(imgs, titles=titles, show=do_plot and not do_save,
             save_fn=save_fn)

    # -- training loop ----------------------------------------------------
    def train(self):
        self.setup_train(train=True)
        base_key = ensure_key(None, self.seed)

        for epoch in range(self.epoch_start, self.epochs):
            # per-epoch key: resets measurement draws if requested
            if self.loop_random_online_physics:
                self._epoch_key = jax.random.fold_in(base_key, 0)
            else:
                self._epoch_key = jax.random.fold_in(base_key, epoch)
            self.reset_metrics()
            self._ite_in_epoch = 0

            self.current_train_iterators = [
                iter(dl) for dl in self.train_dataloader
            ]
            batches = min(len(dl) for dl in self.train_dataloader)
            np.random.seed(self.seed + epoch)

            for i in range(batches):
                self.step(
                    epoch,
                    train_ite=epoch * batches + i,
                    train=True,
                    last_batch=(i == batches - 1),
                )

            self.loss_history.append(self.logs_total_loss_train.avg)
            self.epochs_run = epoch + 1  # epochs completed (early stop visible)

            # eval + best tracking + early stop
            if self.eval_dataloader and (epoch + 1) % self.eval_interval == 0:
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
                    if self.save_path:
                        self.save_model(os.path.join(self.save_path, "ckp_best.pkl"), epoch)
                if self.stop_criterion(epoch, epoch * batches + batches - 1):
                    break

            if self.save_path and (epoch + 1) % self.ckpt_interval == 0:
                self.save_model(os.path.join(self.save_path, f"ckp_{epoch}.pkl"), epoch)

        return self.model

    def stop_criterion(self, epoch, train_ite=None, **kwargs):
        """Early-stopping decision (reference trainer.py:1287): stop when the
        first eval metric has not improved in the last ``early_stop``
        evaluations. Override for custom conditions."""
        if not self.early_stop or not self.eval_metrics_history:
            return False
        name = type(self.metrics[0]).__name__
        history = self.eval_metrics_history.get(name)
        if not history:
            history = next(iter(self.eval_metrics_history.values()))
        lower_better = getattr(self.metrics[0], "lower_better", True)
        best = min(history) if lower_better else max(history)
        best_epoch = history.index(best) * self.eval_interval
        stop = epoch > self.early_stop * self.eval_interval + best_epoch
        if stop and self.verbose:
            print(
                f"Early stopping at epoch {epoch}: first eval metric has not "
                f"improved in the last {self.early_stop} evaluations."
            )
        return stop

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
                # reference key spelling (trainer.py:1586); keep the
                # underscore form as a back-compat alias
                out[name + " no learning"] = meter.avg
                out[name + "_no_learning"] = meter.avg
        return out

    def no_learning_inference(self, y, physics):
        """Baseline reconstruction (reference trainer.py:941)."""
        m = self.no_learning_method
        if not isinstance(m, str) and callable(m):
            return m(y, physics)
        if m == "A_adjoint":
            return physics.A_adjoint(y)
        if m == "A_dagger":
            return physics.A_dagger(y)
        if m == "prox_l2":
            return physics.prox_l2(physics.A_adjoint(y), y, 1.0)
        if m == "y":
            return y
        raise ValueError(f"no-learning method {m!r} not recognized")

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

    def save_best_model(self, epoch=None, train_ite=None, **kwargs):
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
        verbose=kwargs.pop("verbose", False),
        **kwargs,
    )
    return trainer.test(_to_list(test_dataloader))
