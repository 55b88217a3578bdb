"""Orbax-backed checkpointing (TPU-native alternative to the pickle path).

The reference persists `torch.save` dicts (trainer.py:1167). On TPU the
idiomatic store is Orbax: zero-copy array serialization, async writes that
overlap the next training epoch, automatic retention of the last N steps,
and (on multi-host meshes) sharded per-host writes of distributed arrays.

The pytree-Module design makes this trivial: a model IS a pytree, so the
whole training state (model + optax state + histories) round-trips through
``orbax.checkpoint`` without any translation layer.
"""

from __future__ import annotations

import os

import numpy as np
import jax

__all__ = ["OrbaxCheckpointer"]


class OrbaxCheckpointer:
    """Manage train-state checkpoints under ``directory``.

    :param directory: checkpoint root (one numbered subdir per step).
    :param max_to_keep: retention window.
    :param async_save: overlap serialization with the next epoch.
    """

    def __init__(self, directory: str, max_to_keep: int = 3, async_save: bool = True):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                enable_async_checkpointing=async_save,
            ),
        )

    def save(self, step: int, model, opt_state=None, extra: dict | None = None):
        """Persist the training state at ``step``.

        Array leaves are stored natively; the static structure (treedefs)
        is reconstructed at restore time from a template, so ``restore``
        needs the same model/opt_state classes.
        """
        state = {
            "model": [np.asarray(v) for v in jax.tree_util.tree_leaves(model)]
        }
        if opt_state is not None:
            state["opt_state"] = [
                np.asarray(v) for v in jax.tree_util.tree_leaves(opt_state)
            ]
        if extra:
            state["extra"] = {
                k: np.asarray(v) if hasattr(v, "shape") else v
                for k, v in extra.items()
            }
        self.manager.save(step, args=self._ocp.args.StandardSave(state))

    def restore(self, model, opt_state=None, step: int | None = None):
        """Restore into templates; returns ``(model, opt_state, extra, step)``."""
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        restored = self.manager.restore(
            step, args=self._ocp.args.StandardRestore()
        )
        treedef_m = jax.tree_util.tree_structure(model)
        model_new = jax.tree_util.tree_unflatten(treedef_m, restored["model"])
        opt_new = opt_state
        if opt_state is not None and "opt_state" in restored:
            leaves = restored["opt_state"]
            treedef = jax.tree_util.tree_structure(opt_state)
            opt_new = jax.tree_util.tree_unflatten(treedef, leaves)
        return model_new, opt_new, restored.get("extra", {}), step

    def latest_step(self):
        return self.manager.latest_step()

    def wait(self):
        """Block until pending async saves are durable."""
        self.manager.wait_until_finished()

    def close(self):
        self.manager.close()
