"""Unfolded and deep-equilibrium reconstruction networks
(reference deepinv/unfolded/: unfolded_builder, DEQ_builder; real mechanism
in optim/optimizers.py:250-258, 734-817).

In this framework an *unfolded network* is just a :class:`BaseOptim` — the
stacked ``params_algo`` arrays and the prior's denoiser weights are pytree
leaves, so ``jax.grad`` through the ``lax.scan`` trains everything. The
builders below exist for API parity and to wire trainable priors per
iteration.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..core import Module
from ..optim.optimizers import BaseOptim, create_iterator
from ..optim.data_fidelity import L2
from .deq import deq_fixed_point

__all__ = ["unfolded_builder", "DEQ_builder", "BaseUnfold", "BaseDEQ"]


class BaseUnfold(BaseOptim):
    """Unfolded optimization network (reference unfolded_builder).

    Identical to BaseOptim; the class exists for parity and to mark
    trainable intent. All ``params_algo`` entries are trainable leaves.
    """


def unfolded_builder(
    iteration,
    data_fidelity=None,
    prior=None,
    params_algo=None,
    max_iter: int = 5,
    trainable_params=("stepsize", "g_param", "lambda"),
    **kwargs,
) -> BaseUnfold:
    """Build an unfolded network (reference deepinv/unfolded/unfolded.py).

    :Examples:

        Per-iteration parameters become trainable leaves — ``jax.grad``
        through the reconstruction IS unrolled training:

        >>> import jax, jax.numpy as jnp
        >>> from deepinv_tpu.unfolded import unfolded_builder
        >>> from deepinv_tpu.optim import L2, TVPrior
        >>> from deepinv_tpu.physics import Denoising
        >>> net = unfolded_builder("PGD", data_fidelity=L2(), prior=TVPrior(),
        ...                        params_algo={"stepsize": 1.0,
        ...                                     "lambda": 0.01},
        ...                        max_iter=3)
        >>> physics = Denoising()
        >>> x = jax.random.uniform(jax.random.key(0), (1, 1, 8, 8))
        >>> y = physics.A(x)
        >>> loss = lambda m: jnp.mean((m(y, physics) - x) ** 2)
        >>> g = jax.grad(loss)(net)  # gradients w.r.t. the schedule
        >>> bool(jnp.isfinite(jax.tree_util.tree_leaves(g)[0]).all())
        True
    """
    return BaseUnfold(
        iteration,
        data_fidelity=data_fidelity,
        prior=prior,
        params_algo=params_algo,
        max_iter=max_iter,
        unfold=True,
        **kwargs,
    )


class BaseDEQ(BaseOptim):
    """Deep-equilibrium reconstructor (reference DEQ, optimizers.py:734).

    Runs the iterator to its fixed point with O(1)-memory implicit
    backward (``deq_fixed_point``); ``max_iter`` bounds the forward loop and
    ``max_iter_backward`` the adjoint solve.
    """

    def __init__(self, *args, max_iter_backward: int = 30, anderson_acceleration: bool = False, **kwargs):
        super().__init__(*args, **kwargs)
        self.max_iter_backward = max_iter_backward

    def __call__(self, y, physics, x_init=None, **kwargs):
        x0 = self.init_iterate(y, physics, x_init)
        # single-iteration map at the *final* scheduled parameters
        cur = jax.tree_util.tree_map(lambda v: v[-1], self.params_algo)

        trainables = {"prior": self.prior, "params": cur}

        def T(tr, x):
            X = {"est": (x, x), "it": jnp.asarray(0)}
            X = self.iterator(X, self.data_fidelity, tr["prior"], tr["params"], y, physics)
            return X["est"][0]

        return deq_fixed_point(
            T,
            trainables,
            x0,
            max_iter=self.max_iter,
            tol=self.fixed_point.thres_conv,
            backward_iter=self.max_iter_backward,
        )


def DEQ_builder(
    iteration,
    data_fidelity=None,
    prior=None,
    params_algo=None,
    max_iter: int = 50,
    max_iter_backward: int = 30,
    **kwargs,
) -> BaseDEQ:
    """Build a DEQ network (reference deepinv/unfolded/deep_equilibrium.py)."""
    return BaseDEQ(
        iteration,
        data_fidelity=data_fidelity,
        prior=prior,
        params_algo=params_algo,
        max_iter=max_iter,
        max_iter_backward=max_iter_backward,
        **kwargs,
    )
