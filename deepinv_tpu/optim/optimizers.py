"""BaseOptim orchestration + named optimizer classes
(reference deepinv/optim/optimizers.py, 2425 LoC).

``BaseOptim`` is a *Reconstructor*: ``model(y, physics) -> x``. It assembles
an iterator, a data fidelity, a prior and a per-iteration parameter schedule
into a single jittable program. ``params_algo`` values may be scalars (shared
across iterations) or arrays/lists with leading dim ``max_iter`` — the
reference's list-per-iteration convention (optimizers.py:136-138) becomes a
stacked pytree consumed by ``lax.scan``.

Because BaseOptim is a pytree Module, *unfolded networks are free*: the
stacked ``params_algo`` arrays and the prior's denoiser weights are leaves,
so ``jax.grad(loss)(model)`` trains them — the reference needs
``unfold=True`` machinery turning lists into ``nn.ParameterList``
(optimizers.py:250-258, 855-858).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..core import Module
from .data_fidelity import DataFidelity, L2
from .prior import Prior, Zero
from .fixed_point import FixedPoint
from .iterators import (
    OptimIterator,
    PMDIteration,
    SMIteration,
    GDIteration,
    PGDIteration,
    FISTAIteration,
    HQSIteration,
    ADMMIteration,
    DRSIteration,
    CPIteration,
    MDIteration,
    SIRTIteration,
    MLEMIteration,
    objective_function,
)

__all__ = [
    "BaseOptim",
    "optim_builder",
    "create_iterator",
    "ADMM",
    "DRS",
    "GD",
    "HQS",
    "PGD",
    "FISTA",
    "MD",
    "CP",
    "MLEM",
    "SIRT",
    "PMD",
    "PDCP",
]

_ITERATORS = {
    "GD": GDIteration,
    "PGD": PGDIteration,
    "FISTA": FISTAIteration,
    "HQS": HQSIteration,
    "ADMM": ADMMIteration,
    "DRS": DRSIteration,
    "CP": CPIteration,
    "MD": MDIteration,
    "PMD": PMDIteration,
    "SM": SMIteration,
    "SIRT": SIRTIteration,
    "MLEM": MLEMIteration,
}

_DEFAULT_PARAMS = {
    "stepsize": 1.0,
    "g_param": 0.05,
    "lambda": 1.0,
    "beta": 1.0,
    "stepsize_dual": 1.0,
    "a": 3.0,
}


def create_iterator(iteration, prior=None, cost_fn=None, g_first=False, **kwargs):
    """Map an iteration name to an OptimIterator (reference optimizers.py:877)."""
    if isinstance(iteration, OptimIterator):
        return iteration
    cls = _ITERATORS.get(str(iteration).upper())
    if cls is None:
        raise ValueError(
            f"unknown iteration {iteration!r}; choose from {sorted(_ITERATORS)}"
        )
    if cls in (MDIteration, PMDIteration):
        return cls(g_first=g_first, bregman_potential=kwargs.get("bregman_potential"))
    if cls is SMIteration:
        return cls(
            g_first=g_first,
            lamb=kwargs.get("lamb", 10.0),
            preprocessing=kwargs.get("preprocessing"),
        )
    it = cls(g_first=g_first)
    # explicit primal-dual splitting operator (reference CP params "K",
    # primal_dual_CP.py:70) — accepted as builder kwargs; silently dropping
    # it ran CP with the identity K (caught by tests/test_optim_battery.py)
    if isinstance(it, CPIteration):
        if kwargs.get("K") is not None:
            it.K = kwargs["K"]
        if kwargs.get("K_adjoint") is not None:
            it.K_adjoint = kwargs["K_adjoint"]
    return it


class BaseOptim(Module):
    """Optimization-algorithm reconstructor (reference optimizers.py:87).

    :param iterator: OptimIterator or iteration name.
    :param data_fidelity: DataFidelity term.
    :param prior: Prior term.
    :param params_algo: dict of scalars or per-iteration arrays.
    :param max_iter: iteration budget.
    :param early_stop: stop on residual convergence (while_loop mode).
    :param crit_conv / thres_conv: convergence criterion.
    :param custom_init: ``f(y, physics) -> x0`` or ``f(y, physics) -> dict``.
        Default init is ``A_adjoint(y)`` (reference doc optimizers.py:140).
    :param anderson_acceleration: enable Anderson mixing.
    :param compute_cost: track objective values.
    """

    def __init__(
        self,
        iterator,
        data_fidelity: DataFidelity = None,
        prior: Prior = None,
        params_algo: dict = None,
        max_iter: int = 100,
        early_stop: bool = False,
        crit_conv: str = "residual",
        thres_conv: float = 1e-5,
        custom_init: Optional[Callable] = None,
        anderson_acceleration: bool = False,
        history_size: int = 5,
        g_first: bool = False,
        unfold: bool = False,
        remat: bool = False,
        backtracking: bool = False,
        verbose: bool = False,
        **kwargs,
    ):
        self.iterator = create_iterator(iterator, g_first=g_first, **kwargs)
        self.data_fidelity = data_fidelity if data_fidelity is not None else L2()
        self.prior = prior if prior is not None else Zero()
        self.max_iter = max_iter
        self.custom_init = custom_init
        self.unfold = unfold
        self.verbose = verbose

        pa = dict(_DEFAULT_PARAMS)
        pa.update(params_algo or {})
        # stack every param to shape (max_iter, ...) for the scan
        self.params_algo = {
            k: self._stack_param(v, max_iter) for k, v in pa.items()
        }

        self.fixed_point = FixedPoint(
            self.iterator,
            max_iter=max_iter,
            early_stop=early_stop,
            crit_conv=crit_conv,
            thres_conv=thres_conv,
            anderson_acceleration=anderson_acceleration,
            history_size=history_size,
            remat=remat,
            backtracking=backtracking,
        )

    @staticmethod
    def _stack_param(v, max_iter):
        if isinstance(v, (list, tuple)):
            v = jnp.asarray(v, jnp.float32)
            if v.shape[0] != max_iter:
                reps = -(-max_iter // v.shape[0])
                v = jnp.tile(v, reps)[:max_iter]
            return v
        v = jnp.asarray(v, jnp.float32)
        if v.ndim == 0:
            return jnp.broadcast_to(v, (max_iter,))
        if v.shape[0] == max_iter:
            return v
        return jnp.broadcast_to(v[None], (max_iter,) + v.shape)

    def init_iterate(self, y, physics, x_init=None):
        """x0 = A_adjoint(y) by default (reference init, optimizers.py:140)."""
        if x_init is not None:
            return x_init
        if self.custom_init is not None:
            return self.custom_init(y, physics)
        if hasattr(physics, "A_adjoint"):
            return physics.A_adjoint(y)
        return y

    def __call__(self, y, physics, x_init=None, **kwargs):
        x0 = self.init_iterate(y, physics, x_init)
        X = self.fixed_point(
            x0, self.data_fidelity, self.prior, self.params_algo, y, physics
        )
        return self.iterator.get_output(X)

    forward = __call__

    def objective(self, x, y, physics):
        """Objective F(x) at the *final* parameter values."""
        cur = jax.tree_util.tree_map(lambda v: v[-1], self.params_algo)
        return objective_function(x, self.data_fidelity, self.prior, cur, y, physics)

    # -- reference customization hooks (optimizers.py:457-760) -------------

    def update_params_fn(self, it: int) -> dict:
        """Parameter values for iteration ``it`` (reference
        optimizers.py:457)."""
        return jax.tree_util.tree_map(lambda v: v[it], self.params_algo)

    def update_prior_fn(self, it: int):
        """Prior for iteration ``it`` (reference optimizers.py:471)."""
        p = self.prior
        return p[it % len(p)] if isinstance(p, (list, tuple)) else p

    def update_data_fidelity_fn(self, it: int):
        """Data-fidelity for iteration ``it`` (reference
        optimizers.py:482)."""
        d = self.data_fidelity
        return d[it % len(d)] if isinstance(d, (list, tuple)) else d

    def init_iterate_fn(self, y, physics, x_init=None):
        """Initial state dict ``X`` (reference optimizers.py:497)."""
        return self.iterator.init_state(
            self.init_iterate(y, physics, x_init), y, physics)

    def init_metrics_fn(self, X_init, x_gt=None) -> dict:
        """Per-batch metric lists (reference optimizers.py:582): psnr (if
        ground truth given), residual, cost (if tracked)."""
        import numpy as np

        x0 = self.iterator.get_output(X_init)
        self.batch_size = int(x0.shape[0])
        init = {"residual": [[] for _ in range(self.batch_size)]}
        if x_gt is not None:
            init["psnr"] = [[float(_psnr_host(x0[i:i+1], x_gt[i:i+1]))]
                            for i in range(self.batch_size)]
        else:
            init["psnr"] = [[] for _ in range(self.batch_size)]
        if self.iterator.has_cost:
            init["cost"] = [[] for _ in range(self.batch_size)]
        return init

    def update_metrics_fn(self, metrics, X_prev, X, x_gt=None) -> dict:
        """Append this iteration's metrics (reference optimizers.py:616)."""
        import numpy as np

        if metrics is None:
            return metrics
        xp = np.asarray(jax.device_get(self.iterator.get_output(X_prev)))
        x = np.asarray(jax.device_get(self.iterator.get_output(X)))
        for i in range(x.shape[0]):
            res = float(np.linalg.norm(xp[i] - x[i])
                        / (np.linalg.norm(x[i]) + 1e-6))
            metrics["residual"][i].append(res)
            if x_gt is not None:
                metrics["psnr"][i].append(float(_psnr_host(x[i:i+1],
                                                           x_gt[i:i+1])))
            if self.iterator.has_cost and "cost" in X:
                metrics["cost"][i].append(
                    float(np.asarray(jax.device_get(X["cost"]))[i]))
        return metrics

    def check_conv_fn(self, it: int, X_prev, X) -> bool:
        """Host-side convergence check (reference optimizers.py:696)."""
        import numpy as np

        xp = np.asarray(jax.device_get(self.iterator.get_output(X_prev)))
        x = np.asarray(jax.device_get(self.iterator.get_output(X)))
        xp = xp.reshape(xp.shape[0], -1)
        x = x.reshape(x.shape[0], -1)
        crit = float(np.mean(np.linalg.norm(xp - x, axis=-1)
                             / (np.linalg.norm(x, axis=-1) + 1e-6)))
        converged = crit < self.fixed_point.thres_conv
        if converged and self.verbose:
            print(f"Iteration {it}, converge crit. = {crit:.2E}")
        return converged

    def backtracking_check_fn(self, X_prev, X, cur_params, y, physics,
                              data_fidelity=None, prior=None):
        """Armijo check: did the objective increase (reference
        optimizers.py:661)? Returns a boolean array."""
        df = data_fidelity if data_fidelity is not None else self.data_fidelity
        pr = prior if prior is not None else self.prior
        F_old = jnp.sum(objective_function(
            self.iterator.get_output(X_prev), df, pr, cur_params, y, physics))
        F_new = jnp.sum(objective_function(
            self.iterator.get_output(X), df, pr, cur_params, y, physics))
        return F_new > F_old

    def DEQ_additional_step(self, X, y, physics, **kwargs):
        """One extra iterator step at the equilibrium point (reference
        optimizers.py:734) — used by DEQ backward passes."""
        it = self.max_iter - 1
        return self.fixed_point.single_iteration(
            X, self.update_data_fidelity_fn(it), self.update_prior_fn(it),
            self.update_params_fn(it), y, physics, **kwargs)


def _psnr_host(a, b, max_pixel: float = 1.0):
    import numpy as np

    a = np.asarray(jax.device_get(a))
    b = np.asarray(jax.device_get(b))
    mse = float(np.mean((a - b) ** 2))
    return 10.0 * np.log10(max_pixel**2 / max(mse, 1e-12))


def optim_builder(
    iteration,
    data_fidelity=None,
    prior=None,
    params_algo=None,
    max_iter: int = 100,
    **kwargs,
) -> BaseOptim:
    """Build a reconstruction algorithm (reference optimizers.py:967).

    :Examples:

        PnP-HQS deblurring, compiled as one XLA program:

        >>> import jax, jax.numpy as jnp
        >>> from deepinv_tpu.physics import BlurFFT
        >>> from deepinv_tpu.ops import gaussian_blur
        >>> from deepinv_tpu.optim import optim_builder, L2, PnP
        >>> from deepinv_tpu.models import MedianFilter
        >>> physics = BlurFFT(img_size=(1, 16, 16),
        ...                   filter=gaussian_blur(sigma=1.0))
        >>> x = jax.random.uniform(jax.random.key(0), (1, 1, 16, 16))
        >>> y = physics.A(x)
        >>> model = optim_builder("HQS", data_fidelity=L2(),
        ...                       prior=PnP(MedianFilter()),
        ...                       params_algo={"stepsize": 1.0,
        ...                                    "g_param": 0.05},
        ...                       max_iter=3)
        >>> xhat = jax.jit(lambda m, yv, p: m(yv, p))(model, y, physics)
        >>> xhat.shape
        (1, 1, 16, 16)
    """
    return BaseOptim(
        iteration,
        data_fidelity=data_fidelity,
        prior=prior,
        params_algo=params_algo,
        max_iter=max_iter,
        **kwargs,
    )


def _named(iteration):
    def build(data_fidelity=None, prior=None, params_algo=None, max_iter=100, **kwargs):
        return BaseOptim(
            iteration,
            data_fidelity=data_fidelity,
            prior=prior,
            params_algo=params_algo,
            max_iter=max_iter,
            **kwargs,
        )

    build.__name__ = iteration
    build.__doc__ = f"{iteration} reconstructor (reference optimizers.py named class)."
    return build


ADMM = _named("ADMM")
DRS = _named("DRS")
GD = _named("GD")
HQS = _named("HQS")
PGD = _named("PGD")
FISTA = _named("FISTA")
MD = _named("MD")
CP = _named("CP")
MLEM = _named("MLEM")
SIRT = _named("SIRT")
PMD = _named("PMD")


def PDCP(
    data_fidelity=None,
    prior=None,
    K=None,
    K_adjoint=None,
    params_algo=None,
    max_iter: int = 100,
    **kwargs,
) -> BaseOptim:
    """Primal-dual Chambolle-Pock with an explicit linear operator ``K``
    (reference optimizers.py:2081). With the default identity ``K`` this is
    the ``CP`` algorithm; pass ``K``/``K_adjoint`` for a splitting on
    ``F(Kx)``."""
    from .iterators import CPIteration

    it = CPIteration(g_first=kwargs.pop("g_first", False))
    if K is not None:
        it.K = K
        it.K_adjoint = K_adjoint
    return BaseOptim(
        it,
        data_fidelity=data_fidelity,
        prior=prior,
        params_algo=params_algo,
        max_iter=max_iter,
        **kwargs,
    )
