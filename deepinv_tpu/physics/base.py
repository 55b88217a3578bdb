"""Forward-operator class tree: Physics / LinearPhysics / DecomposablePhysics.

TPU-native counterpart of deepinv/physics/forward.py (Physics:19,
LinearPhysics:354, DecomposablePhysics:990, Denoising:1255, compose:73/970,
stack:1365, StackedPhysics:1380, StackedLinearPhysics:1479).

Every physics is a :class:`deepinv_tpu.core.Module` pytree: operator
parameters (filters, masks, matrices) are leaves, so a physics can be
``jax.jit``-ed, ``vmap``-ed over a batch of operators (the reference needs a
``PhysicsGenerator`` + in-place ``update_parameters`` loop for this), sharded
over a mesh axis, or differentiated through for blind inverse problems.

Stateless rules replacing reference semantics:

- randomness: ``physics(x, key=...)`` (reference: hidden ``torch.Generator``
  state, noise.py:22-37). ``key=None`` derives a deterministic key from the
  noise model's ``seed`` field.
- parameter updates: ``physics.update(filter=...)`` returns a *new* physics
  (reference mutates buffers via ``update_parameters``).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from ..core import (
    Module,
    TensorList,
    randn_like,
    tree_sub,
    tree_real_vdot,
    tree_norm,
    power_method,
)
from ..core.rng import ensure_key

__all__ = [
    "Physics",
    "LinearPhysics",
    "DecomposablePhysics",
    "Denoising",
    "ComposedPhysics",
    "ComposedLinearPhysics",
    "StackedPhysics",
    "StackedLinearPhysics",
    "compose",
    "stack",
    "adjoint_function",
]


class Physics(Module):
    """Generic (possibly nonlinear) forward operator ``y = N(A(x))``.

    Reference: deepinv/physics/forward.py:19.

    :Examples:

        A custom nonlinear operator from a plain callable:

        >>> import jax, jax.numpy as jnp
        >>> from deepinv_tpu.physics import Physics
        >>> physics = Physics(A=lambda x: x ** 2)
        >>> x = jnp.full((1, 1, 2, 2), 3.0)
        >>> physics(x)[0, 0, 0, 0].item()
        9.0
    """

    def __init__(
        self,
        A: Optional[Callable] = None,
        noise_model: Optional[Module] = None,
        sensor_model: Optional[Callable] = None,
        solver: str = "gradient_descent",
        max_iter: int = 50,
        tol: float = 1e-4,
    ):
        self.fwd_fn = A
        self.noise_model = noise_model
        self.sensor_model = sensor_model
        self.solver = solver
        self.max_iter = max_iter
        self.tol = tol

    # -- forward ----------------------------------------------------------
    def A(self, x, **params):
        phys = self.update(**params)
        if phys.fwd_fn is not None:
            return phys.fwd_fn(x)
        return x

    def sensor(self, y):
        return self.sensor_model(y) if self.sensor_model is not None else y

    def noise(self, y, key=None):
        if self.noise_model is None:
            return y
        return self.noise_model(y, key=key)

    def __call__(self, x, key=None, **params):
        return self.sensor(self.noise(self.A(x, **params), key=key))

    def forward(self, x, key=None, **params):
        return self(x, key=key, **params)

    # -- inverse ----------------------------------------------------------
    def A_dagger(self, y, x_init=None, **params):
        """Gradient-descent pseudo-inverse for nonlinear A
        (reference forward.py:161-199), compiled to ``lax.while_loop``."""
        phys = self.update(**params)
        if x_init is None:
            x_init = phys.A_adjoint(y) if hasattr(phys, "A_adjoint") else y

        def loss_grad(x):
            def loss(u):
                r = tree_sub(phys.A(u), y)
                return 0.5 * tree_real_vdot(r, r)

            return jax.grad(loss)(x)

        lr = 1e-1

        def cond(state):
            x, g_norm, it = state
            return jnp.logical_and(it < self.max_iter, g_norm > self.tol)

        def body(state):
            x, _, it = state
            g = loss_grad(x)
            x = jax.tree_util.tree_map(lambda a, b: a - lr * b, x, g)
            return (x, tree_norm(g), it + 1)

        x, _, _ = jax.lax.while_loop(cond, body, (x_init, jnp.asarray(jnp.inf), 0))
        return x

    # -- Jacobian products (reference forward.py:222,270,338) --------------
    def A_vjp(self, x, v):
        """Vector-Jacobian product ``(dA/dx)|_x^T v`` via autodiff
        (reference forward.py:222)."""
        _, vjp_fn = jax.vjp(lambda u: self.A(u), x)
        return vjp_fn(v)[0]

    def A_jvp(self, x, v):
        """Jacobian-vector product ``(dA/dx)|_x v`` via autodiff
        (reference forward.py ``A_jvp``)."""
        return jax.jvp(lambda u: self.A(u), (x,), (v,))[1]

    def compute_norm(self, x0, max_iter: int = 100, tol: float = 1e-6):
        """Squared spectral norm of the Jacobian at ``x0``: power iteration
        on ``v -> J^T J v`` (reference forward.py:338)."""
        return power_method(
            lambda v: self.A_vjp(x0, self.A_jvp(x0, v)), x0,
            max_iter=max_iter, tol=tol,
        )

    # -- functional setters (the reference mutates; these return a copy) ---
    def update(self, **params) -> "Physics":
        """Update operator AND noise-model parameters (reference
        forward.py:239 routes kwargs into both): keys the physics knows
        update the physics, keys the noise model knows (``sigma``,
        ``gain``, ...) update the noise model; unknown keys are ignored
        like the reference's generator protocol expects. Returns a NEW
        physics (pytrees are immutable)."""
        new = super().update(**params)
        # route noise keys into the noise model of NEW (an explicitly
        # passed noise_model= must not be clobbered by re-deriving from
        # self's old model)
        nm = getattr(new, "noise_model", None)
        if nm is not None and hasattr(nm, "update"):
            nm2 = nm.update(**params)
            if nm2 is not nm:
                new = new.replace(noise_model=nm2)
        return new

    def update_parameters(self, **params) -> "Physics":
        """Reference-named alias of :meth:`update` (forward.py
        ``update_parameters``); returns a NEW physics (pytrees are
        immutable)."""
        return self.update(**params)

    def set_noise_model(self, noise_model) -> "Physics":
        """Return a copy with a different noise model (reference
        ``set_noise_model``)."""
        return self.replace(noise_model=noise_model)

    def set_ls_solver(self, solver: str, max_iter: int = None,
                      tol: float = None) -> "Physics":
        """Return a copy with different least-squares solver defaults
        (reference ``set_ls_solver``)."""
        new = self.replace(solver=solver)
        if max_iter is not None:
            new = new.replace(max_iter=max_iter)
        if tol is not None:
            new = new.replace(tol=tol)
        return new

    def clone(self) -> "Physics":
        """Deep copy (reference ``clone``). Array leaves are immutable in
        JAX, so copying the tree structure suffices."""
        leaves, treedef = jax.tree_util.tree_flatten(self)
        return jax.tree_util.tree_unflatten(treedef, list(leaves))

    # -- algebra ----------------------------------------------------------
    def __mul__(self, other: "Physics") -> "Physics":
        """``(p1 * p2).A(x) == p1.A(p2.A(x))`` (reference forward.py:73)."""
        return compose(other, self)

    def stack(self, other: "Physics") -> "StackedPhysics":
        return stack(self, other)


def adjoint_function(A: Callable, input_shape, dtype=jnp.float32) -> Callable:
    """Build the exact adjoint of a linear callable via ``jax.linear_transpose``
    (reference's autograd-based ``adjoint_function``, forward.py:1302)."""
    spec = jax.tree_util.tree_map(
        lambda s: jax.ShapeDtypeStruct(tuple(s), dtype) if not hasattr(s, "shape") else jax.ShapeDtypeStruct(s.shape, s.dtype),
        input_shape,
        is_leaf=lambda s: isinstance(s, (tuple, list)) and all(isinstance(i, int) for i in s),
    )

    def A_adj(y):
        # inherit the cotangent's varying-manual-axes so the transpose stays
        # device-local under shard_map (see core.linalg.transpose_primal)
        from ..core.linalg import transpose_primal

        leaves = jax.tree_util.tree_leaves(y)
        if leaves:
            cot = leaves[0]
            spec_v = jax.tree_util.tree_map(
                lambda s: transpose_primal(cot, s.shape, s.dtype), spec
            )
        else:
            spec_v = spec
        (x,) = jax.linear_transpose(A, spec_v)(y)
        return x

    return A_adj


class LinearPhysics(Physics):
    """Linear operator with adjoint machinery (reference forward.py:354).

    :Examples:

        Operators verify their adjoint to float precision and expose
        ``prox_l2`` / ``A_dagger`` through Krylov solvers:

        >>> import jax, jax.numpy as jnp
        >>> from deepinv_tpu.physics import Blur
        >>> from deepinv_tpu.ops import gaussian_blur
        >>> physics = Blur(filter=gaussian_blur(sigma=1.0))
        >>> x = jax.random.uniform(jax.random.key(0), (1, 1, 16, 16))
        >>> y = physics.A(x)
        >>> bool(abs(physics.adjointness_test(x)) < 1e-3)
        True
        >>> xhat = physics.A_dagger(y)
        >>> bool(jnp.linalg.norm(physics.A(xhat) - y) < 0.1)
        True
    """

    def __init__(
        self,
        A: Optional[Callable] = None,
        A_adjoint: Optional[Callable] = None,
        noise_model=None,
        sensor_model=None,
        solver: str = "CG",
        max_iter: int = 50,
        tol: float = 1e-4,
        img_shape: Optional[tuple] = None,
    ):
        super().__init__(
            A=A, noise_model=noise_model, sensor_model=sensor_model,
            solver=solver, max_iter=max_iter, tol=tol,
        )
        self.adj_fn = A_adjoint
        self.img_shape = img_shape

    # -- adjoint ----------------------------------------------------------
    def A_adjoint(self, y, **params):
        phys = self.update(**params)
        if phys.adj_fn is not None:
            return phys.adj_fn(y)
        if phys.img_shape is not None:
            shape = phys.img_shape
            # batch-size aware: substitute y's leading (batch) dim so one
            # img_shape spec serves any batch (A is batch-mapped on axis 0)
            if (
                isinstance(shape, tuple)
                and all(isinstance(s, int) for s in shape)
                and hasattr(y, "shape")
                and y.ndim >= 1
            ):
                shape = (y.shape[0],) + tuple(shape[1:])
            return adjoint_function(phys.A, shape, dtype=_leaf_dtype(y))(y)
        raise NotImplementedError(
            f"{type(self).__name__} defines no A_adjoint; pass A_adjoint= or img_shape=."
        )

    def A_vjp(self, x, v):
        """v^T (dA/dx): equals ``A_adjoint(v)`` for linear A (forward.py:535)."""
        return self.A_adjoint(v)

    def A_A_adjoint(self, y, **params):
        return self.A(self.A_adjoint(y, **params), **params)

    def A_adjoint_A(self, x, **params):
        return self.A_adjoint(self.A(x, **params), **params)

    # -- spectral ----------------------------------------------------------
    def compute_norm(self, x0, max_iter: int = 100, tol: float = 1e-6):
        """Squared operator norm ``||A||_2^2`` estimate by power iteration on
        ``A^T A`` (reference compute_norm forward.py:605)."""
        return power_method(lambda v: self.A_adjoint_A(v), x0, max_iter=max_iter, tol=tol)

    compute_sqnorm = compute_norm

    def adjointness_test(self, u, key=None):
        """<A u, v> - <u, A^T v> for random v (reference forward.py:696)."""
        key = ensure_key(key, 17)
        Au = self.A(u)
        v = randn_like(key, Au)
        Atv = self.A_adjoint(v)
        # <Au, v> == <u, A^T v> with vdot's conjugate-linear first argument
        s1 = jnp.vdot(_flat(Au), _flat(v))
        s2 = jnp.vdot(_flat(u), _flat(Atv))
        return s1 - s2

    def condition_number(self, x0, max_iter: int = 500, tol: float = 1e-8):
        """sqrt(lambda_max / lambda_min) of ``A^T A`` via power + inverse-free
        shifted power iteration (reference forward.py:725)."""
        lmax = power_method(lambda v: self.A_adjoint_A(v), x0, max_iter, tol)
        # smallest eigenvalue via power method on (lmax I - A^T A)
        shifted = lambda v: jax.tree_util.tree_map(
            lambda a, b: lmax * a - b, v, self.A_adjoint_A(v)
        )
        lshift = power_method(shifted, x0, max_iter, tol)
        lmin = jnp.maximum(lmax - lshift, 1e-30)
        return jnp.sqrt(lmax / lmin)

    # -- inverses ----------------------------------------------------------
    def prox_l2(self, z, y, gamma, solver=None, max_iter=None, tol=None, **kwargs):
        """argmin_x gamma/2 ||Ax-y||^2 + 1/2 ||x-z||^2 (forward.py:751),
        solved by implicit-vjp Krylov iteration."""
        from ..optim.linear import least_squares

        if z is None or isinstance(z, (int, float)):
            fill = 0.0 if z is None else float(z)
            z = jax.tree_util.tree_map(lambda a: jnp.full_like(a, fill), self.A_adjoint(y))
        return least_squares(
            self.A,
            self.A_adjoint,
            y,
            solver=solver or self.solver,
            gamma=gamma,
            z=z,
            init=z,
            physics=self,
            max_iter=max_iter or self.max_iter,
            tol=tol or self.tol,
            **kwargs,
        )

    def A_dagger(self, y, solver=None, max_iter=None, tol=None, **kwargs):
        """Least-squares pseudo-inverse (forward.py:816)."""
        from ..optim.linear import least_squares

        return least_squares(
            self.A,
            self.A_adjoint,
            y,
            solver=solver or self.solver,
            gamma=kwargs.pop("gamma", None),
            max_iter=max_iter or self.max_iter,
            tol=tol or self.tol,
            **kwargs,
        )

    def __mul__(self, other):
        return compose(other, self)


def _flat(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.concatenate([jnp.ravel(v) for v in leaves])


def _leaf_dtype(tree):
    return jax.tree_util.tree_leaves(tree)[0].dtype


class DecomposablePhysics(LinearPhysics):
    """SVD-form operator ``A = U diag(mask) V^*`` (reference forward.py:990).

    Subclasses override :meth:`U`, :meth:`U_adjoint`, :meth:`V`,
    :meth:`V_adjoint` (default: identity) and set ``self.mask`` (scalar or
    array of singular values). Closed-form ``prox_l2`` / ``A_dagger``.

    :Examples:

        Inpainting is decomposable (U = V = I, mask = singular values), so
        its pseudo-inverse is exact and closed-form:

        >>> import jax, jax.numpy as jnp
        >>> from deepinv_tpu.physics import Inpainting
        >>> physics = Inpainting(img_size=(1, 8, 8), mask=0.5,
        ...                      key=jax.random.key(0))
        >>> x = jax.random.uniform(jax.random.key(1), (1, 1, 8, 8))
        >>> y = physics.A(x)
        >>> x_obs = physics.A_dagger(y)  # exact on observed pixels
        >>> bool(jnp.allclose(physics.A(x_obs), y, atol=1e-6))
        True
    """

    def __init__(self, U=None, U_adjoint=None, V=None, V_adjoint=None, mask=1.0, **kwargs):
        super().__init__(**kwargs)
        self.U_fn = U
        self.U_adj_fn = U_adjoint
        self.V_fn = V
        self.V_adj_fn = V_adjoint
        self.mask = mask

    def U(self, x):
        return self.U_fn(x) if self.U_fn is not None else x

    def U_adjoint(self, y):
        return self.U_adj_fn(y) if self.U_adj_fn is not None else y

    def V(self, x):
        return self.V_fn(x) if self.V_fn is not None else x

    def V_adjoint(self, x):
        return self.V_adj_fn(x) if self.V_adj_fn is not None else x

    def A(self, x, **params):
        phys = self.update(**params)
        return phys.U(phys._mask_mul(phys.V_adjoint(x)))

    def A_adjoint(self, y, **params):
        phys = self.update(**params)
        return phys.V(phys._mask_mul(phys.U_adjoint(y), conj=True))

    def _mask_mul(self, x, conj: bool = False):
        m = self.mask
        if isinstance(m, (int, float)):
            return x * m
        m = jnp.conj(m) if (conj and jnp.iscomplexobj(m)) else m
        return x * m

    def prox_l2(self, z, y, gamma, **kwargs):
        """Closed-form prox via the SVD (reference forward.py:1212)."""
        if z is None or isinstance(z, (int, float)):
            fill = 0.0 if z is None else float(z)
            z = jax.tree_util.tree_map(lambda a: jnp.full_like(a, fill), self.A_adjoint(y))
        b = jax.tree_util.tree_map(
            lambda a, c: a + _inv_gamma_mul(gamma, c), self.A_adjoint(y), z
        )
        m = self.mask
        if isinstance(m, (int, float)):
            m2 = m**2
        else:
            m2 = jnp.real(jnp.conj(m) * m)
        vb = self.V_adjoint(b)
        scaling = _add_inv_gamma(m2, gamma, _leaf_ndim(vb))
        x = self.V(jax.tree_util.tree_map(lambda a: a / scaling, vb))
        return x

    def A_dagger(self, y, **kwargs):
        """Closed-form pseudo-inverse (reference forward.py:1236)."""
        m = self.mask
        if isinstance(m, (int, float)):
            minv = 0.0 if abs(m) <= 1e-5 else 1.0 / m
            return self.V(self.U_adjoint(y) * minv)
        am = jnp.abs(m)
        minv = jnp.where(am > 1e-5, 1.0 / jnp.where(am > 1e-5, m, 1.0), 0.0)
        return self.V(jax.tree_util.tree_map(lambda a: a * minv, self.U_adjoint(y)))


def _leaf_ndim(tree):
    return jax.tree_util.tree_leaves(tree)[0].ndim


def _inv_gamma_mul(gamma, x):
    g = jnp.asarray(gamma)
    if g.ndim > 0 and g.ndim < x.ndim:
        g = g.reshape(g.shape + (1,) * (x.ndim - g.ndim))
    return x / g


def _add_inv_gamma(m2, gamma, ndim):
    g = jnp.asarray(gamma)
    m2 = jnp.asarray(m2)
    if g.ndim > 0 and m2.ndim > g.ndim:
        g = g.reshape(g.shape + (1,) * (m2.ndim - g.ndim))
    return m2 + 1.0 / g


class Denoising(DecomposablePhysics):
    """Identity forward operator (reference forward.py:1255)."""

    def __init__(self, noise_model=None, **kwargs):
        super().__init__(mask=1.0, noise_model=noise_model, **kwargs)


# ---------------------------------------------------------------------------
# Composition and stacking
# ---------------------------------------------------------------------------


class ComposedPhysics(Physics):
    """``A = A_k ∘ ... ∘ A_1`` (reference ComposedPhysics forward.py:865).

    ``physics_list[0]`` is applied first.
    """

    def __init__(self, physics_list: Sequence[Physics], **kwargs):
        super().__init__(**kwargs)
        self.physics_list = list(physics_list)
        # noise/sensor of the outermost physics applies
        self.noise_model = physics_list[-1].noise_model
        self.sensor_model = physics_list[-1].sensor_model

    def A(self, x, **params):
        for p in self.physics_list:
            x = p.A(x, **params)
        return x

    def A_dagger(self, y, **params):
        for p in reversed(self.physics_list):
            y = p.A_dagger(y, **params)
        return y


class ComposedLinearPhysics(ComposedPhysics, LinearPhysics):
    def __init__(self, physics_list, **kwargs):
        ComposedPhysics.__init__(self, physics_list, **kwargs)
        self.adj_fn = None
        self.img_shape = None

    def A_adjoint(self, y, **params):
        for p in reversed(self.physics_list):
            y = p.A_adjoint(y, **params)
        return y

    def A_dagger(self, y, **params):
        # (A_k ... A_1)^dagger != A_1^dagger ... A_k^dagger in general:
        # solve the least-squares problem on the composed operator.
        return LinearPhysics.A_dagger(self, y, **params)

    def prox_l2(self, z, y, gamma, **kwargs):
        return LinearPhysics.prox_l2(self, z, y, gamma, **kwargs)


def compose(*physics: Physics, **kwargs) -> Physics:
    """Compose physics: ``compose(p1, p2).A(x) == p2.A(p1.A(x))``
    (reference forward.py:970)."""
    flat = []
    for p in physics:
        if isinstance(p, ComposedPhysics):
            flat.extend(p.physics_list)
        else:
            flat.append(p)
    if all(isinstance(p, LinearPhysics) for p in flat):
        return ComposedLinearPhysics(flat, **kwargs)
    return ComposedPhysics(flat, **kwargs)


class StackedPhysics(Physics):
    """``A(x) = [A_1(x), ..., A_k(x)]`` returning a TensorList
    (reference forward.py:1380)."""

    def __init__(self, physics_list: Sequence[Physics], **kwargs):
        super().__init__(**kwargs)
        self.physics_list = list(physics_list)

    def A(self, x, **params):
        return TensorList([p.A(x, **params) for p in self.physics_list])

    def noise(self, y, key=None):
        key = ensure_key(key, 0)
        keys = jax.random.split(key, len(self.physics_list))
        return TensorList(
            [p.noise(yi, key=k) for p, yi, k in zip(self.physics_list, y, keys)]
        )

    def sensor(self, y):
        return TensorList([p.sensor(yi) for p, yi in zip(self.physics_list, y)])

    def __getitem__(self, i):
        return self.physics_list[i]

    def __len__(self):
        return len(self.physics_list)


class StackedLinearPhysics(StackedPhysics, LinearPhysics):
    """Stacked linear physics: adjoint is the sum of per-operator adjoints
    (reference forward.py:1479)."""

    def __init__(self, physics_list, **kwargs):
        StackedPhysics.__init__(self, physics_list, **kwargs)
        self.adj_fn = None
        self.img_shape = None

    def A_adjoint(self, y, **params):
        outs = [p.A_adjoint(yi, **params) for p, yi in zip(self.physics_list, y)]
        tot = outs[0]
        for o in outs[1:]:
            tot = jax.tree_util.tree_map(jnp.add, tot, o)
        return tot


def stack(*physics: Physics, **kwargs) -> StackedPhysics:
    """Stack physics into a multi-measurement operator (forward.py:1365).

    :Examples:

        Measurements of a stacked operator are a :class:`TensorList` (one
        entry per sub-operator, arbitrary shapes); the stacked adjoint sums
        the sub-adjoints:

        >>> import jax
        >>> from deepinv_tpu.physics import Denoising, Downsampling, stack
        >>> p = stack(Denoising(), Downsampling(img_size=(1, 8, 8), factor=2))
        >>> x = jax.random.uniform(jax.random.key(0), (1, 1, 8, 8))
        >>> y = p.A(x)
        >>> [tuple(v.shape) for v in y]
        [(1, 1, 8, 8), (1, 1, 4, 4)]
        >>> p.A_adjoint(y).shape
        (1, 1, 8, 8)
    """
    flat = []
    for p in physics:
        if isinstance(p, StackedPhysics):
            flat.extend(p.physics_list)
        else:
            flat.append(p)
    if all(isinstance(p, LinearPhysics) for p in flat):
        return StackedLinearPhysics(flat, **kwargs)
    return StackedPhysics(flat, **kwargs)
