"""Vector-space operations over arbitrary pytrees.

The reference's Krylov solvers (deepinv/optim/linear/least_squares.py) and
power method (deepinv/physics/functional/matrix.py:44) implement dot/norm by
special-casing ``TensorList``. Here every solver works on *any pytree* of
arrays (single array, TensorList, nested dicts), because inner products and
axpy are defined tree-wide. This is what lets the same CG run on stacked
physics, complex MRI k-space, or multi-leaf model states unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "tree_add",
    "tree_sub",
    "tree_scale",
    "tree_axpy",
    "tree_vdot",
    "tree_norm",
    "tree_zeros_like",
    "tree_conj",
    "tree_real_vdot",
    "power_method",
]


def tree_add(a, b):
    return jax.tree_util.tree_map(jnp.add, a, b)


def tree_sub(a, b):
    return jax.tree_util.tree_map(jnp.subtract, a, b)


def tree_scale(alpha, a):
    return jax.tree_util.tree_map(lambda x: alpha * x, a)


def tree_axpy(alpha, x, y):
    """y + alpha * x, leafwise (alpha scalar)."""
    return jax.tree_util.tree_map(lambda xi, yi: yi + alpha * xi, x, y)


def tree_vdot(a, b):
    """Sum of <a_i, b_i> with complex conjugation on ``a`` (like jnp.vdot)."""
    leaves_a = jax.tree_util.tree_leaves(a)
    leaves_b = jax.tree_util.tree_leaves(b)
    return sum(jnp.vdot(x, y) for x, y in zip(leaves_a, leaves_b))


def tree_real_vdot(a, b):
    """Real part of the tree inner product (the Hilbert-space pairing)."""
    return jnp.real(tree_vdot(a, b))


def tree_norm(a):
    return jnp.sqrt(tree_real_vdot(a, a))


def tree_zeros_like(a):
    return jax.tree_util.tree_map(jnp.zeros_like, a)


def tree_conj(a):
    return jax.tree_util.tree_map(jnp.conj, a)


def power_method(op, x0, max_iter: int = 100, tol: float = 1e-6):
    """Largest eigenvalue of a PSD operator ``op`` by power iteration.

    TPU-native port of the reference power method
    (deepinv/physics/functional/matrix.py:44, used by
    ``LinearPhysics.compute_norm`` deepinv/physics/forward.py:605).
    Runs as a ``lax.while_loop`` so it compiles to one XLA program; the
    tolerance check is carried in the loop state instead of Python control
    flow.

    Returns the spectral norm estimate ``lambda_max`` (scalar array).
    """
    # a zero seed (e.g. prox called on a zeros init) would collapse the
    # iteration to lambda=0; fall back to a ones seed jit-safely
    n_seed = tree_norm(x0)
    x0 = jax.tree_util.tree_map(
        lambda v: jnp.where(n_seed > 0, v, jnp.ones_like(v)), x0
    )
    # one eager power step first: it promotes the seed to op's output dtype
    # (e.g. A^T A of a complex-valued operator on a real seed) so the
    # while_loop carry dtype is stable. eval_shape is NOT used — its extra
    # trace poisons operators that lazily cache arrays on first call.
    x0 = op(x0)
    x0 = jax.tree_util.tree_map(
        lambda v: v / jnp.maximum(tree_norm(x0), 1e-30), x0
    )

    def cond(state):
        _, lam, lam_prev, it = state
        rel = jnp.abs(lam - lam_prev) / jnp.maximum(jnp.abs(lam), 1e-30)
        return jnp.logical_and(it < max_iter, rel > tol)

    def body(state):
        x, lam, _, it = state
        y = op(x)
        lam_new = tree_real_vdot(x, y)
        ny = tree_norm(y)
        x_new = jax.tree_util.tree_map(lambda v: v / jnp.maximum(ny, 1e-30), y)
        return (x_new, lam_new, lam, it + 1)

    init = (x0, jnp.asarray(0.0), jnp.asarray(jnp.inf), jnp.asarray(0))
    _, lam, _, _ = jax.lax.while_loop(cond, body, init)
    return lam


def transpose_primal(cotangent, shape, dtype=None):
    """``ShapeDtypeStruct`` for a ``jax.linear_transpose`` primal that
    inherits the cotangent's varying-manual-axes (vma).

    Under ``shard_map`` (vma tracking on, the jax default) a fresh
    ``ShapeDtypeStruct`` is *unvaried*: tracing the forward then inserts an
    implicit ``pvary`` on the primal, whose transpose is a ``lax.psum`` over
    the mesh axes — silently turning a device-local adjoint into a
    cross-device sum (observed as an axis_size-fold overcount in the
    operator-parallel adjoint). Matching the cotangent's vma keeps the
    transpose device-local; callers insert their own explicit ``psum`` where
    a cross-device reduction is actually meant. Outside ``shard_map`` the
    vma set is empty and this is identical to a plain ``ShapeDtypeStruct``.
    """
    vma = getattr(jax.typeof(cotangent), "vma", frozenset())
    dtype = dtype if dtype is not None else cotangent.dtype
    if vma:
        # linear_transpose rejects ShapeDtypeStruct(vma=...); a concrete
        # zeros primal cast to 'varying' carries the vma instead (free at
        # trace time — only its aval is used)
        return jax.lax.pcast(jnp.zeros(tuple(shape), dtype), tuple(vma),
                             to="varying")
    return jax.ShapeDtypeStruct(tuple(shape), dtype)
