"""Core module/pytree/TensorList tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepinv_tpu.core import (
    Module,
    TensorList,
    tree_vdot,
    tree_norm,
    power_method,
    randn_like,
)
from conftest import assert_close


class Toy(Module):
    def __init__(self, w, name="toy"):
        self.w = jnp.asarray(w)
        self.name = name
        self.scale = 2.0


def test_module_pytree_roundtrip():
    m = Toy([1.0, 2.0])
    leaves, treedef = jax.tree_util.tree_flatten(m)
    assert len(leaves) == 1
    m2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert m2.name == "toy" and m2.scale == 2.0
    assert_close(m2.w, m.w)


def test_module_jit_cache():
    m = Toy([1.0, 2.0])
    calls = []

    @jax.jit
    def f(mod, x):
        calls.append(1)
        return mod.w @ x + mod.scale

    x = jnp.ones(2)
    f(m, x)
    f(Toy([3.0, 4.0]), x)  # same static aux, new leaves -> no retrace
    assert len(calls) == 1
    f(Toy([1.0, 2.0], name="other"), x)  # different static -> retrace
    assert len(calls) == 2


def test_module_grad():
    m = Toy([1.0, 2.0])

    def loss(mod):
        return jnp.sum(mod.w**2)

    g = jax.grad(loss)(m)
    assert_close(g.w, 2 * m.w)
    assert g.name == "toy"


def test_module_replace():
    m = Toy([1.0, 2.0])
    m2 = m.replace(w=jnp.zeros(2))
    assert_close(m2.w, jnp.zeros(2))
    assert_close(m.w, jnp.array([1.0, 2.0]))
    with pytest.raises(AttributeError):
        m.replace(nonexistent=1)


def test_tensorlist_arithmetic():
    a = TensorList([jnp.ones((2, 3)), jnp.ones((4,))])
    b = TensorList([jnp.full((2, 3), 2.0), jnp.full((4,), 3.0)])
    c = a + b
    assert_close(c[0], jnp.full((2, 3), 3.0))
    d = 2 * a - b / b + a * 3
    assert_close(d[1], jnp.full((4,), 4.0))
    assert_close((-a)[0], -jnp.ones((2, 3)))
    assert float(a.sum()) == 10.0
    assert a.flatten().shape == (10,)


def test_tensorlist_pytree():
    a = TensorList([jnp.ones((2, 3)), jnp.ones((4,))])
    doubled = jax.tree_util.tree_map(lambda v: v * 2, a)
    assert isinstance(doubled, TensorList)
    assert_close(doubled[1], jnp.full((4,), 2.0))

    @jax.jit
    def f(tl):
        return tl + 1

    out = f(a)
    assert isinstance(out, TensorList)


def test_tree_linalg():
    t1 = {"a": jnp.array([1.0, 2.0]), "b": jnp.array([[3.0]])}
    t2 = {"a": jnp.array([4.0, 5.0]), "b": jnp.array([[6.0]])}
    assert float(tree_vdot(t1, t2)) == 1 * 4 + 2 * 5 + 3 * 6
    assert abs(float(tree_norm(t1)) - np.sqrt(14)) < 1e-6


def test_power_method():
    key = jax.random.key(0)
    M = jax.random.normal(key, (8, 8))
    S = M @ M.T  # PSD
    lam = power_method(lambda v: S @ v, jnp.ones(8), max_iter=500, tol=1e-10)
    lam_ref = float(np.linalg.eigvalsh(np.asarray(S)).max())
    assert abs(float(lam) - lam_ref) / lam_ref < 1e-4


def test_randn_like_complex():
    y = {"r": jnp.zeros((2, 3)), "c": jnp.zeros((4,), jnp.complex64)}
    out = randn_like(jax.random.key(0), y)
    assert out["c"].dtype == jnp.complex64
    assert out["r"].shape == (2, 3)


def test_profiling_helpers():
    from deepinv_tpu.utils import compiled_cost, timeit
    import jax.numpy as jnp

    f = lambda a, b: a @ b
    a = jnp.ones((64, 64))
    cost = compiled_cost(f, a, a)
    assert cost.get("flops", 0) > 0
    t = timeit(f, a, a, repeats=2)
    assert t > 0


def test_native_image_loader(tmp_path):
    """C++ decoder is bit-exact vs PIL on PNG; prefetcher covers all batches."""
    np_mod = __import__("numpy")
    from PIL import Image as PILImage
    from deepinv_tpu.native import (
        native_available, decode_image, decode_batch, NativePrefetcher,
    )

    if not native_available():
        import pytest as _pytest
        _pytest.skip("no native toolchain")

    rng = np_mod.random.default_rng(0)
    paths = []
    for i in range(5):
        a = (rng.uniform(0, 1, (40, 52, 3)) * 255).astype(np_mod.uint8)
        p = str(tmp_path / f"{i}.png")
        PILImage.fromarray(a).save(p)
        paths.append(p)

    ref = np_mod.asarray(PILImage.open(paths[0]), np_mod.float32).transpose(2, 0, 1) / 255.0
    out = decode_image(paths[0], (3, 40, 52), mode="crop")
    assert np_mod.abs(out - ref).max() == 0.0

    b = decode_batch(paths, (3, 32, 32))
    assert b.shape == (5, 3, 32, 32) and b.dtype == np_mod.float32

    pf = NativePrefetcher(paths, 2, (3, 16, 16))
    sizes = [x.shape[0] for x in pf]
    assert sizes == [2, 2, 1]

    from deepinv_tpu.datasets import ImageFolder

    ds = ImageFolder(str(tmp_path), size=(40, 52))
    x = ds[0]
    assert np_mod.abs(x - ref).max() < 1e-6  # same-size bilinear resize is the identity
    batches = list(ds.batches(3))
    assert [bb.shape[0] for bb in batches] == [3, 2]


def test_deprecation_decorators():
    """utils/decorators.py mirrors reference utils/decorators.py semantics:
    renamed kwargs forward with a warning, dropped kwargs vanish, redirect
    forwards calls, attribute access warns but works."""
    import warnings
    import pytest as _pytest
    from deepinv_tpu.utils import (
        deprecated_alias, deprecated_argument, deprecated_func,
        deprecated_class, deprecated_func_replaced_by, deprecate_attribute,
    )

    @deprecated_alias(old="new")
    def f(new=1):
        return new

    with _pytest.warns(DeprecationWarning):
        assert f(old=5) == 5
    with _pytest.raises(TypeError):
        f(old=1, new=2)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert f(new=3) == 3  # no warning on the new name

    @deprecated_argument("legacy")
    def g(x):
        return x

    with _pytest.warns(DeprecationWarning):
        assert g(2, legacy=9) == 2

    @deprecated_func
    def h():
        return "ok"

    with _pytest.warns(DeprecationWarning):
        assert h() == "ok"

    @deprecated_class
    class C:
        def __init__(self, v):
            self.v = v

    with _pytest.warns(DeprecationWarning):
        assert C(4).v == 4

    def new_fn(x):
        return x * 2

    @deprecated_func_replaced_by(new_fn, redirect=True, since="0.1", remove_in="0.3")
    def old_fn(x):
        raise AssertionError("should have been redirected")

    with _pytest.warns(DeprecationWarning, match="new_fn"):
        assert old_fn(3) == 6

    class Holder:
        pass

    ho = Holder()
    deprecate_attribute(
        ho, attr_name="field", attr_underscore_name="_field",
        attr_initial_value=7, deprecation_message="field is deprecated",
    )
    with _pytest.warns(DeprecationWarning):
        assert ho.field == 7
    with _pytest.warns(DeprecationWarning):
        ho.field = 8
    assert ho._field == 8


def test_partition_and_combine_roundtrip():
    """partition_arrays/combine split a module into (arrays, static) and
    reassemble it bit-identically — the pattern jitted optimizers use to
    treat modules as parameter pytrees."""
    from deepinv_tpu.core import combine, partition_arrays
    from deepinv_tpu.models import DnCNN

    m = DnCNN(1, 1, depth=3, nf=4)
    arrays, static = partition_arrays(m)
    leaves = jax.tree_util.tree_leaves(arrays)
    assert all(hasattr(l, "dtype") for l in leaves)
    m2 = combine(arrays, static)
    x = jnp.ones((1, 1, 8, 8))
    assert jnp.allclose(m(x, 0.1), m2(x, 0.1))


def test_module_update_functional_semantics():
    """Module.update returns a NEW module; the original is untouched —
    functional parameter updates are the JAX-native replacement for the
    reference's in-place mutation."""
    from deepinv_tpu.models import Conv2d

    c = Conv2d(2, 2, 3)
    w0 = c.weight
    c2 = c.update(weight=w0 * 0.0)
    assert float(jnp.max(jnp.abs(c2.weight))) == 0.0
    assert float(jnp.max(jnp.abs(c.weight - w0))) == 0.0


def test_tree_helpers_complex_consistency():
    """tree_vdot/tree_norm/tree_axpy on mixed real/complex pytrees follow
    the inner-product conventions the Krylov solvers rely on."""
    from deepinv_tpu.core import (tree_axpy, tree_norm, tree_real_vdot,
                                  tree_vdot)

    a = {"r": jnp.asarray([1.0, 2.0]), "c": jnp.asarray([1 + 1j, 0 + 2j])}
    b = {"r": jnp.asarray([3.0, -1.0]), "c": jnp.asarray([2 - 1j, 1j])}
    v = tree_vdot(a, b)
    want = (1 * 3 + 2 * (-1)) + ((1 - 1j) * (2 - 1j) + (0 - 2j) * 1j)
    assert abs(complex(v) - complex(want)) < 1e-6
    assert abs(float(tree_real_vdot(a, b)) - complex(want).real) < 1e-6
    n2 = float(tree_norm(a)) ** 2
    assert abs(n2 - (1 + 4 + 2 + 4)) < 1e-5
    s = tree_axpy(2.0, a, b)
    assert jnp.allclose(s["r"], jnp.asarray([5.0, 3.0]))


def test_epoch_key_streams_are_disjoint():
    """epoch_key(seed, epoch) derives independent per-epoch streams —
    reproducible per epoch, different across epochs."""
    from deepinv_tpu.core import epoch_key

    k1 = epoch_key(jax.random.key(0), 1)
    k1b = epoch_key(jax.random.key(0), 1)
    k2 = epoch_key(jax.random.key(0), 2)
    a = jax.random.normal(k1, (4,))
    assert jnp.allclose(a, jax.random.normal(k1b, (4,)))
    assert not jnp.allclose(a, jax.random.normal(k2, (4,)))


def test_power_method_matches_dense_eigenvalue():
    """power_method on A^T A returns the dominant eigenvalue to 1e-3
    relative against numpy's eigvalsh."""
    from deepinv_tpu.core import power_method

    rng = np.random.default_rng(0)
    M = jnp.asarray(rng.standard_normal((12, 12)), jnp.float32)
    A = M.T @ M
    lam = float(power_method(lambda v: (v.reshape(1, -1) @ A.T).reshape(v.shape),
                             jnp.ones((1, 12)), max_iter=500, tol=1e-9))
    want = float(np.linalg.eigvalsh(np.asarray(A)).max())
    assert abs(lam - want) / want < 1e-3
