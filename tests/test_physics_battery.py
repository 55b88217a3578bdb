"""Physics battery extension: the reference families beyond the universal
invariant battery (deepinv/tests/test_physics.py) — differentiability and
clone sweeps over the SAME operator registry, operator composition,
multiscale/cropper wrappers, automatic adjoints, separate noise models.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from test_physics import OPERATORS, find_operator, rand_x

# subset where a full grad sweep is cheap enough for the quick gate: one
# representative per operator family (the full registry runs adjointness
# etc. in test_physics.py)
_GRAD_OPS = [
    "denoising", "blur_circular", "blur_fft", "downsampling_circular",
    "upsampling", "inpainting", "demosaicing", "mri", "ct",
    "compressed_sensing", "super_resolution", "pansharpen",
]
_GRAD_OPS = [n for n in _GRAD_OPS if n in OPERATORS]


@pytest.mark.parametrize("name", _GRAD_OPS)
def test_operator_differentiability(name, key):
    """grad_x ||A(x)||^2 is finite and equals 2 A^T A x for linear
    operators (reference test_operators_differentiability:1729)."""
    physics, imsize = find_operator(name)
    x = rand_x(key, (1,) + imsize, name)

    def f(v):
        y = physics.A(v)
        leaves = jax.tree_util.tree_leaves(y)
        return sum(jnp.sum(jnp.abs(l.astype(jnp.complex64)) ** 2).real
                   if jnp.iscomplexobj(l) else jnp.sum(l ** 2)
                   for l in leaves)

    g = jax.grad(f)(x)
    assert g.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(jnp.abs(g)))), name
    if hasattr(physics, "A_adjoint"):
        want = 2.0 * physics.A_adjoint(physics.A(x))
        if not jnp.iscomplexobj(want) and want.shape == g.shape:
            err = float(jnp.max(jnp.abs(g - want)))
            scale = float(jnp.max(jnp.abs(want))) + 1e-9
            assert err / scale < 1e-3, (name, err / scale)


@pytest.mark.parametrize("name", _GRAD_OPS)
def test_clone_independence(name, key):
    """clone() produces an operator with identical behavior whose updates
    do not affect the original (reference test_clone:2121)."""
    physics, imsize = find_operator(name)
    c = physics.clone()
    x = rand_x(key, (1,) + imsize, name)
    ya = physics.A(x)
    yb = c.A(x)
    for a, b in zip(jax.tree_util.tree_leaves(ya),
                    jax.tree_util.tree_leaves(yb)):
        assert np.allclose(np.asarray(a), np.asarray(b)), name


def test_composed_physics_semantics(key):
    """physics1 * physics2 applies physics2 FIRST (reference
    test_composed_physics:2004): A = A1(A2(x)), adjoint composes in
    reverse, and the composition is itself a valid linear physics."""
    from deepinv_tpu.ops import gaussian_blur
    from deepinv_tpu.physics import Blur, Downsampling

    b = Blur(filter=gaussian_blur(sigma=1.0), padding="circular")
    d = Downsampling(img_size=(1, 16, 16), factor=2)
    comp = b * d
    x = jax.random.uniform(key, (1, 1, 16, 16))
    want = b.A(d.A(x))
    got = comp.A(x)
    assert float(jnp.max(jnp.abs(got - want))) < 1e-5
    # adjointness of the composition
    err = comp.adjointness_test(x, key=jax.random.key(1))
    assert abs(complex(err)) < 1e-3
    # adjoint equals the reverse composition
    y = comp.A(x)
    a1 = comp.A_adjoint(y)
    a2 = d.A_adjoint(b.A_adjoint(y))
    assert float(jnp.max(jnp.abs(a1 - a2))) < 1e-5


@pytest.mark.parametrize("factory", ["blur", "blur_fft", "inpainting"])
def test_multiscale_coarse_adjointness(factory, key):
    """PhysicsMultiScaler at a coarse scale remains a valid linear
    operator (reference test_multiscale_coarse_adjointness:2404)."""
    from deepinv_tpu.ops import gaussian_blur
    from deepinv_tpu.physics import (Blur, BlurFFT, Inpainting,
                                     to_multiscale)

    imsize = (1, 32, 32)
    physics = {
        "blur": lambda: Blur(filter=gaussian_blur(sigma=1.0),
                             padding="circular"),
        "blur_fft": lambda: BlurFFT(img_size=imsize,
                                    filter=gaussian_blur(sigma=1.0)),
        "inpainting": lambda: Inpainting(img_size=imsize, mask=0.7,
                                         key=jax.random.key(0)),
    }[factory]()
    ms = to_multiscale(physics, img_size=imsize)
    for scale in (1, 2, 3):
        coarse = ms.with_scale(scale)
        factor = (2, 4, 8)[scale - 1]
        hw = (imsize[0], imsize[1] // factor, imsize[2] // factor)
        u = jax.random.uniform(jax.random.fold_in(key, scale), (1,) + hw)
        # coarse input maps to the NATIVE measurement space; adjoint maps
        # back to the coarse grid — check the inner-product identity
        y = coarse.A(u)
        v = jax.random.normal(jax.random.key(3), y.shape)
        lhs = float(jnp.vdot(y, v).real)
        rhs = float(jnp.vdot(u, coarse.A_adjoint(v)).real)
        assert abs(lhs - rhs) < 1e-3 * max(1.0, abs(lhs)), (factory, scale)


def test_physics_cropper(key):
    """PhysicsCropper restricts the operator to a crop window and stays a
    valid linear operator (reference test_operator_cropper:857)."""
    from deepinv_tpu.physics import Denoising, PhysicsCropper

    p = PhysicsCropper(Denoising(), crop=(4, 2))
    x = jax.random.uniform(key, (1, 1, 16, 16))
    y = p.A(x)
    assert y.shape[-2:] == (12, 14)  # top-4 rows / left-2 cols dropped
    assert float(jnp.max(jnp.abs(y - x[..., 4:, 2:]))) < 1e-6
    err = p.adjointness_test(x, key=jax.random.key(1))
    assert abs(complex(err)) < 1e-3


def test_automatic_A_adjoint_via_vjp(key):
    """A physics defined only by A gets a correct adjoint via autodiff
    (reference test_automatic_A_adjoint:2486)."""
    from deepinv_tpu.physics import LinearPhysics

    w = jax.random.normal(key, (12, 16))

    class MatmulPhysics(LinearPhysics):
        def __init__(self):
            # no A_adjoint given: the base derives it from A via autodiff,
            # needing only the input shape
            super().__init__(img_shape=(1, 1, 4, 4))

        def A(self, x, **kw):
            return (x.reshape(x.shape[0], -1) @ w.T).reshape(x.shape[0], 1,
                                                             3, 4)

    p = MatmulPhysics()
    x = jax.random.uniform(jax.random.key(1), (2, 1, 4, 4))
    y = p.A(x)
    xa = p.A_adjoint(y)
    assert xa.shape == x.shape
    want = (y.reshape(2, -1) @ w).reshape(2, 1, 4, 4)
    assert float(jnp.max(jnp.abs(xa - want))) < 1e-5


def test_separate_noise_models_on_stack(key):
    """Each member of a stacked physics keeps its own noise model
    (reference test_separate_noise_models:2533)."""
    from deepinv_tpu.physics import Denoising, GaussianNoise, stack

    p1 = Denoising(noise_model=GaussianNoise(sigma=0.0))
    p2 = Denoising(noise_model=GaussianNoise(sigma=1.0))
    sp = stack(p1, p2)
    x = jnp.ones((1, 1, 16, 16)) * 0.5
    y = sp(x, key=key)
    n1 = float(jnp.std(y[0] - x))
    n2 = float(jnp.std(y[1] - x))
    assert n1 < 1e-6 and n2 > 0.5, (n1, n2)


def test_squared_vs_nonsquared_norm(key):
    """compute_norm returns ||A||^2 consistent with the power-iteration
    spectral norm of A^T A (reference test_squared_or_non_squared_norms:
    2650)."""
    from deepinv_tpu.ops import gaussian_blur
    from deepinv_tpu.physics import BlurFFT

    p = BlurFFT(img_size=(1, 16, 16), filter=gaussian_blur(sigma=1.0))
    n2 = float(p.compute_norm(jax.random.normal(key, (1, 1, 16, 16))))
    # power-iterate A^T A directly
    v = jax.random.normal(key, (1, 1, 16, 16))
    for _ in range(50):
        v = p.A_adjoint(p.A(v))
        v = v / jnp.linalg.norm(v)
    lam = float(jnp.vdot(v, p.A_adjoint(p.A(v))).real)
    assert abs(n2 - lam) / lam < 1e-2, (n2, lam)


def test_inpainting_noise_domain(key):
    """No noise outside the operator's support: in y = Ax + n, n = 0
    wherever the mask zeroes Ax (reference test_noise_domain:1309)."""
    from deepinv_tpu.physics import GaussianNoise, Inpainting

    x = jnp.ones((1, 3, 12, 7))
    mask = jnp.ones((3, 12, 7))
    mask = mask.at[0, 0, 0].set(0).at[1, 1, 1].set(0).at[2, 2, 2].set(0)
    physics = Inpainting(img_size=(3, 12, 7), mask=mask,
                         noise_model=GaussianNoise(sigma=0.2))
    y = physics(x, key=key)
    assert y.shape == x.shape
    assert float(y[0, 0, 0, 0]) == 0.0
    assert float(y[0, 1, 1, 1]) == 0.0
    assert float(y[0, 2, 2, 2]) == 0.0
    # and noise IS present inside the support
    assert float(jnp.std(y - x)) > 0.01


@pytest.mark.parametrize("img_size,filter_size", [
    ((1, 16, 16), (5, 5)), ((3, 17, 17), (6, 6)), ((1, 16, 17), (6, 5)),
])
def test_blur_shape_matrix(img_size, filter_size, key):
    """Blur over even/odd image x even/odd filter combinations: valid-mode
    output shapes follow H-h+1 and adjointness holds (reference
    test_blur:1339)."""
    from deepinv_tpu.physics import Blur

    kf, kx = jax.random.split(key)
    f = jnp.abs(jax.random.normal(kf, (1, 1) + filter_size))
    f = f / jnp.sum(f)
    physics = Blur(filter=f, padding="valid")
    x = jax.random.uniform(kx, (1,) + img_size)
    y = physics.A(x)
    H, W = img_size[-2:]
    h, w = filter_size
    assert y.shape[-2:] == (H - h + 1, W - w + 1)
    err = physics.adjointness_test(x, key=jax.random.key(1))
    assert abs(complex(err)) < 1e-3


def test_physics_noise_reset_reproducibility(key):
    """The same key reproduces the same noisy measurement; different keys
    differ (reference test_reset_noise:1380, key-based in JAX)."""
    from deepinv_tpu.physics import Denoising, GaussianNoise

    p = Denoising(noise_model=GaussianNoise(sigma=0.1))
    x = jnp.ones((1, 1, 8, 8)) * 0.5
    y1 = p(x, key=key)
    y2 = p(x, key=key)
    y3 = p(x, key=jax.random.key(123))
    assert np.allclose(np.asarray(y1), np.asarray(y2))
    assert not np.allclose(np.asarray(y1), np.asarray(y3))


@pytest.mark.parametrize("name", ["blur_circular", "inpainting", "mri"])
def test_physics_pickle_state_roundtrip(name, key):
    """Physics pytrees serialize and restore bit-identically (reference
    test_physics_state_dict:1948 — pickle here, the JAX-native analogue of
    the torch state_dict round-trip)."""
    import pickle

    physics, imsize = find_operator(name)
    blob = pickle.dumps(physics)
    restored = pickle.loads(blob)
    x = rand_x(key, (1,) + imsize, name)
    ya = physics.A(x)
    yb = restored.A(x)
    for a, b in zip(jax.tree_util.tree_leaves(ya),
                    jax.tree_util.tree_leaves(yb)):
        assert np.array_equal(np.asarray(a), np.asarray(b)), name
