"""Group-action transforms (reference deepinv/tests/test_transform.py).

Property tests over the transform zoo: inverse ∘ transform = identity for
exact actions, approximate identity for interpolating warps, chain/stack
algebra shapes, symmetrize averaging, and jit compatibility.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepinv_tpu.transform import (
    Transform,
    Shift,
    Rotate,
    Scale,
    Reflect,
    Homography,
    Affine,
    Similarity,
    Euclidean,
    PanTiltRotate,
    ShiftTime,
    RandomNoise,
    CPABDiffeomorphism,
)


@pytest.fixture
def x():
    # smooth image so bilinear-warp round trips stay accurate
    yy, xx = np.mgrid[0:32, 0:32] / 32.0
    img = np.stack(
        [np.sin(4 * np.pi * xx) * np.cos(2 * np.pi * yy), xx * yy, (xx + yy) / 2]
    )
    return jnp.asarray(img, jnp.float32)[None]


EXACT = [
    Shift(),
    Rotate(multiples=90),
    Reflect(dim=(-2, -1)),
]


@pytest.mark.parametrize("t", EXACT, ids=lambda t: type(t).__name__)
def test_exact_inverse(t, x, key):
    p = t.get_params(x, key)
    xt = t.transform(x, **p)
    back = t.inverse(xt, **p)
    assert np.allclose(back, x, atol=1e-6)


def test_rotate_arbitrary_angle_inverse(x, key):
    t = Rotate(multiples=17.0, limits=68.0)
    p = t.get_params(x, key)
    xt = t.transform(x, **p)
    back = t.inverse(xt, **p)
    # bilinear warps only invert approximately; check the interior
    inner = (slice(None), slice(None), slice(8, 24), slice(8, 24))
    err = float(jnp.abs(back[inner] - x[inner]).mean())
    assert err < 0.06, err


def test_homography_inverse(x, key):
    # near-identity draws so param-negation inversion is a good inverse
    t = Homography(theta_max=2.0, theta_z_max=5.0, zoom_factor_min=0.95,
                   shift_max=0.05, skew_max=2.0,
                   x_stretch_factor_min=0.95, y_stretch_factor_min=0.95)
    p = t.get_params(x, key)
    assert set(p) == {"theta_x", "theta_y", "theta_z", "zoom_f", "shift_x",
                      "shift_y", "skew", "stretch_x", "stretch_y"}
    back = t.inverse(t.transform(x, **p), **p)
    inner = (slice(None), slice(None), slice(8, 24), slice(8, 24))
    assert float(jnp.abs(back[inner] - x[inner]).mean()) < 0.06


def test_homography_reciprocal_inversion(x, key):
    """zoom/stretch invert by reciprocal, the rest by negation (reference
    projective.py:240-247 TransformParam)."""
    t = Homography()
    p = t.get_params(x, key)
    pi = t.invert_params(p)
    for k in ("zoom_f", "stretch_x", "stretch_y"):
        assert np.allclose(np.asarray(p[k]) * np.asarray(pi[k]), 1.0, atol=1e-6)
    for k in ("theta_x", "theta_y", "theta_z", "shift_x", "shift_y", "skew"):
        assert np.allclose(np.asarray(p[k]) + np.asarray(pi[k]), 0.0, atol=1e-6)


@pytest.mark.parametrize("cls_zeroed", [
    (Affine, ("theta_x", "theta_y")),
    (Similarity, ("theta_x", "theta_y", "skew")),
    (Euclidean, ("theta_x", "theta_y", "skew")),
    (PanTiltRotate, ("shift_x", "shift_y", "skew")),
], ids=lambda cz: cz[0].__name__)
def test_projective_subgroups(cls_zeroed, x, key):
    """Subgroups pin the right params to the identity and invert
    approximately (reference projective.py:297-444)."""
    cls, zeroed = cls_zeroed
    # param-negation inversion is approximate when draws combine (the
    # reference's semantics too) — keep draws near the identity
    t = cls(theta_z_max=6.0, shift_max=0.06, zoom_factor_min=0.95,
            theta_max=3.0) if cls is PanTiltRotate else cls(
        theta_z_max=6.0, shift_max=0.06, zoom_factor_min=0.95)
    p = t.get_params(x, key)
    for k in zeroed:
        assert np.allclose(np.asarray(p[k]), 0.0), k
    for k in ("stretch_x", "stretch_y"):
        if cls is not Affine:
            assert np.allclose(np.asarray(p[k]), 1.0), k
    if cls in (Euclidean, PanTiltRotate):
        assert np.allclose(np.asarray(p["zoom_f"]), 1.0)
    xt = t.transform(x, **p)
    assert xt.shape == x.shape
    back = t.inverse(xt, **p)
    inner = (slice(None), slice(None), slice(10, 22), slice(10, 22))
    assert float(jnp.abs(back[inner] - x[inner]).mean()) < 0.06


def test_pure_rotation_homography_matches_rotate(x, key):
    """A theta_z-only homography equals the plain Rotate warp on the
    interior (both are center rotations)."""
    from deepinv_tpu.transform import apply_homography

    angle = 23.0
    out_h = apply_homography(x, theta_z=-angle, padding="zeros")
    t = Rotate(multiples=1.0)
    out_r = t.transform(x, theta=jnp.array([angle]))
    inner = (slice(None), slice(None), slice(10, 22), slice(10, 22))
    assert float(jnp.abs(out_h[inner] - out_r[inner]).mean()) < 0.03


def test_scale_params_invert(x, key):
    t = Scale(factors=(0.5,))
    p = t.get_params(x, key)
    pi = t.invert_params(p)
    assert np.allclose(np.asarray(p["factor"]) * np.asarray(pi["factor"]), 1.0)
    assert t.transform(x, **p).shape == x.shape


def test_cpab_inverse(x, key):
    t = CPABDiffeomorphism()
    p = t.get_params(x, key)
    back = t.inverse(t.transform(x, **p), **p)
    inner = (slice(None), slice(None), slice(8, 24), slice(8, 24))
    assert float(jnp.abs(back[inner] - x[inner]).mean()) < 0.06


def test_shift_time(key):
    v = jnp.asarray(np.random.default_rng(0).random((2, 1, 6, 8, 8)), jnp.float32)
    # wrap padding is an exact group action (reference test_transform.py:274
    # also asserts invertibility only for padding='wrap')
    t = ShiftTime(padding="wrap")
    p = t.get_params(v, key)
    assert np.allclose(t.inverse(t.transform(v, **p), **p), v, atol=1e-6)
    # reflect (default): matches a numpy reference implementation
    tr = ShiftTime()
    out = tr.transform(v, t_shift=jnp.asarray([2, -1]))
    ref0 = np.pad(np.asarray(v[0]), [(0, 0), (5, 5), (0, 0), (0, 0)],
                  mode="reflect")
    ref0 = np.roll(ref0, 2, axis=1)[:, 5:11]
    assert np.allclose(out[0], ref0, atol=1e-6)


def test_n_trans_and_algebra(x, key):
    """t1 * t2 chains (n_trans multiplies), t1 + t2 stacks (n_trans adds) —
    reference base.py:319,346."""
    t1, t2 = Shift(n_trans=2), Reflect(dim=(-1,), n_trans=3)
    chain = t1 * t2
    assert chain.n_trans == 6
    out = chain(x, key=key)
    assert out.shape[0] == 6 * x.shape[0]
    stack = t1 + t2
    assert stack.n_trans == 5
    assert stack(x, key=key).shape[0] == 5 * x.shape[0]

    # chained inverse really undoes both actions
    p = chain.get_params(x, key)
    assert np.allclose(chain.inverse(chain.transform(x, **p), **p), x, atol=1e-6)


def test_symmetrize_identity_denoiser(x, key):
    """Symmetrizing the identity yields the identity for exact group
    actions (reference base.py:259)."""
    t = Rotate(multiples=90, n_trans=4)
    sym = t.symmetrize(lambda v: v)
    out = sym(x, key=key)
    assert out.shape == x.shape
    assert np.allclose(out, x, atol=1e-6)


def test_symmetrize_makes_equivariant(x, key):
    """A deliberately non-equivariant map becomes reflect-invariant after
    symmetrization over the full reflection subgroup."""
    mask = jnp.asarray(np.linspace(0, 1, 32), jnp.float32)[None, None, None, :]
    f = lambda v: v * mask  # breaks mirror symmetry

    class AllReflect(Reflect):
        def get_params(self, v, key=None):
            return {"flip": jnp.asarray([[0.0], [1.0]], jnp.float32)}

    t = AllReflect(dim=(-1,), n_trans=2)
    sym = t.symmetrize(f)
    out = sym(x, key=key)
    flipped_in = jnp.flip(x, axis=-1)
    out2 = sym(flipped_in, key=key)
    assert np.allclose(jnp.flip(out2, axis=-1), out, atol=1e-5)


def test_random_noise_transform(x, key):
    t = RandomNoise(sigma=0.1)
    p = t.get_params(x, key)
    xt = t.transform(x, **p)
    assert xt.shape == x.shape and float(jnp.abs(xt - x).std()) > 0.01
    # not a group action: inverse is identity on params
    assert np.allclose(t.inverse(xt, **t.invert_params(p)), xt)


def test_transforms_jit(x, key):
    """Transforms are pytrees: jit over (transform, image, key)."""
    t = Rotate(multiples=90)

    @jax.jit
    def apply(tr, v, k):
        p = tr.get_params(v, k)
        return tr.inverse(tr.transform(v, **p), **p)

    assert np.allclose(apply(t, x, key), x, atol=1e-6)
