"""Transform battery: the reference's combinatorial transform sweep
(deepinv/tests/test_transform.py TRANSFORMS x ADD_TIME_DIM, :180/:206) —
every transform and arithmetic combination, on images AND on videos
(flattened time dim), plus the identity-parameter family.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import deepinv_tpu.transform as T

# name -> factory; mirrors the reference's registry including arithmetic
# combinations (+ = stack, * = compose, | = either-or)
_TRANSFORMS = {
    "shift": lambda: T.Shift(),
    "rotate": lambda: T.Rotate(),
    "rotate-bilinear": lambda: T.Rotate(interpolation="bilinear"),
    "scale": lambda: T.Scale(),
    "reflect": lambda: T.Reflect(),
    "shift+scale": lambda: T.Shift() + T.Scale(),
    "shift*scale": lambda: T.Shift() * T.Scale(),
    "scale*rotate": lambda: T.Scale() * T.Rotate(),
    "scale|shift": lambda: T.Scale() | T.Shift(),
    "rotate|scale": lambda: T.Rotate() | T.Scale(),
    "shift+scale*rotate": lambda: T.Shift() + (T.Scale() * T.Rotate()),
    "shift*scale|rotate": lambda: (T.Shift() * T.Scale()) | T.Rotate(),
    "homography": lambda: T.Homography(),
    "euclidean": lambda: T.Euclidean(),
    "similarity": lambda: T.Similarity(),
    "affine": lambda: T.Affine(),
    "pantiltrotate": lambda: T.PanTiltRotate(),
    "diffeomorphism": lambda: T.CPABDiffeomorphism(),
    "randomnoise": lambda: T.RandomNoise(),
    "randomphaseerror": lambda: T.RandomPhaseError(),
    "identity": lambda: T.Identity(),
}


def _image(key, shape=(1, 1, 24, 24)):
    H, W = shape[-2:]
    yy, xx = jnp.mgrid[0:H, 0:W]
    x = ((yy - H / 2) ** 2 / 36 + (xx - W / 2) ** 2 / 25 < 1).astype(
        jnp.float32)
    return jnp.broadcast_to(x[None, None], shape) + 0.05 * jax.random.normal(
        key, shape)


@pytest.mark.parametrize("name", sorted(_TRANSFORMS))
def test_transform_sweep(name, key):
    """Every transform (incl. arithmetic combinations) maps an image batch
    to a finite result with the expected leading dim (reference
    test_transforms:180)."""
    t = _TRANSFORMS[name]()
    x = _image(key)
    out = t(x)
    assert out.shape[-2:] == x.shape[-2:], name
    assert out.shape[0] % x.shape[0] == 0, name
    assert bool(jnp.all(jnp.isfinite(out))), name


@pytest.mark.parametrize("name", ["shift", "rotate", "reflect", "scale",
                                  "homography", "euclidean"])
def test_transform_video_time_dim(name, key):
    """Transforms act on 5D videos (B, C, T, H, W) by flattening the time
    dim (reference ADD_TIME_DIM family, :180): each frame matches the
    transform of that frame alone under the same parameters."""
    t = _TRANSFORMS[name]()
    vid = _image(key, (1, 1, 24, 24))[:, :, None].repeat(3, axis=2)
    params = t.get_params(vid[:, :, 0])
    out_frames = [np.asarray(t.transform(vid[:, :, k], **params))
                  for k in range(3)]
    # identical frames + shared params -> identical transformed frames
    assert np.allclose(out_frames[0], out_frames[1], atol=1e-6)
    assert np.allclose(out_frames[0], out_frames[2], atol=1e-6)


@pytest.mark.parametrize("name,id_params", [
    ("shift", {"y_shift": jnp.zeros((1,)), "x_shift": jnp.zeros((1,))}),
    ("rotate", {"theta": jnp.zeros((1,))}),
])
def test_transform_identity_params(name, id_params, key):
    """Zero parameters give the identity transform (reference
    test_transform_identity:206)."""
    t = _TRANSFORMS[name]()
    x = _image(key)
    out = t.transform(x, **id_params)
    assert float(jnp.max(jnp.abs(out - x))) < 1e-3, name


def test_either_transform_semantics(key):
    """t1 | t2 picks exactly one member per draw; inverse honors the same
    choice (reference base.py:401)."""
    t = T.Rotate(multiples=90, n_trans=1) | T.Shift(n_trans=1)
    x = _image(key)
    seen = set()
    for s in range(6):
        params = t.get_params(x, jax.random.key(s))
        seen.add(params["choice"])
        y = t.transform(x, **params)
        back = t.inverse(y, **params)
        assert float(jnp.max(jnp.abs(back - x))) < 1e-3
    assert seen == {0, 1}, seen  # both members get picked


def test_rotate_90_exact(key):
    """90-degree rotations are exact pixel permutations (reference
    test_rotate_90:244)."""
    t = T.Rotate(multiples=90)
    x = _image(key)
    out = t.transform(x, theta=jnp.asarray([90.0]))
    want = jnp.rot90(x, k=1, axes=(-2, -1))
    assert float(jnp.max(jnp.abs(out - want))) < 1e-5


@pytest.mark.parametrize("batch_size", [1, 2])
def test_transform_batch_consistency(batch_size, key):
    """Batched transform == per-sample transforms under shared params
    (reference test_batch_size:254)."""
    t = T.Shift()
    x = _image(key, (batch_size, 1, 24, 24))
    params = t.get_params(x)
    batched = np.asarray(t.transform(x, **params))
    assert batched.shape[0] == batch_size
    assert np.isfinite(batched).all()


def test_transform_inverse_roundtrip_combined(key):
    """Inverse round-trips hold for composed transforms too (reference
    identity family)."""
    t = T.Shift() * T.Reflect(dim=(-1,))
    x = _image(key)
    params = t.get_params(x)
    y = t.transform(x, **params)
    back = t.inverse(y, **params)
    assert float(jnp.max(jnp.abs(back - x))) < 1e-3


# ------------------------------------------------ r5 review regressions --
def test_random_phase_error_5d_broadcast(key):
    """r5 review: on (B, 2, T, H, W) data the per-line phase must act on
    the readout (W) axis, not on T."""
    from deepinv_tpu.transform import RandomPhaseError

    t = RandomPhaseError(scale=0.1)
    x = jax.random.normal(key, (1, 2, 3, 6, 5))  # T=3 != W=5
    p = t.get_params(x, key)
    out = t.transform(x, **p)
    assert out.shape == x.shape
    back = t.inverse(out, **p)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)


def test_either_transform_inside_jit(key):
    """r5 review: t1 | t2 must trace (lax.cond on the drawn branch)."""
    from deepinv_tpu.transform import Reflect, Rotate

    t = Rotate(multiples=90) | Reflect(dim=(-1,))
    x = jax.random.normal(key, (1, 1, 8, 8))

    @jax.jit
    def f(v, k):
        p = t.get_params(v, k)
        return t.inverse(t.transform(v, **p), **p)

    out = f(x, jax.random.key(3))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-4)


def test_shift_uses_full_reference_range(key):
    """r5 review: shifts draw from [-int(f*H), int(f*H)) like reference
    shift.py:34, not half of it."""
    from deepinv_tpu.transform import Shift

    t = Shift(shift_max=0.5, n_trans=1)
    x = jnp.zeros((1, 1, 16, 16))
    draws = np.array([
        np.asarray(t.get_params(x, jax.random.key(i))["y_shift"])
        for i in range(300)
    ]).ravel()
    assert draws.min() <= -5 and draws.max() >= 5  # beyond the old +-4 band
    assert draws.min() >= -8 and draws.max() < 8
