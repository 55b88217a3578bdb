"""Native X-ray transform (ops/xray.py + physics.TomographyWithAstra).

Mirrors the reference's universal physics property tests
(deepinv/tests/test_physics.py adjointness/norm/dagger pattern) for the
geometries the reference only reaches through the astra CUDA bridge
(deepinv/physics/tomography.py:353): 2D parallel/fan beam and 3D
parallel/cone beam. Unlike astra's unmatched projector pair, our adjoint is
the exact transpose, so adjointness holds to float tolerance.
"""

import warnings

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepinv_tpu.physics import Tomography, TomographyWithAstra


def _rand(shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed).random(shape), jnp.float32)


def _phys(geometry, img_size, **kw):
    kw.setdefault("normalize", False)
    return TomographyWithAstra(img_size, geometry_type=geometry, **kw)


CASES = [
    ("parallel", (17, 17), dict(angles=11)),
    (
        "fanbeam",
        (16, 16),
        dict(
            angles=9,
            geometry_parameters={"source_radius": 50.0, "detector_radius": 25.0},
            detector_spacing=2.0,
            n_detector_pixels=21,
        ),
    ),
    ("parallel", (6, 12, 12), dict(angles=8)),
    (
        "conebeam",
        (6, 10, 10),
        dict(
            angles=8,
            angular_range=(0, 360),
            geometry_parameters={"source_radius": 30.0, "detector_radius": 30.0},
            detector_spacing=(2.0, 2.0),
            n_detector_pixels=(8, 15),
        ),
    ),
]


@pytest.mark.parametrize("geometry,img_size,kw", CASES)
def test_adjointness_exact(geometry, img_size, kw):
    p = _phys(geometry, img_size, **kw)
    x = _rand((1, 1) + img_size)
    y = p.A(x)
    assert y.shape == (1, 1) + p.measurement_shape
    gap = abs(complex(p.adjointness_test(x)))
    scale = float(jnp.linalg.norm(y.ravel())) ** 2 + 1.0
    assert gap / scale < 1e-4, (geometry, gap, scale)


def test_parallel2d_matches_radon():
    """Unit-spacing 2D parallel agrees with ops.radon (the reference notes
    its astra default config matches Tomography circle=False,
    tomography.py:390-393); sinogram layouts are transposed."""
    W, A = 24, 13
    x = _rand((1, 1, W, W), seed=3)
    p = _phys("parallel", (W, W), angles=A, n_steps=8 * W)
    t = Tomography(angles=A, img_width=W, circle=False, normalize=False)
    y = p.A(x)
    ya = jnp.moveaxis(t.A(x), -1, -2)
    assert y.shape == ya.shape
    rel = float(jnp.abs(y - ya).max() / jnp.abs(ya).max())
    assert rel < 2e-2, rel


def test_conebeam_parallel_limit():
    """Cone beam at huge source radius converges to 3D parallel beam (with
    magnification-corrected detector spacing: source and detector both at R
    means iso-centre magnification 2, so cells must be twice as wide)."""
    sz = (5, 9, 9)
    v = _rand((1, 1) + sz, seed=4)
    kw = dict(angles=7, n_detector_pixels=(5, 13))
    pc = _phys(
        "conebeam",
        sz,
        geometry_parameters={"source_radius": 1e6, "detector_radius": 1e6},
        detector_spacing=(2.0, 2.0),
        **kw,
    )
    pp = _phys("parallel", sz, **kw)
    yc, yp = pc.A(v), pp.A(v)
    rel = float(jnp.abs(yc - yp).max() / jnp.abs(yp).max())
    assert rel < 2e-2, rel


def test_geometry_vectors_roundtrip():
    """Explicit (A, 12) per-view vectors reproduce the circular-trajectory
    cone geometry they were derived from (astra geom_2vec layout)."""
    sz = (4, 8, 8)
    v = _rand((1, 1) + sz, seed=5)
    a = np.deg2rad(np.linspace(0, 360, 7))
    sin, cos, z = np.sin(a), np.cos(a), np.zeros_like(a)
    d = np.stack([sin, cos, z], -1)
    vecs = np.concatenate(
        [
            -30.0 * d,
            30.0 * d,
            2.0 * np.stack([cos, -sin, z], -1),
            2.0 * np.stack([z, z, np.ones_like(a)], -1),
        ],
        axis=1,
    )
    kw = dict(n_detector_pixels=(6, 12), normalize=False)
    p_vec = TomographyWithAstra(sz, geometry_type="conebeam", geometry_vectors=vecs, **kw)
    p_circ = TomographyWithAstra(
        sz,
        angles=np.rad2deg(a),
        geometry_type="conebeam",
        geometry_parameters={"source_radius": 30.0, "detector_radius": 30.0},
        detector_spacing=(2.0, 2.0),
        **kw,
    )
    assert np.allclose(p_vec.A(v), p_circ.A(v), atol=1e-5)


def test_fdk_reconstructs_phantom():
    """FDK (A_dagger(fbp=True)) recovers a centred blob: the reconstruction
    correlates strongly with the phantom (reference tomography.py:713)."""
    D, H = 8, 16
    zz, yy, xx = np.meshgrid(
        np.linspace(-1, 1, D), np.linspace(-1, 1, H), np.linspace(-1, 1, H),
        indexing="ij",
    )
    ph = np.exp(-((xx**2 + yy**2) / 0.18 + zz**2 / 0.5)).astype(np.float32)
    x = jnp.asarray(ph)[None, None]
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        p = TomographyWithAstra(
            (D, H, H),
            angles=36,
            angular_range=(0, 360),
            geometry_type="conebeam",
            geometry_parameters={"source_radius": 60.0, "detector_radius": 20.0},
            n_detector_pixels=(2 * D, 24),
            normalize=True,
        )
    rec = p.A_dagger(p.A(x), fbp=True)
    a = np.asarray(rec).ravel()
    b = np.asarray(x).ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.9, corr


def test_jit_and_grad():
    """The full operator pair jits and differentiates (the astra bridge
    needs a custom autograd.Function, functional/astra.py:AutogradTransform;
    here plain AD applies)."""
    p = _phys("fanbeam", (12, 12), angles=6, n_detector_pixels=17)
    x = _rand((2, 1, 12, 12), seed=6)
    y = jax.jit(lambda ph, u: ph.A(u))(p, x)

    g = jax.grad(lambda u: jnp.sum(p.A_adjoint(p.A(u)) ** 2))(x)
    assert g.shape == x.shape and bool(jnp.isfinite(g).all())
    assert y.shape == (2, 1) + p.measurement_shape


@pytest.mark.slow
def test_pet_michelogram_oblique_lors():
    """PET multi-ring cylinder geometry (ring_differences) built on
    ops.xray.ray_integrals: direct planes match the per-plane projector,
    oblique segments zero out-of-scanner rings, the adjoint is exact, and
    MLEM reconstructs from the full michelogram (parallelproj semantics,
    reference pet.py:355)."""
    import warnings

    from deepinv_tpu.physics import PET

    D, W = 5, 16
    zz, yy, xx = np.meshgrid(
        np.linspace(-1, 1, D), np.linspace(-1, 1, W), np.linspace(-1, 1, W),
        indexing="ij",
    )
    act = np.exp(-((xx**2 + yy**2) / 0.25 + zz**2 / 0.6)).astype(np.float32)
    x = jnp.asarray(act)[None, None]

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        p = PET(img_size=(D, W, W), angles=12, ring_differences=(0, -1, 1))
        p2 = PET(img_size=(D, W, W), angles=12)
    y = p.A(x)
    assert y.shape == (1, 1, 3, D, W, 12)

    gap = abs(complex(p.adjointness_test(x)))
    assert gap < 1e-2 * float(jnp.vdot(y, y).real) ** 0.5

    seg0 = np.asarray(y[0, 0, 0]).ravel()
    ref = np.asarray(p2.A(x)[0, 0]).ravel()
    assert np.corrcoef(seg0, ref)[0, 1] > 0.999

    # delta=-1: ring 0 has no partner ring -> zero row; interior rings do
    segm1 = np.asarray(y[0, 0, 1])
    assert np.abs(segm1[0]).max() == 0.0 and np.abs(segm1[2]).max() > 0.0

    rec = p.osem(p.A(x), n_iter=5)
    mse = float(jnp.mean((rec - x) ** 2))
    base = float(jnp.mean((x - x.mean()) ** 2))
    assert mse < 0.3 * base, (mse, base)
