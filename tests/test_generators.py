"""Physics generator tests (mirrors reference test_generators strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepinv_tpu.physics.generator import (
    MotionBlurGenerator,
    GaussianBlurGenerator,
    DiffractionBlurGenerator,
    RandomMaskGenerator,
    GaussianMaskGenerator,
    EquispacedMaskGenerator,
    PolyOrderMaskGenerator,
    BernoulliSplittingMaskGenerator,
    GaussianSplittingMaskGenerator,
    MultiplicativeSplittingMaskGenerator,
    Phase2PhaseSplittingMaskGenerator,
    Artifact2ArtifactSplittingMaskGenerator,
    SigmaGenerator,
    GainGenerator,
    GeneratorMixture,
)
from deepinv_tpu.physics import Blur, MRI, Inpainting
from conftest import assert_close


@pytest.mark.parametrize(
    "gen",
    [
        MotionBlurGenerator(psf_size=(15, 15)),
        GaussianBlurGenerator(psf_size=(15, 15)),
        DiffractionBlurGenerator(psf_size=(15, 15)),
    ],
)
def test_blur_generators(gen, key):
    params = gen.step(batch_size=3, key=key)
    f = params["filter"]
    assert f.shape[:2] == (3, 1) and f.shape[-2:] == (15, 15)
    sums = jnp.sum(f, axis=(-2, -1))
    assert_close(sums, jnp.ones_like(sums), rtol=1e-4)
    assert bool(jnp.all(f >= -1e-6))
    # PSFs differ across the batch
    assert float(jnp.max(jnp.abs(f[0] - f[1]))) > 1e-6
    # usable in physics
    phys = Blur(filter=f, padding="circular")
    x = jax.random.normal(jax.random.key(1), (3, 1, 32, 32))
    assert phys.A(x).shape == x.shape
    # reproducible with the same key
    params2 = gen.step(batch_size=3, key=key)
    assert_close(params["filter"], params2["filter"])


@pytest.mark.parametrize(
    "gen_cls", [RandomMaskGenerator, GaussianMaskGenerator, EquispacedMaskGenerator, PolyOrderMaskGenerator]
)
def test_mri_mask_generators(gen_cls, key):
    gen = gen_cls((2, 32, 32), acceleration=4)
    params = gen.step(batch_size=2, key=key)
    mask = params["mask"]
    assert mask.shape == (2, 2, 32, 32)
    # acceleration approximately 4x: between 1/8 and 1/2 of lines kept
    frac = float(jnp.mean(mask))
    assert 0.1 < frac < 0.55, frac
    # center lines fully sampled
    c = 32 // 2
    assert float(jnp.min(mask[..., c - 1 : c + 1])) == 1.0
    # works with MRI physics
    phys = MRI(img_size=(32, 32)).update(mask=mask)
    x = jax.random.normal(jax.random.key(2), (2, 2, 32, 32))
    y = phys.A(x)
    assert y.shape == x.shape


def test_splitting_generators(key):
    g = BernoulliSplittingMaskGenerator((1, 32, 32), split_ratio=0.8)
    m = g.step(4, key=key)["mask"]
    assert m.shape == (4, 1, 32, 32)
    assert abs(float(jnp.mean(m)) - 0.8) < 0.05

    gs = GaussianSplittingMaskGenerator((1, 32, 32), split_ratio=0.7)
    ms = gs.step(2, key=key)["mask"]
    assert abs(float(jnp.mean(ms)) - 0.7) < 0.1

    base = RandomMaskGenerator((1, 32, 32), acceleration=2)
    orig = base.step(2, key=key)["mask"]
    mult = MultiplicativeSplittingMaskGenerator(
        (1, 32, 32), RandomMaskGenerator((1, 32, 32), acceleration=2)
    )
    mm = mult.step(2, key=key, input_mask=orig)["mask"]
    assert mm.shape == (2, 1, 32, 32)
    # split is a subset of the original acceleration mask
    assert float(jnp.max(mm - orig)) <= 0.0

    p2p = Phase2PhaseSplittingMaskGenerator((2, 8, 16, 16))
    mp = p2p.step(2, key=key)["mask"]
    assert mp.shape == (2, 2, 8, 16, 16)
    assert float(jnp.mean(mp)) == 0.5

    a2a = Artifact2ArtifactSplittingMaskGenerator((2, 8, 16, 16), split_size=2)
    ma = a2a.step(3, key=key)["mask"]
    assert ma.shape == (3, 2, 8, 16, 16)
    assert abs(float(jnp.mean(ma)) - 0.25) < 1e-5


def test_sigma_gain_generators(key):
    s = SigmaGenerator(0.01, 0.3).step(100, key=key)["sigma"]
    assert s.shape == (100,)
    assert float(s.min()) >= 0.01 and float(s.max()) <= 0.3

    g = GainGenerator().step(10, key=key)["gain"]
    assert g.shape == (10,)


def test_generator_addition(key):
    gen = GaussianBlurGenerator(psf_size=(7, 7)) + SigmaGenerator()
    params = gen.step(2, key=key)
    assert "filter" in params and "sigma" in params


def test_generator_mixture(key):
    mix = GeneratorMixture(
        [RandomMaskGenerator((16, 16)), EquispacedMaskGenerator((16, 16))]
    )
    params = mix.step(2, key=key)
    assert "mask" in params


def test_cpab_diffeomorphism():
    """Native CPAB: basis dims match theory (2 x #vertices minus boundary
    constraints), warp deforms, and theta -> -theta is the exact inverse."""
    import numpy as np
    from deepinv_tpu.transform import CPABDiffeomorphism
    from deepinv_tpu.transform.diffeomorphism import _cpab_basis

    assert _cpab_basis(3, 3, True, False)[0].shape[1] == 26
    assert _cpab_basis(3, 3, False, False)[0].shape[1] == 50

    t = CPABDiffeomorphism(n_tesselation=3, sigma=0.2)
    yy, xx = np.mgrid[0:48, 0:48] / 48
    x = jnp.asarray(np.sin(4 * np.pi * xx) * np.cos(3 * np.pi * yy),
                    jnp.float32)[None, None] * 0.5 + 0.5
    params = t.get_params(x, jax.random.key(3))
    xt = t.transform(x, **params)
    assert float(jnp.abs(xt - x).max()) > 0.02  # actually deformed
    xinv = t.inverse(xt, **params)
    err = jnp.abs(xinv - x)[:, :, 4:-4, 4:-4]
    assert float(err.mean()) < 0.01, float(err.mean())

    t3 = CPABDiffeomorphism(n_trans=3, n_tesselation=3, sigma=0.2)
    xt3 = t3.transform(x, **t3.get_params(x, jax.random.key(4)))
    assert xt3.shape == (3, 1, 48, 48)


def test_rotate_via_shear():
    """FFT shear rotation: exact at 90 deg, invertible, matches bilinear
    warp at 35 deg on a smooth image."""
    import numpy as np
    from deepinv_tpu.transform import rotate_via_shear

    yy, xx = np.mgrid[0:49, 0:49] / 49
    sm = jnp.asarray(np.exp(-((xx - 0.5) ** 2 + (yy - 0.4) ** 2) / 0.02),
                     jnp.float32)[None, None]
    r = rotate_via_shear(rotate_via_shear(sm, 30.0), -30.0)
    assert float(jnp.abs(r - sm).max()) < 1e-3
    x = jnp.zeros((1, 1, 33, 33)).at[:, :, 8:20, 14:20].set(1.0)
    r90 = rotate_via_shear(x, 90.0)
    assert float(jnp.abs(r90 - jnp.rot90(x, 1, axes=(-2, -1))).max()) < 1e-5 or \
           float(jnp.abs(r90 - jnp.rot90(x, -1, axes=(-2, -1))).max()) < 1e-5


def test_diffraction_3d_generator():
    from deepinv_tpu.physics.generator import DiffractionBlurGenerator3D

    g = DiffractionBlurGenerator3D(psf_size=(5, 17, 17))
    out = g.sample(2, jax.random.key(0))
    f = out["filter"]
    assert f.shape == (2, 1, 5, 17, 17)
    assert abs(float(jnp.sum(f[0])) - 1.0) < 1e-4


def _import_reference():
    """Import the torch reference with the stub shims; skip if unavailable."""
    from test_namespace_parity import _make_stubs, REFERENCE
    import os, sys, tempfile

    if not os.path.isdir(REFERENCE):
        pytest.skip("reference checkout not available")
    pytest.importorskip("torch")
    stub = tempfile.mkdtemp()
    _make_stubs(stub)
    sys.path.insert(0, stub)
    sys.path.insert(0, REFERENCE)
    try:
        import deepinv

        return deepinv
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference not importable: {e}")
    finally:
        sys.path.remove(stub)
        sys.path.remove(REFERENCE)


@pytest.mark.slow
def test_gaussian_blur_functional_matches_reference():
    """gaussian_blur reproduces the reference N-dim batched kernels exactly
    (reference functional/blur.py:137): 1D/2D/3D, batched sigma/angle."""
    deepinv = _import_reference()
    import torch
    from deepinv.physics.functional.blur import gaussian_blur as ref_gb
    from deepinv_tpu.ops.conv import gaussian_blur as j_gb

    rng = np.random.RandomState(0)
    cases = [
        ((11, 9), rng.uniform(0.5, 3.0, (4, 2)), rng.uniform(0, 360, (4,))),
        ((7,), rng.uniform(0.5, 3.0, (3, 1)), 0.0),
        ((5, 7, 9), rng.uniform(0.5, 2.0, (2, 3)), rng.uniform(0, 360, (2, 3))),
    ]
    for psf_size, sig, ang in cases:
        sig = sig.astype(np.float32)
        r = ref_gb(
            psf_size,
            torch.tensor(sig),
            torch.tensor(np.asarray(ang, np.float32)) if np.ndim(ang) else float(ang),
        ).numpy()
        j = np.asarray(
            j_gb(
                sigma=jnp.asarray(sig),
                angle=jnp.asarray(np.asarray(ang, np.float32)) if np.ndim(ang) else ang,
                psf_size=psf_size,
            )
        )
        np.testing.assert_allclose(r, j, atol=2e-7)


@pytest.mark.slow
def test_diffraction_blur_matches_reference():
    """DiffractionBlurGenerator with fixed Zernike coefficients is
    bit-faithful to the reference pupil synthesis (generator/blur.py:358),
    including the multi-channel chromatic fc model."""
    deepinv = _import_reference()
    import torch
    from deepinv.physics.generator import DiffractionBlurGenerator as RefD
    from deepinv_tpu.physics.generator import DiffractionBlurGenerator as JD

    rng = np.random.RandomState(0)
    coeff = rng.uniform(-0.075, 0.075, (2, 8)).astype(np.float32)
    rg, jg = RefD((31, 31)), JD((31, 31))
    assert rg.zernike_polynomials == jg.zernike_polynomials
    rf = rg.step(coeff=torch.tensor(coeff))["filter"].numpy()
    jf = np.asarray(jg.step(batch_size=2, key=jax.random.key(0),
                            coeff=jnp.asarray(coeff))["filter"])
    np.testing.assert_allclose(rf, jf, atol=5e-7)

    c3 = rng.uniform(-0.075, 0.075, (2, 3, 8)).astype(np.float32)
    rg3 = RefD((15, 15), fc=(0.18, 0.20, 0.22))
    jg3 = JD((15, 15), fc=(0.18, 0.20, 0.22))
    rf3 = rg3.step(coeff=torch.tensor(c3))["filter"].numpy()
    jf3 = np.asarray(jg3.step(batch_size=2, key=jax.random.key(0),
                              coeff=jnp.asarray(c3))["filter"])
    np.testing.assert_allclose(rf3, jf3, atol=5e-7)


@pytest.mark.slow
def test_gaussian_blur_generator_matches_reference_statistics():
    """GaussianBlurGenerator sampling ranges/moments match the reference
    (generator/blur.py:40) on a large batch."""
    deepinv = _import_reference()
    import torch
    from deepinv.physics.generator import GaussianBlurGenerator as RefG
    from deepinv_tpu.physics.generator import GaussianBlurGenerator as JG

    B = 256
    rk = RefG((15, 15), isotropic=False,
              rng=torch.Generator().manual_seed(0)).step(B)["filter"].numpy()
    jk = np.asarray(JG((15, 15), isotropic=False).step(
        batch_size=B, key=jax.random.key(0))["filter"])
    assert rk.shape == jk.shape == (B, 1, 15, 15)
    ys, xs = np.mgrid[0:15, 0:15]
    r2 = (ys - 7) ** 2 + (xs - 7) ** 2
    ref_m2 = (rk * r2).sum((-2, -1)).mean()
    jax_m2 = (jk * r2).sum((-2, -1)).mean()
    assert abs(ref_m2 - jax_m2) / ref_m2 < 0.1, (ref_m2, jax_m2)


@pytest.mark.slow
def test_diffraction_blur_3d_matches_reference():
    """DiffractionBlurGenerator3D / ConfocalBlurGenerator3D with fixed
    Zernike coefficients are bit-faithful to the reference angular-spectrum
    propagation (generator/blur.py:1112,1388)."""
    _import_reference()
    import torch
    from deepinv.physics.generator import (
        DiffractionBlurGenerator3D as Ref3D,
        ConfocalBlurGenerator3D as RefC,
    )
    from deepinv_tpu.physics.generator import (
        DiffractionBlurGenerator3D as J3D,
        ConfocalBlurGenerator3D as JC,
    )

    rng = np.random.RandomState(0)
    coeff = rng.uniform(-0.05, 0.05, (2, 8)).astype(np.float32)
    rf = Ref3D((5, 17, 17), stepz_pixel=2).step(coeff=torch.tensor(coeff))[
        "filter"].numpy()
    jf = np.asarray(J3D((5, 17, 17), stepz_pixel=2).step(
        2, key=jax.random.key(0), coeff=jnp.asarray(coeff))["filter"])
    np.testing.assert_allclose(rf, jf, atol=5e-7)

    ci = rng.uniform(-0.05, 0.05, (1, 8)).astype(np.float32)
    cc = rng.uniform(-0.05, 0.05, (1, 8)).astype(np.float32)
    rfc = RefC((5, 17, 17)).step(
        coeff_ill=torch.tensor(ci), coeff_coll=torch.tensor(cc))["filter"].numpy()
    jfc = np.asarray(JC((5, 17, 17)).step(
        1, key=jax.random.key(0), coeff_ill=jnp.asarray(ci),
        coeff_coll=jnp.asarray(cc))["filter"])
    np.testing.assert_allclose(rfc, jfc, atol=5e-7)


@pytest.mark.slow
def test_product_convolution_generator_matches_reference():
    """ProductConvolutionBlurGenerator: with identical grid PSFs injected,
    the eigen-PSF + TPS-multiplier decomposition reproduces the reference
    space-varying operator output (generator/blur.py:982; the SVD basis has
    per-vector sign freedom, so the operator output is the invariant)."""
    _import_reference()
    import torch
    import deepinv as dinv
    from deepinv.physics.generator import ProductConvolutionBlurGenerator as RefPC
    from deepinv_tpu.physics.generator import ProductConvolutionBlurGenerator as JPC
    from deepinv_tpu.physics import SpaceVaryingBlur
    from deepinv_tpu.ops.conv import gaussian_blur as jgb

    rng = np.random.RandomState(0)
    H = W = 48
    spacing = H // 8
    n_grid = (H // spacing) * (W // spacing)
    sig = rng.uniform(0.6, 1.8, (n_grid, 2)).astype(np.float32)
    ang = rng.uniform(0, 180, (n_grid,)).astype(np.float32)
    psfs = np.asarray(jgb(sigma=jnp.asarray(sig), angle=jnp.asarray(ang),
                          psf_size=(7, 7)))

    class TorchStub:
        psf_size = (7, 7)

        def rng_manual_seed(self, seed):
            pass

        def step(self, batch_size, **kw):
            assert batch_size == n_grid
            return {"filter": torch.tensor(psfs)}

    class JaxStub:
        psf_size = (7, 7)

        def sample(self, batch_size, key, **kw):
            assert batch_size == n_grid
            return {"filter": jnp.asarray(psfs)}

    rp = RefPC(TorchStub(), img_size=(H, W), n_eigen_psf=8).step(1)
    jp = JPC(JaxStub(), img_size=(H, W), n_eigen_psf=8).step(
        1, key=jax.random.key(0))
    assert jp["filters"].shape == tuple(rp["filters"].shape)
    assert jp["multipliers"].shape == tuple(rp["multipliers"].shape)

    x = rng.rand(1, 1, H, W).astype(np.float32)
    ry = dinv.physics.SpaceVaryingBlur(
        filters=rp["filters"], multipliers=rp["multipliers"], padding="valid"
    ).A(torch.tensor(x)).numpy()
    jy = np.asarray(SpaceVaryingBlur(
        filters=jp["filters"], multipliers=jp["multipliers"], padding="valid"
    ).A(jnp.asarray(x)))
    np.testing.assert_allclose(ry, jy, atol=2e-5)


@pytest.mark.slow
def test_motion_blur_matches_reference_statistics():
    """MotionBlurGenerator reproduces the reference's Matern-GP trajectory
    distribution (reference generator/blur.py:212-355): same normalization,
    PSF support fraction, and radial second moment to sampling tolerance."""
    from test_namespace_parity import _make_stubs, REFERENCE
    import os, sys, tempfile

    if not os.path.isdir(REFERENCE):
        pytest.skip("reference checkout not available")
    torch = pytest.importorskip("torch")
    stub = tempfile.mkdtemp()
    _make_stubs(stub)
    sys.path.insert(0, stub)
    sys.path.insert(0, REFERENCE)
    try:
        from deepinv.physics.generator import MotionBlurGenerator as RefGen
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference not importable: {e}")
    finally:
        sys.path.remove(stub)
        sys.path.remove(REFERENCE)

    B = 128
    rk = RefGen((15, 15), rng=torch.Generator().manual_seed(0)).step(B)[
        "filter"].numpy()[:, 0]
    jk = np.asarray(MotionBlurGenerator((15, 15)).step(
        batch_size=B, key=jax.random.key(0))["filter"])[:, 0]

    ys, xs = np.mgrid[0:15, 0:15]
    r2 = (ys - 7) ** 2 + (xs - 7) ** 2
    for k in (rk, jk):
        np.testing.assert_allclose(k.sum((-2, -1)), 1.0, atol=1e-4)
    ref_m2 = (rk * r2).sum((-2, -1)).mean()
    jax_m2 = (jk * r2).sum((-2, -1)).mean()
    assert abs(ref_m2 - jax_m2) < 0.8, (ref_m2, jax_m2)
    ref_support = (rk > 1e-8).mean()
    jax_support = (jk > 1e-8).mean()
    assert abs(ref_support - jax_support) < 0.015, (ref_support, jax_support)


@pytest.mark.slow
def test_mri_mask_pdfs_match_reference():
    """PolyOrder binary-search pdf and Gaussian tail-adjusted pdf are
    bit-faithful to the reference (generator/mri.py:234,314), and line
    budgets (n_center/n_lines) agree for default + explicit
    center_fraction."""
    _import_reference()
    from deepinv.physics.generator import GaussianMaskGenerator as RefG
    from deepinv.physics.generator.mri import PolyOrderMaskGenerator as RefP
    from deepinv_tpu.physics.generator import (
        GaussianMaskGenerator, PolyOrderMaskGenerator)

    for W, acc, cf, p in [(128, 8, 0.04, 8), (64, 4, None, 4), (96, 6, 0.05, 12)]:
        rp = RefP((2, W, W), acceleration=acc, center_fraction=cf, poly_order=p)
        jp = PolyOrderMaskGenerator((2, W, W), acceleration=acc,
                                    center_fraction=cf, poly_order=p)
        np.testing.assert_allclose(rp.pdf.numpy(), np.asarray(jp.pdf), atol=1e-6)

    for W, acc in [(64, 4), (128, 8), (100, 6)]:
        rg = RefG((2, W, W), acceleration=acc)
        jg = GaussianMaskGenerator((2, W, W), acceleration=acc)
        assert (rg.n_center, rg.n_lines) == (jg.n_center, jg.n_lines)
        np.testing.assert_allclose(rg.get_pdf(W).numpy(),
                                   np.asarray(jg.get_pdf(W)), atol=1e-5)


@pytest.mark.slow
def test_mri_mask_sampling_matches_reference_structure():
    """Random/Gaussian masks draw exactly n_lines outer columns without
    replacement (reference mri.py:170-196): per-(batch, time) line counts
    match the reference, masks vary across time, and columns are constant
    over H."""
    _import_reference()
    from deepinv.physics.generator import (
        RandomMaskGenerator as RefR, GaussianMaskGenerator as RefG)
    from deepinv_tpu.physics.generator import (
        RandomMaskGenerator, GaussianMaskGenerator)

    for Rt, Jx in [(RefR, RandomMaskGenerator), (RefG, GaussianMaskGenerator)]:
        rt = Rt((2, 4, 64, 64), acceleration=8, center_fraction=0.04)
        jx = Jx((2, 4, 64, 64), acceleration=8, center_fraction=0.04)
        mt = rt.step(batch_size=3)["mask"]
        mj = jx.step(batch_size=3, key=jax.random.key(1))["mask"]
        assert tuple(mt.shape) == tuple(mj.shape) == (3, 2, 4, 64, 64)
        ct = mt[:, 0, :, 0, :].sum(-1).numpy()
        cj = np.asarray(mj[:, 0, :, 0, :].sum(-1))
        assert (ct == cj).all()
        assert not np.allclose(np.asarray(mj[:, :, 0]), np.asarray(mj[:, :, 1]))
        assert np.all(np.asarray(mj).std(axis=-2) == 0)


@pytest.mark.slow
def test_equispaced_mask_matches_reference_bitwise():
    """EquispacedMaskGenerator reproduces the reference fastMRI column sets
    bit-exactly for every possible random offset, including the k-t shear
    (reference mri.py:358-389)."""
    _import_reference()
    import torch
    from deepinv.physics.generator import EquispacedMaskGenerator as RefE
    from deepinv_tpu.physics.generator import EquispacedMaskGenerator

    for W, acc, cf in [(64, 4, None), (128, 8, 0.04)]:
        rt = RefE((1, 4, W, W), acceleration=acc, center_fraction=cf)
        jx = EquispacedMaskGenerator((1, 4, W, W), acceleration=acc,
                                     center_fraction=cf)
        adjusted = (rt.acc * (rt.n_center - W)) / (rt.n_center * rt.acc - W)
        pad = (W - rt.n_center + 1) // 2
        for off in range(int(round(adjusted))):
            mask_t = torch.zeros((1, 1, 4, W, W))
            mask_t[..., pad:pad + rt.n_center] = 1
            for t in range(4):
                cols = (torch.arange((t + off) % adjusted, W - 1, adjusted)
                        .round().type(torch.int32))
                mask_t[0, :, t, :, cols] = 1
            orig = jax.random.randint
            try:
                jax.random.randint = lambda *a, **k: jnp.full((1,), off, jnp.int32)
                lines = jx.sample_mask(jax.random.key(0), 1, 4, 1, W)
            finally:
                jax.random.randint = orig
            np.testing.assert_array_equal(mask_t[0, 0, :, 0, :].numpy(),
                                          np.asarray(lines[0]))


def test_mask_generator_step_conventions():
    """Reference step() conventions (mri.py:99-133): batch_size=0 drops the
    batch dim, img_size overrides at step time, and (H, W) img_size implies
    one channel."""
    from deepinv_tpu.physics.generator import RandomMaskGenerator

    g = RandomMaskGenerator((64, 64))
    assert g.step(batch_size=0, key=jax.random.key(0))["mask"].shape == (1, 64, 64)
    assert g.step(2, key=jax.random.key(0), img_size=(32, 48))["mask"].shape == (2, 1, 32, 48)


@pytest.mark.slow
def test_splitting_generators_match_reference_structure():
    """Splitting generators reproduce the reference algorithms
    (generator/inpainting.py:12,334): exact-count input_mask splitting,
    SSDU Gaussian removal counts with a preserved center block, and the
    Artifact2Artifact persist_prev protocol."""
    _import_reference()
    import torch
    from deepinv.physics.generator import (
        BernoulliSplittingMaskGenerator as RefB,
        GaussianSplittingMaskGenerator as RefG)
    from deepinv_tpu.physics.generator import (
        BernoulliSplittingMaskGenerator, GaussianSplittingMaskGenerator,
        RandomMaskGenerator, Artifact2ArtifactSplittingMaskGenerator)

    # exact-count split of an input mask (pixelwise): kept entries ==
    # int(split_ratio * nnz) and mask is a subset of the input
    inp = RandomMaskGenerator((2, 32, 32), acceleration=2).step(
        1, key=jax.random.key(0))["mask"][0]
    rb = RefB((2, 32, 32), split_ratio=0.6)
    jb = BernoulliSplittingMaskGenerator((2, 32, 32), split_ratio=0.6)
    mt = rb.step(batch_size=1, input_mask=torch.tensor(np.asarray(inp)))["mask"][0]
    mj = jb.step(batch_size=1, key=jax.random.key(1), input_mask=inp)["mask"][0]
    nnz = int(np.asarray(inp)[0].sum())
    assert int(mt[0].sum()) == int(np.asarray(mj)[0].sum()) == int(0.6 * nnz)
    assert float(jnp.max(mj - inp)) <= 0
    # channels identical (pixelwise)
    assert bool(jnp.array_equal(mj[0], mj[1]))

    # SSDU Gaussian: removal count and untouched center block
    rg = RefG((1, 64, 64), split_ratio=0.7, std_scale=4.0, center_block=(8, 8))
    jg = GaussianSplittingMaskGenerator((1, 64, 64), split_ratio=0.7,
                                        std_scale=4.0, center_block=(8, 8))
    np.testing.assert_allclose(rg.get_pdf((64, 64)).numpy(),
                               np.asarray(jg.get_pdf((64, 64))), atol=1e-6)
    ones = jnp.ones((1, 64, 64))
    mt = rg.step(batch_size=1, input_mask=torch.ones(1, 64, 64))["mask"][0]
    mj = jg.step(batch_size=1, key=jax.random.key(2), input_mask=ones)["mask"][0]
    assert int(mt.sum()) == int(np.asarray(mj).sum())
    c = 64 // 2
    assert float(mj[:, c - 4:c + 4, c - 4:c + 4].min()) == 1.0

    # Artifact2Artifact persist_prev draws a different chunk
    ja = Artifact2ArtifactSplittingMaskGenerator((1, 8, 8, 8), split_size=2)
    m1 = ja.batch_sample(jax.random.key(3))
    prev = ja.prev_idx
    for s in range(5):
        m2 = ja.batch_sample(jax.random.key(100 + s), persist_prev=True)
        assert ja.prev_idx != prev or False  # must differ from previous chunk
        ja.prev_idx = prev  # reset for next draw


def test_bernoulli_random_split_ratio(key):
    """random_split_ratio resamples the ratio per draw in
    [min, max] (reference inpainting.py:57,196)."""
    from deepinv_tpu.physics.generator import BernoulliSplittingMaskGenerator

    g = BernoulliSplittingMaskGenerator(
        (1, 64, 64), split_ratio=0.6, random_split_ratio=True,
        min_split_ratio=0.1, max_split_ratio=0.9)
    means = [float(g.step(1, key=jax.random.key(i))["mask"].mean())
             for i in range(6)]
    assert np.std(means) > 0.05, means
    assert all(0.02 < m < 0.98 for m in means)


@pytest.mark.slow
def test_downsampling_generator_matches_reference():
    """DownsamplingGenerator kernels are bit-faithful to the reference
    (generator/downsampling.py:59) for every (filter, factor), incl. the
    crop path when the kernel exceeds psf_size; batch draws share one
    factor."""
    _import_reference()
    import torch
    from deepinv.physics.generator import DownsamplingGenerator as RefD
    from deepinv_tpu.physics.generator import DownsamplingGenerator

    rd = RefD(filters=["bilinear", "bicubic", "gaussian"], factors=[2, 4],
              psf_size=(17, 17))
    jd = DownsamplingGenerator(filters=["bilinear", "bicubic", "gaussian"],
                               factors=[2, 4], psf_size=(17, 17))
    for name in ["bilinear", "bicubic", "gaussian"]:
        for f in [2, 4]:
            rk = rd.str2filter(name, torch.tensor(f)).detach().numpy()
            jk = np.asarray(jd.str2filter(name, f))
            assert rk.shape == jk.shape
            np.testing.assert_allclose(rk, jk, atol=3e-7)
    p = jd.step(batch_size=3, key=jax.random.key(0))
    assert p["filter"].shape == (3, 1, 17, 17)
    assert len(set(np.asarray(p["factor"]).tolist())) == 1
