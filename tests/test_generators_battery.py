"""Generator battery: the reference's systematic generator sweeps ported as
ideas (deepinv/tests/test_generators.py — shape/newparams/seed families at
:169,:188,:216, average :246, downsampling sweep :277, MRI sweep :378,
inpainting sweep :461, diffraction sweep :650, gaussian-blur sweep :826,
mixture sweep :1032).

Every generator goes through the same universal battery: parameter dict
shapes, fresh draws differ between steps, seeds reproduce exactly, and
normalization invariants hold (PSFs sum to 1, masks are binary, MRI
acceleration is honored, splitting masks are complementary).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import deepinv_tpu.physics.generator as G

# name -> (factory, param_key, expected_shape_for_batch_2)
_UNIVERSAL = {
    "motion": (lambda: G.MotionBlurGenerator(psf_size=(9, 9)),
               "filter", (2, 1, 9, 9)),
    "gaussian_blur": (lambda: G.GaussianBlurGenerator(psf_size=(9, 9)),
                      "filter", (2, 1, 9, 9)),
    "gaussian_blur_aniso": (
        lambda: G.GaussianBlurGenerator(psf_size=(9, 9), isotropic=False),
        "filter", (2, 1, 9, 9)),
    "diffraction": (lambda: G.DiffractionBlurGenerator(
        psf_size=(9, 9), pupil_size=(32, 32)), "filter", (2, 1, 9, 9)),
    "diffraction3d": (lambda: G.DiffractionBlurGenerator3D(
        psf_size=(5, 9, 9), pupil_size=(32, 32)), "filter", (2, 1, 5, 9, 9)),
    "sigma": (lambda: G.SigmaGenerator(), "sigma", (2,)),
    "gain": (lambda: G.GainGenerator(), "gain", (2,)),
    "mri_gaussian": (lambda: G.GaussianMaskGenerator((2, 16, 16)),
                     "mask", (2, 2, 16, 16)),
    "mri_random": (lambda: G.RandomMaskGenerator((2, 16, 16)),
                   "mask", (2, 2, 16, 16)),
    "mri_equispaced": (lambda: G.EquispacedMaskGenerator((2, 16, 16)),
                       "mask", (2, 2, 16, 16)),
    "mri_poly": (lambda: G.PolyOrderMaskGenerator((2, 16, 16)),
                 "mask", (2, 2, 16, 16)),
    "bernoulli_split": (
        lambda: G.BernoulliSplittingMaskGenerator((1, 16, 16), 0.6),
        "mask", (2, 1, 16, 16)),
    "gaussian_split": (
        lambda: G.GaussianSplittingMaskGenerator((1, 16, 16), 0.6),
        "mask", (2, 1, 16, 16)),
    "downsampling": (lambda: G.DownsamplingGenerator(psf_size=(11, 11)),
                     "factor", None),
}


@pytest.mark.parametrize("name", sorted(_UNIVERSAL))
def test_generator_shapes(name):
    """step(batch_size) returns the declared param key with batched shape
    (reference test_shape:169)."""
    factory, pkey, shape = _UNIVERSAL[name]
    gen = factory()
    params = gen.step(batch_size=2, seed=0)
    assert pkey in params, (name, list(params))
    if shape is not None:
        assert tuple(params[pkey].shape) == shape, (name,
                                                    params[pkey].shape)
    arr = jnp.asarray(params[pkey])
    if jnp.issubdtype(arr.dtype, jnp.floating):
        assert bool(jnp.all(jnp.isfinite(arr))), name


@pytest.mark.parametrize("name", sorted(_UNIVERSAL))
def test_generator_newparams_and_seed(name):
    """Fresh draws differ across steps; an explicit seed reproduces bitwise
    (reference test_generation_newparams:188, test_generation_seed:216)."""
    factory, pkey, _ = _UNIVERSAL[name]
    gen = factory()
    a = np.asarray(gen.step(batch_size=2, seed=1)[pkey], np.float64)
    # discrete-valued params (e.g. downsampling factors) can collide on a
    # single redraw — different seeds must differ within a few tries
    diff = any(
        not np.array_equal(
            a, np.asarray(gen.step(batch_size=2, seed=s)[pkey], np.float64))
        for s in range(2, 7))
    assert diff, f"{name}: draws identical across seeds"
    a2 = np.asarray(factory().step(batch_size=2, seed=1)[pkey], np.float64)
    assert np.array_equal(a, a2), f"{name}: seed not reproducible"


@pytest.mark.parametrize("name", ["motion", "gaussian_blur", "diffraction"])
def test_psf_generators_normalized(name):
    """Blur PSFs are nonnegative and sum to 1 per batch element."""
    factory, pkey, _ = _UNIVERSAL[name]
    f = np.asarray(factory().step(batch_size=3, seed=0)[pkey], np.float64)
    assert (f >= -1e-6).all()
    sums = f.reshape(3, -1).sum(axis=1)
    assert np.allclose(sums, 1.0, atol=1e-4), sums


def test_generator_average():
    """average(n) converges to the mean parameter (reference
    test_average:246): the sigma generator's average approaches
    (sigma_min + sigma_max) / 2."""
    gen = G.SigmaGenerator(sigma_min=0.1, sigma_max=0.3)
    avg = gen.average(n=400, batch_size=1)
    got = float(jnp.ravel(jnp.asarray(avg["sigma"]))[0])
    assert abs(got - 0.2) < 0.02, got


@pytest.mark.parametrize("acc", [2, 4, 8])
@pytest.mark.parametrize("gen_name",
                         ["mri_gaussian", "mri_random", "mri_equispaced"])
def test_mri_mask_acceleration(gen_name, acc):
    """Sampled-column fraction ~ 1/acceleration and the center is fully
    sampled (reference test_mri_generator:378)."""
    cls = {"mri_gaussian": G.GaussianMaskGenerator,
           "mri_random": G.RandomMaskGenerator,
           "mri_equispaced": G.EquispacedMaskGenerator}[gen_name]
    gen = cls((2, 32, 32), acceleration=acc)
    mask = np.asarray(gen.step(batch_size=1, seed=0)["mask"])
    frac = mask[0, 0].mean()
    assert 0.5 / acc < frac < 2.5 / acc, (gen_name, acc, frac)
    # center columns (center_fraction default) are all-ones
    W = mask.shape[-1]
    c = W // 2
    assert mask[0, 0, :, c] .all(), gen_name


@pytest.mark.parametrize("img_size", [(16, 16), (1, 16, 16), (2, 16, 16)])
def test_mri_mask_img_size_variants(img_size):
    """Mask generators accept (H,W), (C,H,W) (reference MRI_IMG_SIZES)."""
    gen = G.GaussianMaskGenerator(img_size, acceleration=2)
    mask = gen.step(batch_size=2, seed=0)["mask"]
    assert mask.shape[0] == 2
    assert mask.shape[-2:] == (16, 16)
    m = np.asarray(mask)
    assert set(np.unique(m)).issubset({0.0, 1.0})


@pytest.mark.parametrize("pixelwise", [False, True])
@pytest.mark.parametrize("split_ratio", [0.3, 0.7])
def test_splitting_mask_sweep(pixelwise, split_ratio):
    """Bernoulli splitting honors the ratio; pixelwise shares the mask
    across channels (reference test_inpainting_generators:461)."""
    gen = G.BernoulliSplittingMaskGenerator(
        (3, 24, 24), split_ratio, pixelwise=pixelwise)
    mask = np.asarray(gen.step(batch_size=2, seed=0)["mask"])
    assert mask.shape == (2, 3, 24, 24)
    assert abs(mask.mean() - split_ratio) < 0.1
    if pixelwise:
        assert np.array_equal(mask[:, 0], mask[:, 1])
        assert np.array_equal(mask[:, 0], mask[:, 2])


def test_multiplicative_splitting_composes():
    """Multiplicative splitting = input mask * split mask (reference
    MultiplicativeSplittingMaskGenerator)."""
    split = G.BernoulliSplittingMaskGenerator((1, 16, 16), 0.5)
    gen = G.MultiplicativeSplittingMaskGenerator((1, 16, 16), split)
    base = jnp.ones((2, 1, 16, 16)).at[:, :, :, :8].set(0.0)
    out = np.asarray(gen.step(batch_size=2, seed=0, input_mask=base)["mask"])
    # anything outside the input support stays zero
    assert (out[:, :, :, :8] == 0).all()
    assert 0 < out[:, :, :, 8:].mean() < 1


@pytest.mark.parametrize("use_batch", [1, 3])
def test_generator_mixture_draws_from_members(use_batch):
    """A mixture only produces params its members produce, and respects
    batch size (reference test_generator_mixture:1032)."""
    g1 = G.SigmaGenerator(sigma_min=0.1, sigma_max=0.2)
    g2 = G.SigmaGenerator(sigma_min=0.5, sigma_max=0.6)
    mix = G.GeneratorMixture([g1, g2], probs=[0.5, 0.5])
    seen_low = seen_high = False
    for seed in range(8):
        s = np.asarray(mix.step(batch_size=use_batch, seed=seed)["sigma"])
        assert s.shape == (use_batch,)
        if (s <= 0.25).any():
            seen_low = True
        if (s >= 0.45).any():
            seen_high = True
    assert seen_low and seen_high


@pytest.mark.parametrize("factors", [(2,), (2, 4)])
def test_downsampling_generator_sweep(factors):
    """Downsampling generator draws (filter, factor) pairs from its
    catalogue (reference test_downsampling_generator:277)."""
    gen = G.DownsamplingGenerator(filters=("gaussian", "bilinear"),
                                  factors=factors)
    for seed in range(4):
        p = gen.step(batch_size=1, seed=seed)
        assert int(np.ravel(p["factor"])[0]) in factors
        assert "filter" in p


def test_diffraction_generator_zernike_control():
    """Passing explicit zero Zernike coefficients gives the diffraction-
    limited PSF — reproducible and distinct from a random draw (reference
    test_diffraction_generator coeff=0 case)."""
    gen = G.DiffractionBlurGenerator((9, 9), pupil_size=(32, 32))
    n = len(gen.zernike_index) if hasattr(gen, "zernike_index") else 8
    zero = jnp.zeros((1, n))
    a = np.asarray(gen.step(batch_size=1, seed=0, coeff=zero)["filter"])
    b = np.asarray(gen.step(batch_size=1, seed=1, coeff=zero)["filter"])
    assert np.allclose(a, b, atol=1e-6)
    c = np.asarray(gen.step(batch_size=1, seed=2)["filter"])
    assert not np.allclose(a, c)


def test_confocal_generator_3d_psf():
    """Confocal 3D PSF: correct shape, normalized, energy concentrated
    around the focal plane (reference ConfocalBlurGenerator3D family)."""
    gen = G.ConfocalBlurGenerator3D(psf_size=(5, 9, 9))
    f = np.asarray(gen.step(batch_size=1, seed=0)["filter"], np.float64)
    assert f.shape == (1, 1, 5, 9, 9)
    assert abs(f.sum() - 1.0) < 1e-3
    planes = f[0, 0].reshape(5, -1).sum(axis=1)
    assert planes[2] >= planes[0] and planes[2] >= planes[4]


def test_tiled_blur_generator_tiles():
    """Tiled generator produces one PSF per tile of the image grid."""
    psfgen = G.GaussianBlurGenerator(psf_size=(5, 5))
    gen = G.TiledBlurGenerator(psf_generator=psfgen, patch_size=8,
                               img_size=(16, 16))
    p = gen.step(batch_size=1, seed=0)
    filt = np.asarray(p["filters"]) if "filters" in p else np.asarray(
        p["filter"])
    assert filt.ndim >= 4
    assert np.isfinite(filt).all()


@pytest.mark.parametrize("convention", ["noll", "ansi"])
@pytest.mark.parametrize("apodize", [False, True])
@pytest.mark.parametrize("random_rotate", [False, True])
def test_diffraction_option_sweep(convention, apodize, random_rotate):
    """Diffraction generator over index conventions x apodization x random
    rotation (reference test_diffraction_generator:650): normalized PSFs
    everywhere, conventions give genuinely different aberrations."""
    gen = G.DiffractionBlurGenerator(
        (9, 9), pupil_size=(32, 32), index_convention=convention,
        apodize=apodize, random_rotate=random_rotate)
    f = np.asarray(gen.step(batch_size=2, seed=0)["filter"], np.float64)
    assert f.shape == (2, 1, 9, 9)
    # random_rotate's bilinear resample can ring slightly negative; the
    # 9x9 crop loses up to ~1% of apodized-pupil mass
    assert (f >= -1e-3).all()
    assert np.allclose(f.reshape(2, -1).sum(1), 1.0, atol=2e-2)


def test_diffraction_conventions_differ():
    """noll vs ansi orderings map the same coefficients to different
    Zernike modes, so the same seed gives different PSFs."""
    fs = {}
    for conv in ("noll", "ansi"):
        gen = G.DiffractionBlurGenerator((9, 9), pupil_size=(32, 32),
                                         index_convention=conv)
        fs[conv] = np.asarray(gen.step(batch_size=1, seed=0)["filter"])
    assert not np.allclose(fs["noll"], fs["ansi"])


def test_diffraction_3d_option_sweep():
    """3D diffraction generator with apodization: normalized volumetric
    PSF with energy spread across defocus planes (reference is_3d arm of
    test_diffraction_generator:650)."""
    gen = G.DiffractionBlurGenerator3D((5, 9, 9), pupil_size=(32, 32),
                                       apodize=True)
    f = np.asarray(gen.step(batch_size=1, seed=1)["filter"], np.float64)
    assert f.shape == (1, 1, 5, 9, 9)
    assert abs(f.sum() - 1.0) < 1e-3
    planes = f[0, 0].reshape(5, -1).sum(1)
    assert (planes > 0).all()  # every defocus plane carries energy


def test_motion_blur_length_controls_support():
    """MotionBlurGenerator: ``l`` is the Gaussian-process correlation
    length — SMALLER l = rougher trajectory = wider PSF support
    (reference motion-blur statistics family)."""
    def spread(l):
        gen = G.MotionBlurGenerator(psf_size=(15, 15), l=l)
        f = np.asarray(gen.step(batch_size=4, seed=0)["filter"], np.float64)
        yy, xx = np.mgrid[0:15, 0:15]
        c = 7.0
        m2 = (f[:, 0] * ((yy - c) ** 2 + (xx - c) ** 2)).sum(axis=(1, 2))
        return m2.mean()

    assert spread(0.1) > spread(0.9)
