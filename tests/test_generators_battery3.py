"""Generator battery wave 3: the reference's remaining test ideas
(deepinv/tests/test_generators.py — string seeds :625, random split ratio
:546, batch-sampled mixtures :1032, used_zernike_index :1124, plus the
seed-contract sweep at :216 hardened to every registered generator).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import deepinv_tpu.physics.generator as G
from deepinv_tpu.physics.generator import GeneratorMixture, seed_from_string


# ------------------------------------------------------------ string seed --
def test_seed_from_string_unique_and_in_range():
    paths = [f"{'deepinv/' * 10}file_{i}.py" for i in range(40)]
    seeds = [seed_from_string(p) for p in paths]
    assert len(set(seeds)) == len(seeds)
    for s in seeds:
        assert 0 <= s < 0xFFFF_FFFF_FFFF_FFFF


def test_string_seed_reproducible_step():
    gen = G.SigmaGenerator()
    a = gen.step(batch_size=3, seed="path/to/sample_001.png")["sigma"]
    b = gen.step(batch_size=3, seed="path/to/sample_001.png")["sigma"]
    c = gen.step(batch_size=3, seed="path/to/sample_002.png")["sigma"]
    np.testing.assert_array_equal(a, b)
    assert not np.allclose(a, c)


def test_rng_manual_seed_accepts_string():
    g1 = G.SigmaGenerator().rng_manual_seed("some/file.h5")
    g2 = G.SigmaGenerator().rng_manual_seed("some/file.h5")
    # stored reduced mod 2**63 so jax.random.key can always consume it
    # (the raw 64-bit hash overflowed for ~half of all strings)
    assert g1.seed == g2.seed == seed_from_string("some/file.h5") % (1 << 63)
    assert g1.seed < (1 << 63)


# ----------------------------------------------------- random split ratio --
@pytest.mark.parametrize("num_channels", [1, 3])
def test_bernoulli_split_ratio_statistics(num_channels):
    """Reference test_inpainting_generator_random_ratio (:546): measured
    keep-ratio matches split_ratio on a 100x100 mask, and the physics
    forward zeroes exactly the dropped pixels."""
    from deepinv_tpu.physics import Inpainting

    size = (num_channels, 100, 100)
    gen = G.BernoulliSplittingMaskGenerator(size, split_ratio=0.6)
    params = gen.step(batch_size=2, key=jax.random.key(0))
    mask = params["mask"]
    assert mask.shape == (2, *size)
    measured = float((mask[0] == 1).sum() / mask[0].size)
    assert abs(measured - 0.6) < 1e-2

    physics = Inpainting(img_size=size, mask=0.9, key=jax.random.key(1))
    x = jax.random.normal(jax.random.key(2), (2, *size))
    y = physics.A(x, **params)
    observed = 1 - float((y[0] == 0).sum() / y[0].size)
    assert abs(observed - measured) < 1e-4


def test_bernoulli_random_split_ratio_varies_per_draw():
    gen = G.BernoulliSplittingMaskGenerator(
        (1, 100, 100), split_ratio=0.6, random_split_ratio=True,
        min_split_ratio=0.001, max_split_ratio=0.5)
    ratios = []
    for i in range(6):
        m = gen.step(batch_size=1, key=jax.random.key(i))["mask"]
        r = float(m.mean())
        ratios.append(r)
        assert r <= 0.55  # never above max (+ sampling slack)
    assert np.std(ratios) > 0.02  # the ratio itself is random


# ------------------------------------------------------- mixture sampling --
def test_mixture_batch_sampling_mixes_within_batch():
    """use_batch_sampling=True (reference base.py:221): with two compatible
    members whose outputs are distinguishable, a large batch contains
    both."""
    g1 = G.GaussianBlurGenerator(psf_size=(9, 9), sigma_min=0.1,
                                 sigma_max=0.11)
    g2 = G.MotionBlurGenerator(psf_size=(9, 9))
    mix = GeneratorMixture([g1, g2], [0.5, 0.5])
    assert mix.use_batch_sampling
    f = mix.step(batch_size=16, key=jax.random.key(0))["filter"]
    assert f.shape == (16, 1, 9, 9)
    # gaussian PSFs at sigma~0.1 are a near-delta (max ~1); motion PSFs
    # spread mass along a path (max well below 1)
    maxes = np.asarray(f.reshape(16, -1).max(-1))
    assert (maxes > 0.9).any() and (maxes < 0.7).any()


def test_mixture_incompatible_members_fall_back():
    """Different parameter keys -> single generator per step (with the
    verbose warning the reference emits)."""
    g1 = G.SigmaGenerator()
    g2 = G.GaussianBlurGenerator(psf_size=(9, 9))
    with pytest.warns(UserWarning):
        mix = GeneratorMixture([g1, g2], [0.5, 0.5], verbose=True)
    assert not mix.use_batch_sampling
    out = mix.step(batch_size=4, key=jax.random.key(1))
    assert set(out) in ({"sigma"}, {"filter"})


def test_mixture_scalar_params_fall_back():
    """Members emitting 0-d params (no batch axis to concatenate along)
    disable batch sampling."""

    class ScalarGen(G.PhysicsGenerator):
        def sample(self, batch_size, key, **kwargs):
            return {"factor": 2}

    mix = GeneratorMixture([ScalarGen(), ScalarGen()])
    assert not mix.use_batch_sampling
    assert mix.step(batch_size=4, key=jax.random.key(0)) == {"factor": 2}


def test_mixture_downsampling_members_batch_compatible():
    """Two DownsamplingGenerators padded to one psf_size emit stackable
    (filter, factor) dicts, so batch sampling stays on."""
    mix = GeneratorMixture(
        [G.DownsamplingGenerator(factors=[2], psf_size=(7, 7)),
         G.DownsamplingGenerator(factors=[4], psf_size=(7, 7))])
    assert mix.use_batch_sampling
    out = mix.step(batch_size=6, key=jax.random.key(2))
    assert out["filter"].shape == (6, 1, 7, 7)
    assert out["factor"].shape == (6,)
    assert set(np.unique(np.asarray(out["factor"]))) <= {2, 4}


def test_mixture_probs_respected_statistically():
    g1 = G.SigmaGenerator(sigma_min=0.01, sigma_max=0.011)
    g2 = G.SigmaGenerator(sigma_min=10.0, sigma_max=10.01)
    mix = GeneratorMixture([g1, g2], [0.9, 0.1])
    sigmas = np.concatenate([
        np.asarray(mix.step(batch_size=32, key=jax.random.key(i))["sigma"])
        for i in range(8)
    ])
    frac_small = float((sigmas < 1.0).mean())
    assert 0.75 < frac_small < 0.99


# --------------------------------------------------------- zernike subset --
@pytest.mark.parametrize("n_used", [1, 5])
@pytest.mark.parametrize("batch_size", [1, 3])
def test_diffraction_used_zernike_index(batch_size, n_used):
    """Reference :1124: step(used_zernike_index=...) restricts the active
    modes; subsets differ; out-of-basis indices raise."""
    full = list(range(3, 37))
    gen = G.DiffractionBlurGenerator(psf_size=(15, 15), zernike_index=full)

    used = full[:n_used]
    p = gen.step(batch_size=batch_size, key=jax.random.key(0),
                 used_zernike_index=used)
    assert p["filter"].shape == (batch_size, 1, 15, 15)
    assert p["coeff"].shape[-1] == n_used

    other = gen.step(batch_size=batch_size, key=jax.random.key(0),
                     used_zernike_index=full[-n_used:])
    assert not np.allclose(p["filter"], other["filter"])

    with pytest.raises(ValueError):
        gen.step(batch_size=1, key=jax.random.key(0),
                 used_zernike_index=[1, 2])


# ------------------------------------------------------ seed contract all --
_ALL = {
    "motion": lambda: G.MotionBlurGenerator(psf_size=(9, 9)),
    "gaussian_blur": lambda: G.GaussianBlurGenerator(psf_size=(9, 9)),
    "diffraction": lambda: G.DiffractionBlurGenerator(psf_size=(9, 9)),
    "sigma": lambda: G.SigmaGenerator(),
    "gain": lambda: G.GainGenerator(),
    "mri_gaussian": lambda: G.GaussianMaskGenerator((2, 16, 16)),
    "mri_random": lambda: G.RandomMaskGenerator((2, 16, 16)),
    "bernoulli_split": lambda: G.BernoulliSplittingMaskGenerator((1, 16, 16), 0.6),
    "product_conv": lambda: G.ProductConvolutionBlurGenerator(
        G.GaussianBlurGenerator(psf_size=(9, 9)), img_size=(32, 32)),
}


@pytest.mark.parametrize("name", sorted(_ALL))
def test_step_seed_contract(name):
    """step(seed=s) is reproducible and differs across seeds for EVERY
    registered generator (reference :216), including int and string
    seeds."""
    gen = _ALL[name]()
    a = gen.step(batch_size=2, seed=123)
    b = gen.step(batch_size=2, seed=123)
    c = gen.step(batch_size=2, seed=124)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                      err_msg=f"{name}:{k} not reproducible")
    assert any(
        not np.allclose(np.asarray(a[k]), np.asarray(c[k])) for k in a
    ), f"{name}: seeds 123 and 124 gave identical draws"


@pytest.mark.parametrize("name", sorted(_ALL))
def test_reset_rng_restores_initial_stream(name):
    gen = _ALL[name]()
    first = gen.step(batch_size=1)
    gen.rng_manual_seed(999)
    _ = gen.step(batch_size=1)
    gen.reset_rng()
    again = gen.step(batch_size=1)
    for k in first:
        np.testing.assert_array_equal(np.asarray(first[k]),
                                      np.asarray(again[k]))


# -------------------------------------------------------------- averages --
def test_average_bernoulli_matches_ratio():
    gen = G.BernoulliSplittingMaskGenerator((1, 32, 32), 0.3)
    avg = gen.average(n=64, batch_size=16, key=jax.random.key(5))["mask"]
    assert abs(float(avg.mean()) - 0.3) < 0.02


def test_average_sigma_uniform_midpoint():
    gen = G.SigmaGenerator(sigma_min=0.1, sigma_max=0.5)
    avg = gen.average(n=512, batch_size=64, key=jax.random.key(6))["sigma"]
    assert abs(float(jnp.asarray(avg).mean()) - 0.3) < 0.02


def test_set_seed_string_matches_step_string(key):
    """r5 review: rng_manual_seed('str'); step() must draw the same params as
    step(seed='str') — and neither may overflow jax.random.key."""
    from deepinv_tpu.physics.generator import SigmaGenerator

    g1 = SigmaGenerator()
    g1.rng_manual_seed("some/file/path_42.png")
    a = g1.step(batch_size=2)
    b = SigmaGenerator().step(batch_size=2, seed="some/file/path_42.png")
    np.testing.assert_allclose(np.asarray(a["sigma"]), np.asarray(b["sigma"]))
