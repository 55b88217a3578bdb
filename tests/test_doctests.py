"""Docstring examples run as tests (the reference CI runs
``pytest --doctest-modules`` over the whole package — SURVEY.md §4,
.github/workflows/test_cpu.yml:26). Modules with ``:Examples:`` blocks are
enumerated here; every ``>>>`` must execute and match.
"""

import doctest
import importlib
import warnings

import pytest

MODULES = [
    "deepinv_tpu.transform.projective",
    "deepinv_tpu.physics.base",
    "deepinv_tpu.physics.blur",
    "deepinv_tpu.physics.noise",
    "deepinv_tpu.physics.inpainting",
    "deepinv_tpu.physics.mri",
    "deepinv_tpu.physics.tomography",
    "deepinv_tpu.physics.generator.base",
    "deepinv_tpu.physics.generator.blur",
    "deepinv_tpu.optim.optimizers",
    "deepinv_tpu.optim.prior",
    "deepinv_tpu.optim.data_fidelity",
    "deepinv_tpu.optim.dpir",
    "deepinv_tpu.models.base",
    "deepinv_tpu.models.drunet",
    "deepinv_tpu.models.classic",
    "deepinv_tpu.transform.base",
    "deepinv_tpu.transform.geometric",
    "deepinv_tpu.loss.metric",
    "deepinv_tpu.loss.losses",
    "deepinv_tpu.sampling.sde",
    "deepinv_tpu.datasets.base",
    "deepinv_tpu.core.tensorlist",
    "deepinv_tpu.utils.functional",
    "deepinv_tpu.physics.compressed_sensing",
    "deepinv_tpu.optim.linear",
    "deepinv_tpu.optim.bregman",
    "deepinv_tpu.models.wrappers_models",
    "deepinv_tpu.models.precision",
    "deepinv_tpu.unfolded",
    "deepinv_tpu.parallel.context",
    "deepinv_tpu.physics.phase_retrieval",
    "deepinv_tpu.physics.wrappers",
    "deepinv_tpu.models.artifactremoval",
    "deepinv_tpu.sampling.base",
    "deepinv_tpu.training.trainer",
    "deepinv_tpu.physics.singlepixel",
    "deepinv_tpu.loss.measplit",
    "deepinv_tpu.physics.radio",
    "deepinv_tpu.sampling.diffusion",
    "deepinv_tpu.physics.scattering",
    "deepinv_tpu.transform.diffeomorphism",
]


@pytest.mark.parametrize("name", MODULES)
def test_module_doctests(name):
    mod = importlib.import_module(name)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        results = doctest.testmod(
            mod,
            optionflags=doctest.ELLIPSIS | doctest.NORMALIZE_WHITESPACE,
            verbose=False,
        )
    assert results.failed == 0, f"{results.failed} doctest failures in {name}"
