"""Test configuration: CPU backend with 8 virtual devices.

Mirrors the reference's CI strategy (deepinv/tests/conftest.py:120-190):
odd-sized images to catch shape bugs, seeded rngs, and — instead of
``torch.multiprocessing.spawn`` distributed workers
(test_distributed.py:50-302) — a *virtual 8-device mesh* via
``xla_force_host_platform_device_count`` so every sharding test runs
single-process.
"""

import os

# must run before jax initializes its backends
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: the suite is compile-bound on the 1-CPU CI
# host; a warm cache cuts wall time by ~x3 (cache lives in repo-root
# .jax_cache/, shared with bench.py, gitignored). Override the location
# with DEEPINV_TPU_JAX_CACHE (point it at an empty dir to measure the
# cold-cache gate time — README "CI budget").
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get(
        "DEEPINV_TPU_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp
import numpy as np
import pytest


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run slow-marked tests (big model ports, the demo "
             "gallery, 3D physics) — the quick gate skips them")


def pytest_collection_modifyitems(config, items):
    """Deselect slow tests unless --runslow / RUN_SLOW=1 (the reference CI
    splits fast/slow the same way — SURVEY.md §4). The quick gate
    (`pytest tests/ -x -q`) therefore stays under its 10-minute budget."""
    if config.getoption("--runslow") or os.environ.get("RUN_SLOW") == "1":
        return
    if config.getoption("-m"):
        return  # explicit -m selection wins
    skip = pytest.mark.skip(reason="slow: pass --runslow (or RUN_SLOW=1)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def key():
    return jax.random.key(0)


@pytest.fixture
def imsize():
    # odd sizes on purpose, like the reference (conftest.py:129)
    return (3, 37, 31)


@pytest.fixture
def imsize_2c():
    return (2, 37, 31)


@pytest.fixture
def x(key, imsize):
    return jax.random.normal(key, (2,) + imsize)


def assert_close(a, b, rtol=1e-4, atol=1e-5, msg=""):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=rtol, atol=atol, err_msg=msg)
