"""Docstring examples run as tests over the WHOLE package.

The reference CI runs ``pytest --doctest-modules`` across every module
(SURVEY.md §4, .github/workflows/test_cpu.yml:26). This mirrors that with
auto-discovery (VERDICT r2 next-step #8): every module under ``deepinv_tpu``
is imported and its ``>>>`` examples executed — modules added later join
automatically. A short skip-list covers modules whose import has side
effects unsuitable for the test environment.
"""

import doctest
import importlib
import pkgutil
import warnings

import pytest

import deepinv_tpu

# Modules excluded from the sweep, each with a reason.
SKIP = {
    # serve spins up HTTP-server helpers; exercised by tests/test_utils.py
    "deepinv_tpu.serve",
    # the C++ shared library is loaded via ctypes by native/__init__.py,
    # not importable as a CPython extension module
    "deepinv_tpu.native._native",
}


def _walk_modules():
    names = []
    for info in pkgutil.walk_packages(deepinv_tpu.__path__,
                                      prefix="deepinv_tpu."):
        if info.name in SKIP:
            continue
        names.append(info.name)
    return sorted(names)


MODULES = _walk_modules()


def test_discovery_is_whole_package():
    """The sweep really covers the package (guards against the walk
    silently returning a handful of modules)."""
    assert len(MODULES) > 60, MODULES


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
