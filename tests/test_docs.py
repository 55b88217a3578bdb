"""Docs stay complete: every public class is reachable from the generated
API reference index (VERDICT r2 next-step #7 done-criterion)."""

import importlib
import inspect
import os
import re
import sys

import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
API_INDEX = os.path.join(HERE, "docs", "api", "index.md")

sys.path.insert(0, os.path.join(HERE, "scripts"))


def test_api_reference_covers_every_public_class():
    if not os.path.exists(API_INDEX):
        pytest.fail("docs/api/index.md missing — run scripts/gen_api_docs.py")
    import gen_api_docs

    indexed = set(re.findall(r"\[`(\w+)`\]", open(API_INDEX).read()))
    missing = {}
    for ns, _title in gen_api_docs.NAMESPACES:
        mod = importlib.import_module(ns)
        for name, v in gen_api_docs._public_names(mod):
            if inspect.isclass(v) and name not in indexed:
                missing.setdefault(ns, []).append(name)
    assert not missing, (
        "public classes absent from docs/api/index.md — rerun "
        f"scripts/gen_api_docs.py: {missing}")


def test_benchmarks_page_exists_and_has_rows():
    path = os.path.join(HERE, "docs", "benchmarks.md")
    assert os.path.exists(path), "run scripts/gen_benchmarks.py"
    body = open(path).read()
    assert body.count("| r0") >= 3, "benchmarks table lost its rows"
