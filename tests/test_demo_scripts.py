"""End-to-end smoke of the demo CLI scripts (subprocess, tiny budgets).

The golden tests exercise the library flows; these guard the demo scripts
themselves — argument parsing, env bootstrap, headless figure pipeline —
the reference's only acceptance surface (SURVEY.md §4)."""
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_DEMOS = os.path.join(_REPO, "demos")


def _run(script, *extra):
    env = dict(os.environ, PYTHONPATH=_REPO)
    res = subprocess.run(
        [sys.executable, script, "--platform", "cpu", "--no-plot", *extra],
        cwd=_DEMOS, env=env, capture_output=True, text=True, timeout=420)
    assert res.returncode == 0, f"{script} failed:\n{res.stdout}\n{res.stderr}"
    return res.stdout


@pytest.mark.parametrize("script,extra", [
    ("demo_multimodal_1d.py", ("--iters", "30")),
    ("demo_vgp_bernoulli.py", ("--iters", "60")),
    ("demo_multiclass_svgp.py", ("--iters", "30")),
])
def test_demo_script_smoke(script, extra):
    out = _run(script, *extra)
    assert "ELBO" in out or "p(y=1|x)" in out


def test_demo_debug_nans_flag():
    out = _run("demo_svgp.py", "--iters", "20", "--debug-nans")
    assert "RMSE" in out
