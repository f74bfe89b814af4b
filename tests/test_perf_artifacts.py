"""Round-4 performance-evidence artifacts: existence + invariants.

Pins the committed measurement artifacts the same way
test_golden_artifacts.py pins the quality ones, so a regeneration that
silently degrades the perf story (tril kernels stop winning, bench spread
blows up, serving loses to the training path) fails CI.  Regenerate with
the benchmarks/*.py harnesses on the chip.
"""
import glob
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _latest(pattern):
    paths = sorted(glob.glob(os.path.join(REPO, pattern)))
    assert paths, f"no {pattern} artifact committed"
    with open(paths[-1]) as f:
        return json.load(f)


def test_tril_inchain_ab():
    d = _latest("TRIL_AB_r*.json")
    assert d["parity"]["ok"] is True
    assert d["parity"]["rel_loss"] < 2e-3
    # The kernels must keep winning in-chain at the north-star shape.
    assert d["config"]["M"] >= 4096
    assert d["speedup"] >= 1.3, d["ms_per_step"]


def test_step_attribution_budget():
    d = _latest("STEP_ATTRIB_r*.json")
    ms = d["ms"]
    # Arms are internally consistent: fwd < gradcond < step, and the step
    # matches the bench headline regime (sub-160 ms at M=4096 with the
    # tril kernels routed).
    assert ms["fwd"] < ms["gradcond"] < ms["step"]
    assert d["config"]["M"] == 4096
    assert ms["step"] <= 135.0, ms
    if "cost_analysis" in d:
        # >=62%-of-ideal criterion, measured against the r3 verdict's
        # dense-accounted basis (84.2 ms at this shape); the r4b budget
        # reads 74% (113.9 ms) after the fused whiten-solve pullback,
        # sq-colsum kernels, and fused tril Adam.
        assert 1000 * 84.2 / ms["step"] >= 620, ms


def test_bench_spread_tight():
    d = _latest("BENCH_SPREAD_r*.json")
    assert d["m4096_ms_per_step"]["spread_pct"] <= 5.0
    assert d["m1024_ms_per_step"]["spread_pct"] <= 10.0


def test_serving_beats_training_path():
    d = _latest("SERVING_r*.json")
    assert d["config"]["M"] >= 4096
    assert d["speedup_vs_training_path"] > 1.0
    assert d["points_per_sec_precomputed"] > 100_000
    assert d["breakeven_batches"] is not None and d["breakeven_batches"] <= 50


def test_inducing_audit_n_independent():
    d = _latest("INDUCING_AUDIT_r*.json")
    assert d["payload_independent_of_N"] is True
    ops = {r["op"] for t in d["collectives"].values() for r in t}
    assert "collective-permute" in ops   # the Lq ring
    assert "all-to-all" not in ops


def test_fused_vjp_inchain_ab():
    d = _latest("FUSED_VJP_AB_r*.json")
    assert d["parity"]["ok"] is True
    assert d["config"]["M"] >= 4096
    # The composite whiten-solve pullback must keep winning in-chain.
    assert d["speedup"] >= 1.05, d["ms_per_step"]


def test_sq_colsum_inchain_ab():
    d = _latest("SQ_FUSED_AB_r*.json")
    assert d["parity"]["ok"] is True
    assert d["config"]["M"] >= 4096
    assert d["speedup"] >= 1.02, d["ms_per_step"]


def test_fused_adam_inchain_ab():
    d = _latest("ADAM_FUSED_AB_r*.json")
    assert d["parity"]["ok"] is True
    assert d["config"]["M"] >= 4096
    # Small but real; the gate also guards against the un-aliased-output
    # regression (0.935x) ever shipping again.
    assert d["speedup"] >= 1.0, d["ms_per_step"]
    # Step-1 losses agree at update-rounding level (identical grads).
    a = d["parity"]["losses_optax"][0]
    b = d["parity"]["losses_fused"][0]
    assert abs(a - b) / abs(a) < 1e-6
