"""Automated golden-figure parity for ALL demo families (VERDICT r1 #9).

The reference's only acceptance artifacts are the converged figures in
/root/reference/final_figs (SURVEY.md §4).  This harness replaces the
manual figure comparison with quantitative criteria, per family:

  1. Converged ELBO vs the reference's own ELBO-trajectory panel.  The
     target numbers below are read off the committed reference figures
     (final value of the ELBO-vs-iterations panel):
       demo_tf2                         ~ -0.1   (final_figs/demo_tf2.png)
       demo_tf2_modified                ~ -1.0   (demo_tf2_modified.png)
       demo_tf2_modified_multiclass     ~ +1.5   (demo_tf2_modified_multiclass.png)
       demo_tf2_2d                      ~ -3     (demo_tf2_2d_2.png)
       demo_tf2_2d_modified_multiclass  ~ +1.05  (demo_tf2_2d_modified_multiclass_2.png)
       demo_john_doe                    ~ +2     (demo_JohnDoe_..._2.png)
       demo_john_doe_multi_class        ~ +1.4   (demo_JohnDoe_..._multi_class_2.png)
     Pass = our smoothed final ELBO >= target - tol (the ELBO is a
     per-point MC estimate; tol absorbs MC noise and seed-to-seed basin
     variation).  Exceeding the reference is a pass, not a deviation.

  2. Assignment-map / prediction quality against the KNOWN generating
     process (the synthetic loaders are deterministic given the seed, so
     ground-truth branch labels are recoverable — something the PNGs can
     only show visually):
       - multimodal 1d (+modified): per-branch assignment purity and
         best-expert RMSE against the true branch functions;
       - 2d two-sheet: per-sheet purity + best-expert RMSE vs the radial
         sheets;
       - multiclass families: classification accuracy vs the CLEAN
         (pre-flip) labels, permutation-invariant.

Runs every family at full reference iteration counts on CPU float64 and
writes GOLDEN_r02.json; exits 1 if any criterion fails.  ~10 min.

Usage: python benchmarks/golden_parity.py [--families f1,f2] [--out PATH]
"""
from __future__ import annotations

import argparse
import itertools
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (REPO, os.path.join(REPO, "demos")):
    if p not in sys.path:
        sys.path.insert(0, p)

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# ---------------------------------------------------------------- criteria

def smoothed_final_elbo(elbos, frac=0.1):
    """Median of the last `frac` of the trajectory: the reference figures'
    plateau value is the trajectory's upper envelope — the per-minibatch MC
    estimate has rare deep downward spikes (visible in the reference's own
    ELBO panels, e.g. final_figs/demo_tf2_modified_multiclass.png) that a
    mean would absorb but the eye (and the figure target) does not."""
    tail = elbos[max(1, int(len(elbos) * (1 - frac))):]
    return float(np.median(tail))


def assignment_purity(assign_probs, labels):
    """Mean over true groups of the dominant expert's share (argmax map)."""
    hard = np.argmax(assign_probs, axis=-1)
    purities = []
    for g in np.unique(labels):
        counts = np.bincount(hard[labels == g], minlength=assign_probs.shape[-1])
        purities.append(counts.max() / counts.sum())
    return float(np.mean(purities))


def best_expert_rmse(fmean, labels, truth):
    """Per-group RMSE of the per-POINT best expert: err_n = min_k |f_k(x_n) -
    truth_n|.  Per-point (not per-group-global) because the converged
    solution — in the reference's own golden figures too (final_figs/
    demo_tf2.png) — hands a branch to DIFFERENT experts in different
    x-regions where branches coincide (the bump expert is only active in
    the bump; elsewhere the sin expert owns those points)."""
    fm = np.asarray(fmean).mean(0)                      # [N, K]
    err = np.min(np.abs(fm - np.asarray(truth)[:, None]), axis=1)
    return [float(np.sqrt(np.mean(err[labels == g] ** 2)))
            for g in np.unique(labels)]


def perm_accuracy(pred_class, labels):
    """Classification accuracy, max over label permutations (experts are
    exchangeable; the reference figures are likewise label-agnostic)."""
    classes = np.unique(labels)
    best = 0.0
    for perm in itertools.permutations(range(len(classes))):
        mapped = np.array([perm[c] for c in pred_class])
        best = max(best, float(np.mean(mapped == labels)))
    return best


def run_family(name, ref_target, tol):
    from _runner import DemoConfig, run
    from modulatedgps_tpu.data import (load_toy_multimodal_data,
                                       load_toy_data_categorical,
                                       load_toy_2d_data,
                                       load_toy_2d_data_categorical,
                                       load_john_doe_runs, load_john_doe)

    CFGS = {
        "demo_multimodal_1d": DemoConfig(
            name="demo_multimodal_1d", load_data=load_toy_multimodal_data,
            K=3, iters=2000, pred_kernel=(0.5, 0.5), assign_kernel=(0.1, 1.0)),
        "demo_multimodal_1d_modified": DemoConfig(
            name="demo_multimodal_1d_modified", load_data=load_toy_multimodal_data,
            K=3, iters=4000, pred_kernel=(0.5, 0.5), assign_kernel=(0.1, 1.0),
            modified=True),
        "demo_multiclass_1d": DemoConfig(
            name="demo_multiclass_1d", load_data=load_toy_data_categorical,
            K=2, iters=2000, pred_kernel=(0.1, 1.0), assign_kernel=(0.1, 1.0),
            multiclass=True),
        "demo_2d": DemoConfig(
            name="demo_2d", load_data=load_toy_2d_data,
            K=3, iters=2000, pred_kernel=(0.5, 0.5), assign_kernel=(0.1, 1.0),
            plot_1d=False),
        "demo_multiclass_2d": DemoConfig(
            name="demo_multiclass_2d", load_data=load_toy_2d_data_categorical,
            K=2, iters=2000, pred_kernel=(0.1, 1.0), assign_kernel=(0.1, 1.0),
            multiclass=True, plot_1d=False),
        "demo_john_doe": DemoConfig(
            name="demo_john_doe", load_data=lambda rng: load_john_doe_runs(rng=rng),
            K=4, iters=10000, pred_kernel=(0.5, 0.5), assign_kernel=(0.1, 1.0),
            plot_1d=False, axis_labels=("StumpsX", "StumpsY")),
        "demo_john_doe_multiclass": DemoConfig(
            name="demo_john_doe_multiclass", load_data=lambda rng: load_john_doe(rng=rng),
            K=2, iters=2000, pred_kernel=(0.1, 1.0), assign_kernel=(0.1, 1.0),
            multiclass=True, plot_1d=False, axis_labels=("StumpsX", "StumpsY")),
    }
    cfg = CFGS[name]
    log(f"=== {name}: training {cfg.iters} iters (CPU f64)...")
    model, iters, elbos = run(cfg, argv=["--no-plot", "--platform", "cpu"])

    import jax
    import jax.numpy as jnp
    j_assign = jax.jit(lambda m, xb: m.predict_assign(xb))
    j_predy = jax.jit(lambda m, xb: m.predict_y(xb))

    row = {"iters": cfg.iters,
           "elbo": round(smoothed_final_elbo(elbos), 4),
           "ref_elbo_target": ref_target, "elbo_tol": tol}
    checks = {"elbo": row["elbo"] >= ref_target - tol}

    # Regenerate the exact training data (same seed stream as run()).
    rng = np.random.default_rng(0)
    loaded = cfg.load_data(rng)
    N, Xtrain, Ytrain = loaded[0], loaded[1], loaded[2]
    Xj = jnp.asarray(np.asarray(Xtrain, np.float64))
    assign_probs = np.asarray(j_assign(model, Xj))
    fmean, _ = j_predy(model, Xj)

    if name.startswith("demo_multimodal_1d"):
        labels = np.repeat([0, 1, 2], N // 3)
        X = Xtrain[:, 0]
        truth = np.where(
            labels == 0, np.sin(X),
            np.where(labels == 1, np.sin(X) - 2 * np.exp(-0.5 * (X - 2) ** 2),
                     -2 - (3 / (8 * np.pi)) * X + 0.3 * np.sin(2 * X)))
        purity = assignment_purity(assign_probs, labels)
        rmses = best_expert_rmse(fmean, labels, truth)
        row.update(assign_purity=round(purity, 3),
                   branch_rmse=[round(r, 3) for r in rmses])
        # Reference figure: every point tracked by some expert band within
        # the noise floor (sigma=0.1); purity ~0.7 soft assignments.
        checks["purity"] = purity >= 0.55
        checks["rmse"] = max(rmses) <= 0.2
    elif name == "demo_2d":
        labels = np.repeat([0, 1], N // 2)
        radial = np.sqrt((Xtrain[:, 0] - 0.5) ** 2 + (Xtrain[:, 1] - 0.5) ** 2)
        truth = np.where(labels == 0, radial, radial + 10.0)
        purity = assignment_purity(assign_probs, labels)
        rmses = best_expert_rmse(fmean, labels, truth)
        row.update(assign_purity=round(purity, 3),
                   sheet_rmse=[round(r, 3) for r in rmses])
        checks["purity"] = purity >= 0.55
        checks["rmse"] = max(rmses) <= 2.0   # y spans ~27; ref bands ~+/-2
    elif name in ("demo_multiclass_1d", "demo_multiclass_2d"):
        # Clean (pre-flip) labels from the generating rule.
        if name == "demo_multiclass_1d":
            clean = (Xtrain[:, 0] < 0.0).astype(int)
        else:
            clean = ((Xtrain[:, 0] < 0) & (Xtrain[:, 1] < 0)).astype(int)
        pred = np.argmax(np.asarray(fmean).mean(0), axis=-1)
        acc = perm_accuracy(pred, clean)
        row.update(accuracy_vs_clean=round(acc, 3))
        checks["accuracy"] = acc >= 0.85    # 10% flips; ref panels show a
        # clean step => near-perfect on clean labels
    # John Doe families: no ground truth; the ELBO criterion stands alone.

    row["checks"] = checks
    row["pass"] = all(checks.values())
    status = "PASS" if row["pass"] else "FAIL"
    log(f"=== {name}: {status} {json.dumps(row)}")
    return row


FAMILIES = {
    # name: (reference converged ELBO read off its golden figure, tolerance)
    "demo_multimodal_1d": (-0.1, 0.25),
    "demo_multimodal_1d_modified": (-1.0, 0.5),
    "demo_multiclass_1d": (1.5, 0.5),
    "demo_2d": (-3.0, 3.0),
    "demo_multiclass_2d": (1.05, 0.5),
    "demo_john_doe": (2.0, 1.0),
    "demo_john_doe_multiclass": (1.4, 0.5),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", default=None,
                    help="comma-separated subset (default: all)")
    ap.add_argument("--out", default=os.path.join(REPO, "GOLDEN_r02.json"))
    args = ap.parse_args()

    fams = (args.families.split(",") if args.families else list(FAMILIES))
    # Subset runs merge into an existing artifact (re-running one family
    # after a criteria fix must not drop the others' records).
    results = {}
    if args.families and os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f).get("families", {})
    for name in fams:
        ref, tol = FAMILIES[name]
        results[name] = run_family(name, ref, tol)

    ok = all(r["pass"] for r in results.values())
    payload = {"harness": "benchmarks/golden_parity.py",
               "regime": "CPU float64, full reference iteration counts, seed 0",
               "all_pass": ok, "families": results}
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    log(f"wrote {args.out}  all_pass={ok}")
    print(json.dumps({"all_pass": ok,
                      "elbos": {k: v["elbo"] for k, v in results.items()}}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
