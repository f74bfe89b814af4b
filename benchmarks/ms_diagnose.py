"""Diagnose multi-start basin selection on a failing seed (r5).

The first f32_ms pass showed 3/8 seeds ending catastrophically (~-0.45
eval ELBO) even though each had 6 replicas to choose from — worse than
the single-run lottery.  Hypothesis: at probe_iters=400 the probe ELBO
ANTI-correlates with final quality (early expert-collapse fits the mean
curve fast, then can't capture multimodality).  This trains every replica
of the given (arm, seed) to the full 2000 iters, recording the train-ELBO
trajectory at checkpoints plus the common-harness f64 eval of the final
model, so the crossing structure — where (if anywhere) the probe becomes
informative — is measured rather than guessed.

Usage: python benchmarks/ms_diagnose.py --seed 0 [--arm f32] [--out F]
CPU-only; one JSON line on stdout.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

NUM_STARTS = 6
ITERS = 2000
CKPTS = (200, 400, 600, 800, 1200, 1600, 2000)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--arm", choices=["f32", "f64_j4"], default="f32")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    for v in ("PALLAS_AXON_REMOTE_COMPILE", "PALLAS_AXON_POOL_IPS",
              "AXON_LOOPBACK_RELAY"):
        os.environ.pop(v, None)
    import jax
    jax.config.update("jax_platforms", "cpu")
    if args.arm == "f64_j4":
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from modulatedgps_tpu import config as mgp_config
    if args.arm == "f64_j4":
        mgp_config.set_default_jitter(1e-4, f32_floor=1e-4)
    from modulatedgps_tpu.data import minibatch_iterator
    from modulatedgps_tpu.training import run_adam, save_checkpoint
    from benchmarks.fp32_ablation import _build_model

    jitter = 1e-4

    replicas = []
    for s in range(NUM_STARTS):
        model, N, Xtrain, Ytrain = _build_model()
        it = minibatch_iterator(Xtrain, Ytrain, 500,
                                seed=1000 * args.seed + s)
        key = jax.random.fold_in(jax.random.PRNGKey(args.seed), s)
        traj = {}
        X = jnp.asarray(Xtrain)
        Y = jnp.asarray(Ytrain)

        # score exactly like run_adam_multistart: mean training_loss over
        # fixed keys on the full data
        def score(m, eval_keys=4):
            sfn = jax.jit(lambda mm, k: -mm.training_loss(k, X, Y))
            ks = [jax.random.PRNGKey(977 + i) for i in range(eval_keys)]
            return float(sum(sfn(m, k) for k in ks)) / eval_keys

        # ONE continuous run (Adam state + key chain intact, exactly what
        # run_adam_multistart's winner would be); score via callback.
        def cb(i, elbo, state):
            if i in CKPTS:
                traj[i] = round(score(state.model), 5)
                log(f"seed {args.seed} replica {s} @ {i}: {traj[i]}")

        trained, _, _ = run_adam(model, ITERS, it, 0.005, key=key,
                                 verbose=False, log_every=min(CKPTS),
                                 callback=cb)
        ckpt = f"/tmp/ms_diag_{args.arm}_s{args.seed}_r{s}.npz"
        save_checkpoint(ckpt, trained)
        # common-harness f64 eval in a subprocess (x64 config)
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        r = subprocess.run(
            [sys.executable,
             os.path.join(REPO, "benchmarks", "fp32_ablation.py"),
             "--run", "eval", "--ckpt", ckpt, "--jitter", str(jitter)],
            env=env, capture_output=True, text=True, timeout=1200)
        final = (json.loads(r.stdout.strip().splitlines()[-1])
                 if r.returncode == 0 else {"elbo": None})
        log(f"seed {args.seed} replica {s}: f64 eval {final.get('elbo')}")
        replicas.append({"replica": s, "train_score_traj": traj,
                         "eval_elbo_f64": final.get("elbo")})

    # Spearman-ish check: does the probe ranking at each checkpoint match
    # the final ranking?
    finals = [r["eval_elbo_f64"] for r in replicas]
    agreement = {}
    if all(f is not None for f in finals):
        best_final = max(range(NUM_STARTS), key=lambda i: finals[i])
        for ck in CKPTS:
            best_probe = max(range(NUM_STARTS),
                             key=lambda i: replicas[i]["train_score_traj"][ck])
            agreement[ck] = {"probe_winner": best_probe,
                             "final_winner": best_final,
                             "match": best_probe == best_final}
    out = {"metric": "multistart_diagnosis", "arm": args.arm,
           "seed": args.seed, "replicas": replicas,
           "probe_vs_final": agreement}
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
