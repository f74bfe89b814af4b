"""Per-chip roofline accounting for the hot ops (BASELINE.md target:
K(X,Z) + Cholesky >= 70% of per-chip roofline).

For each op we count FLOPs and HBM bytes analytically, compute the roofline
bound min(peak_flops, bandwidth * arithmetic_intensity), and report the
achieved fraction.  Ops are chained inside one jit with a data dependency
between repetitions so XLA cannot CSE the repeats, and timed at TWO chain
lengths (R and 2R): per-op time = (T(2R) - T(R)) / R, which cancels the
relay's fixed per-dispatch latency (~22 ms — would otherwise bias every
number by 22/R ms; round-1 numbers had exactly that flaw).  The kxz chain
carry is a small slice of the (opaque) Pallas output rather than a
full-matrix reduction — a 268 MB jnp.sum costs ~1 ms on its own and was
the other round-1 bias.

Measured ops (the conditional's compute chain, SURVEY.md §2.2):
  kxz          fused squared-distance + exp build of K(X, Z)   [N x M]
  cholesky     chol(Kmm) at M                                   [M x M]
  conditional  full sgp marginal: chol + solves + q_sqrt matmuls

Peaks default to TPU v5e (197 TFLOP/s bf16, 819 GB/s HBM); override with
--peak-tflops / --hbm-gbps for other chips.  fp32 MXU passes run at roughly
1/4 the bf16 peak; the fp32 peak is derived accordingly.

Usage:
    python benchmarks/roofline.py --platform tpu
    python benchmarks/roofline.py --platform cpu --N 2048 --M 512  # smoke
Emits one JSON line per op on stdout; diagnostics on stderr.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--platform", choices=["cpu", "tpu"], default="tpu")
    p.add_argument("--N", type=int, default=16384)
    p.add_argument("--M", type=int, default=4096)
    p.add_argument("--D", type=int, default=8)
    p.add_argument("--K", type=int, default=8)
    p.add_argument("--reps", type=int, default=8, help="chained reps per call")
    p.add_argument("--trials", type=int, default=4)
    p.add_argument("--peak-tflops", type=float, default=197.0,
                   help="bf16 matmul peak, TFLOP/s (v5e default)")
    p.add_argument("--hbm-gbps", type=float, default=819.0)
    p.add_argument("--backend", choices=["xla", "pallas"], default="xla")
    p.add_argument("--parts", action="store_true",
                   help="also measure the conditional chain's parts "
                        "individually (chol, triangular inverse, Kmn build, "
                        "matmul core) — the MEASURED composition ceiling: "
                        "if sum(parts) ~= chain time, the chain is at the "
                        "ceiling set by its latency-bound sequential parts "
                        "(VERDICT r2 weak #3)")
    args = p.parse_args()

    if args.platform == "cpu":
        for v in ("PALLAS_AXON_REMOTE_COMPILE", "PALLAS_AXON_POOL_IPS",
                  "AXON_LOOPBACK_RELAY"):
            os.environ.pop(v, None)
    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from modulatedgps_tpu.ops import linalg
    from modulatedgps_tpu.ops.kernels import SquaredExponential
    from modulatedgps_tpu.ops.conditionals import base_conditional

    if args.backend == "pallas":
        from modulatedgps_tpu.ops import pallas_linalg
        pallas_linalg.register()
        linalg.set_backend("pallas")
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        linalg.set_fast_solves(True)

    N, M, D, K, R = args.N, args.M, args.D, args.K, args.reps
    dtype = jnp.float32
    peak_flops = args.peak_tflops * 1e12
    # The distance cross-term runs precision=HIGHEST (6-pass) and Cholesky
    # panels are fp32: use a 4x derate for fp32-dominated ops.
    peak_flops_fp32 = peak_flops / 4.0
    bw = args.hbm_gbps * 1e9

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(N, D)), dtype)
    Z = jnp.asarray(rng.normal(size=(M, D)), dtype)
    q_mu = jnp.asarray(rng.normal(size=(M, K)), dtype)
    q_sqrt = jnp.tril(jnp.asarray(rng.normal(size=(K, M, M)), dtype) * 0.1) \
        + jnp.eye(M, dtype=dtype)
    kern = SquaredExponential.create(1.0, 1.0, dtype=dtype)
    A0 = jnp.asarray(rng.normal(size=(M, M)), dtype)
    Kmm0 = A0 @ A0.T / M + 2.0 * jnp.eye(M, dtype=dtype)

    def chain(body, length):
        """Run body `length` times with a scalar data dependency between reps."""
        def run(c0, *operands):
            def step(c, _):
                return body(c, *operands), None
            c, _ = jax.lax.scan(step, c0, None, length=length)
            return c
        return jax.jit(run)

    def timed(body, *arr):
        """Two-point slope timing: (T(2R) - T(R)) / R cancels the fixed
        per-dispatch overhead (axon relay ~22 ms) exactly.  A non-positive
        slope means the op is too cheap at this chain length for the relay
        noise (an INVALID measurement, not an infinitely fast op — advisor
        r2 low): retry with doubled reps up to 8x before giving up."""
        reps = R
        for attempt in range(4):
            totals = []
            for length in (reps, 2 * reps):
                fn = chain(body, length)
                float(fn(jnp.zeros((), dtype), *arr))  # compile + warm
                best = float("inf")
                for _ in range(args.trials):
                    t0 = time.perf_counter()
                    float(fn(jnp.zeros((), dtype), *arr))
                    best = min(best, time.perf_counter() - t0)
                totals.append(best)
            slope = totals[1] - totals[0]
            if slope > 0:
                return slope / reps
            log(f"slope invalid at reps={reps} (T(R)={totals[0]:.4f}s "
                f"T(2R)={totals[1]:.4f}s); retrying with reps={2 * reps}")
            reps *= 2
        raise RuntimeError(
            f"slope timing invalid after reps escalation to {reps} — "
            "rerun with more --reps/--trials")

    results = []

    # ---- measured HBM stream bandwidth (r5, VERDICT r4 #2) ---------------
    # The nameplate bw (819 GB/s v5e) is a read+write aggregate no real
    # elementwise op achieves; memory-bound ops must be judged against the
    # bandwidth the chip actually delivers on a pure stream.  Calibrate
    # with y = x * c over a large array: traffic = 1 read + 1 write of the
    # whole buffer, zero reuse, trivially fused — the closest measurable
    # proxy to "speed of light" for the write-dominated kxz build.
    cal_elems = min(64 * 1024 * 1024, 4 * N * M)   # 256 MB f32 cap
    Xcal = jnp.asarray(rng.normal(size=(cal_elems,)), dtype)

    # The big array itself is the scan CARRY: each rep reads the carry and
    # writes a new one (1R + 1W of the full buffer, cannot be DCE'd or
    # sliced away — a scalar-carry version measured 8x nameplate because
    # XLA computed only the sliced elements of the final rep).
    def stream_chain(length):
        def run(x):
            def step(c, _):
                return c * jnp.asarray(1.0000001, dtype), None
            c, _ = jax.lax.scan(step, x, None, length=length)
            return jnp.sum(c[:128])
        return jax.jit(run)

    reps_cal = 16
    totals = []
    for length in (reps_cal, 2 * reps_cal):
        fn = stream_chain(length)
        float(fn(Xcal))
        best = float("inf")
        for _ in range(args.trials):
            t0 = time.perf_counter()
            float(fn(Xcal))
            best = min(best, time.perf_counter() - t0)
        totals.append(best)
    t_stream = (totals[1] - totals[0]) / reps_cal
    bw_meas = 2 * 4 * cal_elems / t_stream
    log(f"stream calibration: {t_stream * 1e3:.3f} ms for "
        f"{2 * 4 * cal_elems / 1e9:.2f} GB -> {bw_meas / 1e9:.1f} GB/s "
        f"({100 * bw_meas / bw:.1f}% of nameplate)")
    results.append({"metric": "hbm_stream_bw", "value": round(bw_meas / 1e9, 1),
                    "unit": "GB/s",
                    "fraction_of_nameplate": round(bw_meas / bw, 3)})

    def report(name, t, flops, bytes_, peak):
        ai = flops / bytes_
        roof = min(peak, bw * ai)
        roof_meas = min(peak, bw_meas * ai)
        achieved = flops / t
        frac = achieved / roof
        frac_meas = achieved / roof_meas
        binding = "memory" if bw_meas * ai < peak else "compute"
        log(f"{name:12s} {t * 1e3:8.3f} ms  {achieved / 1e9:10.1f} GFLOP/s  "
            f"AI={ai:8.1f}  roof={roof / 1e9:10.1f}  {100 * frac:5.1f}% "
            f"(vs measured-{binding} ceiling {100 * frac_meas:5.1f}%)")
        results.append({"metric": f"roofline_{name}", "value": round(frac, 4),
                        "unit": "fraction_of_roofline",
                        "gflops": round(achieved / 1e9, 1),
                        "ms": round(t * 1e3, 3),
                        "binding_ceiling": binding,
                        "frac_of_measured_ceiling": round(frac_meas, 4)})

    # -- K(X, Z) build: NM(2D+1) matmul flops + ~4 NM epilogue flops -------
    # The kernel pytree is passed as a jit ARGUMENT (never closed over: a
    # compiled closure-constant device array poisons every subsequent
    # dispatch on the TPU path — repo CLAUDE.md).
    # Match the REAL dispatch predicate (advisor r2 low): the Pallas kxz
    # route needs f32 2-D inputs AND N*M >= MIN_DISPATCH_ELEMS; with small
    # --N/--M the XLA path runs and needs the full-matrix anti-DCE carry.
    from modulatedgps_tpu.ops import pallas_kernels
    pallas_kxz = on_tpu and N * M >= pallas_kernels.MIN_DISPATCH_ELEMS
    def kxz_body(c, kern, X, Z):
        Kxz = kern.K(X + c, Z)
        if pallas_kxz:
            # The Pallas call is opaque to XLA: a slice carry cannot DCE
            # the build, and avoids paying for a full-matrix reduction.
            return jnp.sum(Kxz[:8, :128]) * jnp.asarray(1e-12, dtype)
        # XLA path: sum the whole matrix, else XLA dead-code eliminates
        # most of the build.
        return jnp.sum(Kxz) * jnp.asarray(1e-12, dtype)

    t = timed(kxz_body, kern, X, Z)
    flops = N * M * (2 * D + 5)
    bytes_ = 4 * (N * D + M * D + N * M)
    report("kxz", t, flops, bytes_, peak_flops_fp32)

    # -- Cholesky at M ------------------------------------------------------
    def chol_body(c, Kmm):
        L = linalg.cholesky(Kmm + c * jnp.eye(M, dtype=dtype))
        return jnp.sum(jnp.diagonal(L)) * jnp.asarray(1e-12, dtype)

    t = timed(chol_body, Kmm0)
    flops = M ** 3 / 3
    bytes_ = 4 * (2 * M * M)
    report("cholesky", t, flops, bytes_, peak_flops_fp32)
    t_chol_M = t

    # ---- measured critical-path ceiling for Cholesky (r5, VERDICT #3) ----
    # Cholesky is NOT a roofline op: the diagonal-panel factorizations are
    # a sequential dependency chain no amount of FLOP/s can parallelize
    # away.  Model: a right-looking blocked factorization with panel width
    # B does nb = M/B sequential panel factorizations (each measured here
    # as a standalone chol at B — itself the irreducible serial kernel)
    # plus TRSM/SYRK trailing updates that are dense MXU work (M^3/3 total
    # FLOPs at the fp32 peak) plus one read+write of the matrix at the
    # MEASURED stream bandwidth.  The ceiling is min over B; the honest
    # claim for the XLA forward is its ratio to this measured bound.
    if M >= 2048:
        chol_ceiling = None
        for B in (256, 512):
            KmmB = Kmm0[:B, :B]
            eyeB = jnp.eye(B, dtype=dtype)

            def cholB_body(c, Kb):
                L = jnp.linalg.cholesky(Kb + c * eyeB)
                return jnp.sum(jnp.diagonal(L)) * jnp.asarray(1e-12, dtype)

            t_panel = timed(cholB_body, KmmB)
            nb = M // B
            serial = nb * t_panel
            mxu = (M ** 3 / 3) / peak_flops_fp32
            mem = 2 * 4 * M * M / bw_meas
            model = serial + mxu + mem
            log(f"chol ceiling model B={B}: {nb} x {t_panel * 1e3:.3f} ms "
                f"serial + {mxu * 1e3:.3f} MXU + {mem * 1e3:.3f} mem = "
                f"{model * 1e3:.3f} ms")
            if chol_ceiling is None or model < chol_ceiling[0]:
                chol_ceiling = (model, B, t_panel, serial, mxu, mem)
        model, B, t_panel, serial, mxu, mem = chol_ceiling
        ratio = t_chol_M / model
        log(f"cholesky measured critical-path ceiling {model * 1e3:.3f} ms "
            f"(B={B}); XLA forward {t_chol_M * 1e3:.3f} ms = {ratio:.2f}x")
        results.append({
            "metric": "cholesky_critical_path_ceiling",
            "ceiling_ms": round(model * 1e3, 3),
            "best_panel_B": B,
            "panel_chol_ms": round(t_panel * 1e3, 3),
            "parts_ms": {"serial_panels": round(serial * 1e3, 3),
                         "mxu_updates": round(mxu * 1e3, 3),
                         "memory": round(mem * 1e3, 3)},
            "xla_forward_ms": round(t_chol_M * 1e3, 3),
            "xla_over_ceiling": round(ratio, 3),
        })

    # -- Full conditional: chol + solve + K q_sqrt^T A matmuls -------------
    def cond_body(c, kern, X, Z, Kmm, q_mu, q_sqrt):
        Kmn = kern.K(Z, X + c)
        Knn = kern(X + c, full_cov=False)
        # Kmm must depend on the carry or XLA hoists chol out of the loop.
        fmean, fvar = base_conditional(Kmn, Kmm + c * jnp.eye(M, dtype=dtype),
                                       Knn, q_mu, q_sqrt=q_sqrt,
                                       full_cov=False, white=True)
        return (jnp.sum(fmean) + jnp.sum(fvar)) * jnp.asarray(1e-12, dtype)

    t_chain = timed(cond_body, kern, X, Z, Kmm0, q_mu, q_sqrt)
    # chol (M^3/3) + explicit inverse (~M^3) + A solve-as-matmul (2M^2 N)
    # + K q_sqrt^T A batched matmuls (2 K M^2 N) + moment epilogues.
    flops = (4 * M ** 3 / 3 + 2 * M * M * N + 2 * K * M * M * N
             + 4 * M * N * K)
    bytes_ = 4 * (N * D + M * D + N * M + M * M * (K + 2) + 2 * N * K)
    report("conditional", t_chain, flops, bytes_, peak_flops)

    if args.parts:
        # ---- measured composition ceiling of the conditional chain -------
        # Each part timed standalone with the same slope methodology; if the
        # parts SUM to ~the chain time, composition (fusion/overlap) loses
        # nothing and the chain's roofline fraction is capped by the parts'
        # own floors — chol and the triangular inverse are sequential
        # substitution ops (latency-bound at small M), Kmn is memory-bound.
        L0 = jax.jit(jnp.linalg.cholesky)(Kmm0)
        Linv0 = jax.jit(linalg.triangular_inverse)(L0)
        eyeM = jnp.eye(M, dtype=dtype)

        def trinv_body(c, L):
            Li = linalg.triangular_inverse(L + c * eyeM)
            return jnp.sum(jnp.diagonal(Li)) * jnp.asarray(1e-12, dtype)

        t_trinv = timed(trinv_body, L0)
        report("part_trinv", t_trinv, M ** 3 / 3, 4 * (2 * M * M),
               peak_flops_fp32)

        def kmn_body(c, kern, Z, X):
            Kmn = kern.K(Z, X + c)
            if pallas_kxz:
                return jnp.sum(Kmn[:8, :128]) * jnp.asarray(1e-12, dtype)
            return jnp.sum(Kmn) * jnp.asarray(1e-12, dtype)

        t_kmn = timed(kmn_body, kern, Z, X)
        report("part_kmn", t_kmn, N * M * (2 * D + 5),
               4 * (N * D + M * D + N * M), peak_flops_fp32)

        def core_body(c, kern, X, Linv, Kmn, q_mu, q_sqrt):
            # base_conditional's post-factorization math with Lm^-1 given:
            # A, fvar diag, q_sqrt quadratic form, fmean (white=True).
            Knn = kern(X + c, full_cov=False)
            A = jnp.matmul(Linv, Kmn + c, preferred_element_type=dtype)
            fvar = Knn - jnp.sum(jnp.square(A), axis=-2)
            fmean = jnp.matmul(jnp.swapaxes(A, -1, -2), q_mu,
                               preferred_element_type=dtype)
            LT = jnp.swapaxes(jnp.tril(q_sqrt), -1, -2)
            LTA = jnp.matmul(LT, A[None], preferred_element_type=dtype)
            fvar = fvar[None] + jnp.sum(jnp.square(LTA), axis=-2)
            return (jnp.sum(fmean) + jnp.sum(fvar)) * jnp.asarray(1e-12, dtype)

        Kmn0 = jax.jit(lambda Z, X: kern.K(Z, X))(Z, X)
        t_core = timed(core_body, kern, X, Linv0, Kmn0, q_mu, q_sqrt)
        core_flops = 2 * M * M * N + 2 * K * M * M * N + 4 * M * N * K
        report("part_core", t_core, core_flops,
               4 * (N * M * (K + 2) + M * M * (K + 1)), peak_flops)

        t_sum = t_chain  # chain includes chol too
        def chol_only(c, Kmm):
            L = linalg.cholesky(Kmm + c * jnp.eye(M, dtype=dtype))
            return jnp.sum(jnp.diagonal(L)) * jnp.asarray(1e-12, dtype)
        t_chol = timed(chol_only, Kmm0)
        parts_sum = t_chol + t_trinv + t_kmn + t_core
        ai = flops / bytes_
        roof = min(peak_flops, bw * ai)
        ceiling_frac = flops / parts_sum / roof
        comp_eff = parts_sum / t_chain
        log(f"parts: chol {t_chol*1e3:.3f} + trinv {t_trinv*1e3:.3f} + "
            f"kmn {t_kmn*1e3:.3f} + core {t_core*1e3:.3f} = "
            f"{parts_sum*1e3:.3f} ms vs chain {t_chain*1e3:.3f} ms "
            f"(composition eff {comp_eff:.2f}); measured ceiling "
            f"{100*ceiling_frac:.1f}% of roof")
        results.append({
            "metric": "conditional_parts",
            "parts_ms": {"chol": round(t_chol * 1e3, 3),
                         "trinv": round(t_trinv * 1e3, 3),
                         "kmn": round(t_kmn * 1e3, 3),
                         "core": round(t_core * 1e3, 3)},
            "parts_sum_ms": round(parts_sum * 1e3, 3),
            "chain_ms": round(t_chain * 1e3, 3),
            "composition_efficiency": round(comp_eff, 3),
            "measured_ceiling_fraction": round(ceiling_frac, 4),
        })

    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
