"""Compiled-mode Pallas parity on REAL TPU (VERDICT r1 weak #9).

The CI suite runs every Pallas kernel in interpret mode on CPU; this script
runs them COMPILED on the actual chip against the XLA reference forms and
commits the evidence as PALLAS_TPU_r05.json.  Covered:

  rbf_kxz / matern32_kxz   fused K(X,Z) build (fwd + custom-VJP grads)
  cholesky_blocked          blocked right-looking Cholesky, M in {512, 1024, 4096}
  solve_triangular_blocked  lower/upper x plain/transposed TRSM
  cholesky_large            HBM-resident variant
  qsqrt_sq_colsum           fused q_sqrt quadratic-form epilogue

Tolerances are f32-scale: the Pallas kernels use the same precision policy
as the XLA forms (HIGHEST cross terms, f32 accumulation), so agreement is
tight; grads of the kxz kernels run the XLA backward by construction and
are compared against jax.grad of the pure-XLA form.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/pallas_tpu_parity.py
"""
from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    if jax.default_backend() != "tpu":
        log("not on TPU — refusing to write a parity artifact")
        sys.exit(2)

    from modulatedgps_tpu.ops.pallas_kernels import rbf_kxz, matern32_kxz
    from modulatedgps_tpu.ops.pallas_linalg import (
        cholesky_blocked, solve_triangular_blocked, cholesky_large,
        solve_triangular_large, VMEM_MAX_DIM)
    from modulatedgps_tpu.ops.pallas_quad import (qsqrt_sq_colsum,
                                                  qsqrt_sq_colsum_xla)
    from modulatedgps_tpu.ops import kernels as kmod

    rng = np.random.default_rng(0)
    results = {}

    def record(name, got, want, tol):
        got, want = np.asarray(got), np.asarray(want)
        denom = max(1e-30, float(np.max(np.abs(want))))
        err = float(np.max(np.abs(got - want))) / denom
        results[name] = {"max_rel_err": round(err, 9), "tol": tol,
                         "pass": bool(err <= tol)}
        log(f"{name:34s} rel_err={err:.3e}  tol={tol:.0e}  "
            f"{'PASS' if err <= tol else 'FAIL'}")

    # ---- fused K(X,Z): forward + grads ------------------------------------
    X = jnp.asarray(rng.normal(size=(1000, 3)), jnp.float32)
    Z = jnp.asarray(rng.normal(size=(700, 3)), jnp.float32)
    var, ls = jnp.float32(0.7), jnp.float32(0.9)

    se = kmod.SquaredExponential.create(0.7, 0.9, dtype=jnp.float32)
    m32 = kmod.Matern32.create(0.7, 0.9, dtype=jnp.float32)

    def xla_rbf(X, Z, v, l):
        d2 = (jnp.sum((X / l) ** 2, -1)[:, None] + jnp.sum((Z / l) ** 2, -1)[None, :]
              - 2.0 * jnp.matmul(X / l, (Z / l).T,
                                 precision=jax.lax.Precision.HIGHEST))
        return v * jnp.exp(-0.5 * jnp.maximum(d2, 0.0))

    got = jax.jit(lambda X, Z: rbf_kxz(X, Z, var, ls, False))(X, Z)
    record("rbf_kxz.forward", got, xla_rbf(X, Z, var, ls), 1e-5)

    got = jax.jit(lambda X, Z: matern32_kxz(X, Z, var, ls, False))(X, Z)
    # XLA reference through the kernel API with dispatch forced off
    from modulatedgps_tpu.ops.pallas_kernels import set_kxz_dispatch
    set_kxz_dispatch(False)
    want = jax.jit(lambda X, Z: m32.K(X, Z))(X, Z)
    set_kxz_dispatch(None)
    record("matern32_kxz.forward", got, want, 1e-5)

    # Linear functional sum(K*C): the custom-VJP backward is the XLA
    # formula by construction, so with a cotangent independent of the
    # forward value the grads must agree to f32 roundoff.  (A nonlinear
    # wrapper like sum(sin(K)) makes the cotangent depend on the forward
    # K — the ~1e-6 pallas-vs-XLA forward difference then amplifies to
    # ~5e-3 in dX through cancellation; that is forward sensitivity, not
    # a backward bug, and is checked separately with a loose tolerance.)
    C = jnp.asarray(rng.normal(size=(1000, 700)), jnp.float32)
    gfun = jax.jit(jax.grad(
        lambda X, Z, v, l: jnp.sum(C * rbf_kxz(X, Z, v, l, False)),
        argnums=(0, 1, 2, 3)))
    gref = jax.jit(jax.grad(
        lambda X, Z, v, l: jnp.sum(C * xla_rbf(X, Z, v, l)),
        argnums=(0, 1, 2, 3)))
    for i, nm in enumerate(["dX", "dZ", "dvar", "dls"]):
        record(f"rbf_kxz.grad.{nm}", gfun(X, Z, var, ls)[i],
               gref(X, Z, var, ls)[i], 5e-4)
    gs_fun = jax.jit(jax.grad(
        lambda X, Z, v, l: jnp.sum(jnp.sin(rbf_kxz(X, Z, v, l, False)))))
    gs_ref = jax.jit(jax.grad(
        lambda X, Z, v, l: jnp.sum(jnp.sin(xla_rbf(X, Z, v, l)))))
    record("rbf_kxz.grad.dX.nonlinear-sens", gs_fun(X, Z, var, ls),
           gs_ref(X, Z, var, ls), 2e-2)

    # ---- blocked Cholesky / TRSM ------------------------------------------
    for M in (512, 1024, 4096):
        A = rng.normal(size=(M, M)).astype(np.float32)
        Kmm = jnp.asarray(A @ A.T / M + 2.0 * np.eye(M, dtype=np.float32))
        want_L = jax.jit(jnp.linalg.cholesky)(Kmm)
        if M <= VMEM_MAX_DIM:
            # VMEM-resident kernel (the backend routes M<=VMEM_MAX_DIM here;
            # above that its whole-matrix VMEM window exceeds the chip)
            got_L = jax.jit(lambda K: cholesky_blocked(K))(Kmm)
            record(f"cholesky_blocked.M{M}", got_L, want_L, 5e-4)
        else:
            got_L = jax.jit(lambda K: cholesky_large(K))(Kmm)
            record(f"cholesky_large.M{M}", got_L, want_L, 5e-4)
        if M == 1024:
            got_Lg = jax.jit(lambda K: cholesky_large(K))(Kmm)
            record(f"cholesky_large.M{M}", got_Lg, want_L, 5e-4)
            B = jnp.asarray(rng.normal(size=(M, 2048)), jnp.float32)
            for lower in (True, False):
                for trans in (False, True):
                    Lop = want_L if lower else want_L.T
                    want_X = jax.jit(
                        lambda L, B: jax.scipy.linalg.solve_triangular(
                            L, B, lower=lower, trans=1 if trans else 0))(Lop, B)
                    got_X = jax.jit(
                        lambda L, B: solve_triangular_blocked(
                            L, B, lower=lower, trans=trans))(Lop, B)
                    record(f"trsm.lower={lower}.trans={trans}",
                           got_X, want_X, 2e-3)
        if M == 4096:
            B = jnp.asarray(rng.normal(size=(M, 1024)), jnp.float32)
            for trans in (False, True):
                want_X = jax.jit(
                    lambda L, B: jax.scipy.linalg.solve_triangular(
                        L, B, lower=True, trans=1 if trans else 0))(got_L, B)
                got_X = jax.jit(
                    lambda L, B: solve_triangular_large(
                        L, B, lower=True, trans=trans))(got_L, B)
                record(f"trsm_large.M4096.trans={trans}", got_X, want_X, 2e-3)

    # ---- routed triangular inverse (product path, ops/linalg.py) ----------
    # linalg.triangular_inverse auto-routes to the Pallas TRSM with the
    # solve-free custom VJP at M>=2048 on TPU; check the ROUTED fwd + grads
    # against the XLA oracle at the bench headline size.
    from modulatedgps_tpu.ops import linalg as _lg
    Mtri = 4096
    A = rng.normal(size=(Mtri, Mtri)).astype(np.float32)
    Kt = jnp.asarray(A @ A.T / Mtri + 2.0 * np.eye(Mtri, dtype=np.float32))
    Lt = jax.jit(jnp.linalg.cholesky)(Kt)
    Ct = jnp.asarray(rng.normal(size=(Mtri, Mtri)), jnp.float32)

    def tri_loss(L):
        return jnp.sum(Ct * _lg.triangular_inverse(L))

    assert _lg._pallas_trsm_route(Lt, Lt, _lg._PALLAS_TRINV_MIN_DIM), \
        "routing predicate should fire at M=4096 on TPU"
    got_inv = jax.jit(_lg.triangular_inverse)(Lt)
    got_g = jax.jit(jax.grad(tri_loss))(Lt)
    _lg.set_linalg_dispatch(False)
    want_inv = jax.jit(_lg.triangular_inverse)(Lt)
    want_g = jax.jit(jax.grad(tri_loss))(Lt)
    _lg.set_linalg_dispatch(None)
    record("routed_trinv.M4096.forward", got_inv, want_inv, 5e-4)
    record("routed_trinv.M4096.grad", got_g, want_g, 5e-4)

    # routed chol: XLA forward + substitution-free Murray pullback
    def chol_loss(Km):
        return jnp.sum(Ct * _lg.cholesky(Km))

    got_cg = jax.jit(jax.grad(chol_loss))(Kt)
    _lg.set_linalg_dispatch(False)
    want_cg = jax.jit(jax.grad(chol_loss))(Kt)
    _lg.set_linalg_dispatch(None)
    record("routed_chol.M4096.grad", got_cg, want_cg, 5e-4)

    # ---- fused q_sqrt quadratic form --------------------------------------
    Kq, M, N = 4, 512, 1024
    S = jnp.tril(jnp.asarray(rng.normal(size=(Kq, M, M)), jnp.float32))
    Aop = jnp.asarray(rng.normal(size=(M, N)), jnp.float32)
    got = jax.jit(lambda S, A: qsqrt_sq_colsum(S, A))(S, Aop)
    want = jax.jit(qsqrt_sq_colsum_xla)(S, Aop)
    record("qsqrt_sq_colsum", got, want, 5e-4)

    # ---- tril-blocked quadratic family (r4 default path at M>=2048) -------
    from modulatedgps_tpu.ops import pallas_tril as ptl
    Kq, Mt, Nt = 4, 2048, 1500   # Nt exercises the internal TN padding
    St = jnp.asarray(rng.normal(size=(Kq, Mt, Mt)), jnp.float32)  # raw: the
    At = jnp.asarray(rng.normal(size=(Mt, Nt)) / np.sqrt(Mt), jnp.float32)
    assert ptl.route(At, St), "tril routing should fire at M=2048 on TPU"
    got = jax.jit(ptl.atl_matmul)(At, St)
    want = jax.jit(ptl.atl_matmul_xla)(At, St)   # applies tril itself
    record("tril_atl.M2048.forward", got, want, 2e-3)

    def quad_loss(fn, A, L):
        B = fn(A, L)
        return jnp.sum(jnp.square(B)) / Nt

    got_da, got_dl = jax.jit(jax.grad(
        lambda A, L: quad_loss(ptl.atl_matmul, A, L), argnums=(0, 1)))(At, St)
    want_da, want_dl = jax.jit(jax.grad(
        lambda A, L: quad_loss(ptl.atl_matmul_xla, A, L),
        argnums=(0, 1)))(At, St)
    record("tril_atl.M2048.grad_A", got_da, want_da, 2e-3)
    record("tril_atl.M2048.grad_L", got_dl, want_dl, 2e-3)

    # ---- fused square-colsum variant (B bf16, in-kernel cotangent scale) --
    wt = jnp.asarray(rng.normal(size=(Kq, Nt)), jnp.float32)
    got = jax.jit(ptl.atl_sq_colsum)(At, St)
    want = jax.jit(ptl.atl_sq_colsum_xla)(At, St)
    record("tril_sq_colsum.M2048.forward", got, want, 5e-3)
    got_da, got_dl = jax.jit(jax.grad(
        lambda A, L: jnp.sum(wt * ptl.atl_sq_colsum(A, L)) / Nt,
        argnums=(0, 1)))(At, St)
    want_da, want_dl = jax.jit(jax.grad(
        lambda A, L: jnp.sum(wt * ptl.atl_sq_colsum_xla(A, L)) / Nt,
        argnums=(0, 1)))(At, St)
    record("tril_sq_colsum.M2048.grad_A", got_da, want_da, 5e-3)
    record("tril_sq_colsum.M2048.grad_L", got_dl, want_dl, 5e-3)

    # ---- fused whiten-solve composite pullback (routed at M>=2048) --------
    Kmn_ws = jnp.asarray(rng.normal(size=(Mtri, 512)), jnp.float32)
    Cws = jnp.asarray(rng.normal(size=(Mtri, 512)), jnp.float32)

    def ws_loss(Km, B):
        A = _lg.whiten_solve(Km, B)
        return jnp.sum(jnp.square(A)) / 512 + jnp.sum(Cws * A) / 512

    _lg.set_fast_solves(True)
    got_ws = jax.jit(_lg.whiten_solve)(Kt, Kmn_ws)
    got_gk, got_gb = jax.jit(jax.grad(ws_loss, argnums=(0, 1)))(Kt, Kmn_ws)
    _lg.set_whiten_fused(False)
    want_ws = jax.jit(_lg.whiten_solve)(Kt, Kmn_ws)
    want_gk, want_gb = jax.jit(jax.grad(ws_loss, argnums=(0, 1)))(Kt, Kmn_ws)
    _lg.set_whiten_fused(True)
    record("whiten_solve.M4096.forward", got_ws, want_ws, 5e-4)
    # Gradients: the routed pullback (r5: structured banded kernels) and
    # the unfused composition are DIFFERENT HIGH-class implementations
    # whose mutual distance legitimately exceeds each one's distance to
    # truth — judge each against a host float64 oracle instead
    # (CHOLPREC_TRUTH_r05.json protocol).  Pass = the routed path's error
    # is within 3x the unfused path's own error (same class).
    import numpy as _np
    K64 = _np.asarray(Kt, _np.float64)
    B64 = _np.asarray(Kmn_ws, _np.float64)
    C64 = _np.asarray(Cws, _np.float64)
    L64 = _np.linalg.cholesky(K64)
    Li64 = _np.linalg.inv(L64)
    A64 = Li64 @ B64
    Abar = (2.0 * A64 + C64) / 512.0
    gb64 = Li64.T @ Abar
    Lbar64 = -_np.tril(gb64 @ A64.T)
    P64 = L64.T @ Lbar64
    phi64 = _np.tril(P64) - 0.5 * _np.diag(_np.diag(P64))
    gk64 = Li64.T @ phi64 @ Li64
    gk64 = 0.5 * (gk64 + gk64.T)

    def _err64(x, ref):
        return float(_np.abs(_np.asarray(x, _np.float64) - ref).max()
                     / _np.abs(ref).max())

    for nm, got, want, ref in (("grad_Kmm", got_gk, want_gk, gk64),
                               ("grad_Kmn", got_gb, want_gb, gb64)):
        e_got, e_want = _err64(got, ref), _err64(want, ref)
        ok = e_got <= 3.0 * max(e_want, 1e-6)
        results[f"whiten_solve.M4096.{nm}_vs_f64"] = {
            "routed_rel_err_vs_f64": round(e_got, 9),
            "unfused_rel_err_vs_f64": round(e_want, 9),
            "pass": bool(ok)}
        log(f"whiten_solve.M4096.{nm}: routed {e_got:.3e} vs unfused "
            f"{e_want:.3e} (f64 oracle) -> {'PASS' if ok else 'FAIL'}")

    # ---- fused tril Adam (one real step vs optax, M=2048 tril leaf) -------
    import optax
    from modulatedgps_tpu.training import fused_adam as _mkfa
    params = {"q": jnp.tril(St), "w": jnp.asarray(rng.normal(size=(33,)),
                                                  jnp.float32)}
    grads = {"q": jnp.tril(jnp.asarray(rng.normal(size=(Kq, Mt, Mt)),
                                       jnp.float32)),
             "w": jnp.asarray(rng.normal(size=(33,)), jnp.float32)}
    fa = _mkfa(1e-2)
    oa = optax.adam(1e-2)

    def fa_step(p, g):
        st = fa.init(p)
        p2, _ = fa.update_and_apply(g, st, p)
        return p2

    def oa_step(p, g):
        st = oa.init(p)
        u, _ = oa.update(g, st, p)
        return optax.apply_updates(p, u)

    got_p = jax.jit(fa_step)(params, grads)
    want_p = jax.jit(oa_step)(params, grads)
    record("fused_adam.M2048.q_sqrt", got_p["q"], want_p["q"], 1e-5)
    record("fused_adam.small_leaf", got_p["w"], want_p["w"], 1e-5)

    ok = all(r["pass"] for r in results.values())
    payload = {"device": str(jax.devices()[0]), "all_pass": ok,
               "checks": results}
    out = os.path.join(REPO, "PALLAS_TPU_r05.json")
    with open(out, "w") as f:
        json.dump(payload, f, indent=1)
    log(f"wrote {out}  all_pass={ok}")
    print(json.dumps({"all_pass": ok, "n_checks": len(results)}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
