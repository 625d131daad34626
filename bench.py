"""Benchmark harness: BASELINE.md config 2 (MrR, 2-D 5-point Laplacian,
N=250k, single chip).

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

``vs_baseline`` is the speedup over a freshly-measured NumPy/SciPy
implementation with the reference's semantics (float64, per-iteration
Python loop — the reference publishes no numbers of its own, see
BASELINE.md, so the baseline is measured in-process on this machine's CPU).
Extra measurements (SpMV nnz/s and GFLOP/s, iteration counts) ride in
"extra".

Measurement discipline (hard-won on the remote-TPU tunnel backend):

* the backend RESULT-CACHES identical executions — repeating the same call
  with the same buffers returns in ~0.3 ms without touching the device, so
  every timed invocation here uses DISTINCT input values;
* each dispatch through the tunnel carries a fixed ~20 ms overhead that is
  not device compute, so the headline time-to-solution is AMORTIZED: NRHS
  distinct right-hand sides are solved sequentially inside ONE jitted
  dispatch (``lax.map`` over the fused whole-solve kernel) and the wall
  time is divided by NRHS.  The single-dispatch wall time is also reported
  (``single_dispatch_wall_s``) for transparency;
* the SpMV rate is slope-based: two fori_loop dispatches with different
  trip counts, rate from the difference, cancelling the fixed overhead.

Stage order is resilience-first: the headline time-to-solution is measured
before the optional SpMV microbenchmark, and the microbenchmark is skipped
when the run is already near its time budget (the remote TPU compile
service occasionally stalls for minutes).
"""

import json
import sys
import time

import numpy as np

_T_START = time.perf_counter()
_BUDGET_S = 420.0


def _stage(msg):
    print(
        f"[bench] {time.strftime('%H:%M:%S')} (+{time.perf_counter()-_T_START:5.1f}s) {msg}",
        file=sys.stderr,
        flush=True,
    )


def numpy_mrr_baseline(A_csr, b, tol, maxiter):
    """Reference-semantics MrR in NumPy (float64, scipy CSR SpMV) used as the
    measured baseline (algorithm per reference: v3/cpu/mrr.py:7-61)."""
    t0 = time.perf_counter()
    n = b.shape[0]
    x = np.zeros(n)
    b_norm = np.linalg.norm(b)
    r = b - A_csr @ x
    Ar = A_csr @ r
    zeta = r.dot(Ar) / Ar.dot(Ar)
    y = zeta * Ar
    z = -zeta * r
    r = r - y
    x = x - z
    i = 1
    while i < maxiter:
        if np.linalg.norm(r) / b_norm < tol:
            break
        Ar = A_csr @ r
        gamma = y.dot(Ar) / y.dot(y)
        s = Ar - gamma * y
        zeta = r.dot(s) / s.dot(s)
        eta = -zeta * gamma
        y = eta * y + zeta * Ar
        z = eta * z - zeta * r
        r = r - y
        x = x - z
        i += 1
    return time.perf_counter() - t0, i, np.linalg.norm(r) / b_norm


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    import krylov_tpu
    from krylov_tpu.sparse.fixtures import laplace2d

    NX = 500  # N = 250,000
    TOL = 1e-5
    MAXITER = 3000
    NRHS = 8
    dtype = np.float32 if jax.default_backend() == "tpu" else np.float64

    _stage("building fixture")
    # Constant-coefficient form of the same operator: per-term scalar
    # weights in SMEM instead of 5 streamed coefficient grids (identical
    # matrix — Dirichlet boundaries come from the zero padding of x).
    A = laplace2d(NX, dtype=dtype, constant=True)
    n = A.shape[0]
    rng = np.random.default_rng(0)
    b = rng.standard_normal(n).astype(dtype)

    # --- Headline: MrR time-to-solution, amortized over NRHS distinct
    # right-hand sides solved sequentially inside one dispatch.  The fused
    # whole-solve-in-one-kernel Pallas path (krylov_tpu/kernels/fused.py)
    # engages automatically on TPU.  Timed like the reference times only
    # its iteration loop (reference: v3/cpu/common.py:9-18).
    def one(bi):
        return krylov_tpu.solve_device(
            A, bi, method="mrr", tol=TOL, maxiter=MAXITER
        )

    many = jax.jit(lambda B: lax.map(one, B))

    _stage("warming batched solve (compile)")
    B_warm = jnp.asarray(
        rng.standard_normal((NRHS, n)).astype(dtype)
    )
    jax.block_until_ready(many(B_warm))

    _stage("timing batched solve (fresh inputs)")
    times = []
    last = None
    for _ in range(2):
        B_t = jnp.asarray(rng.standard_normal((NRHS, n)).astype(dtype))
        jax.block_until_ready(B_t)
        t0 = time.perf_counter()
        last = jax.block_until_ready(many(B_t))
        times.append((time.perf_counter() - t0) / NRHS)
    tpu_time = min(times)

    iters_all = np.asarray(last.iterations)
    iters = int(iters_all[0])
    converged = bool(np.all(np.asarray(last.converged)))
    final_residual = float(
        np.asarray(last.residual_trace)[0, iters]
    )

    # Single fresh-input dispatch wall time (includes tunnel overhead).
    _stage("timing single dispatch")
    single_fn = jax.jit(one)
    b1 = jnp.asarray(rng.standard_normal(n).astype(dtype))
    jax.block_until_ready(single_fn(b1))
    b2 = jnp.asarray(rng.standard_normal(n).astype(dtype))
    jax.block_until_ready(b2)
    t0 = time.perf_counter()
    res1 = jax.block_until_ready(single_fn(b2))
    single_wall = time.perf_counter() - t0

    # True residual of that solve, checked on host against a scipy CSR
    # rebuild (the recurred residual the solver reports drifts in f32; the
    # reference also only ever reports the recurred residual).
    import scipy.sparse as sp

    A64_dia = laplace2d(NX, dtype=np.float64).to_dia()
    ii, jj, vv = [], [], []
    data = np.asarray(A64_dia.data)
    for d, off in enumerate(A64_dia.offsets):
        rows = np.arange(max(0, -off), min(n, n - off))
        ii.append(rows)
        jj.append(rows + off)
        vv.append(data[d, rows])
    A_csr = sp.coo_matrix(
        (np.concatenate(vv), (np.concatenate(ii), np.concatenate(jj))),
        shape=(n, n),
    ).tocsr()
    x1 = np.asarray(res1.x, dtype=np.float64)
    true_residual = float(
        np.linalg.norm(np.asarray(b2, dtype=np.float64) - A_csr @ x1)
        / np.linalg.norm(np.asarray(b2))
    )

    solve_api_time = None
    if time.perf_counter() - _T_START < 150.0:
        _stage("timing solve() api (incl. host transfers)")
        krylov_tpu.solve(A, b, method="mrr", tol=TOL, maxiter=MAXITER)
        b_api = rng.standard_normal(n).astype(dtype)
        t0 = time.perf_counter()
        krylov_tpu.solve(A, b_api, method="mrr", tol=TOL, maxiter=MAXITER)
        solve_api_time = time.perf_counter() - t0

    # --- Fidelity row (BASELINE.md bar: true residual < tol).  Pure f32
    # bottoms out near kappa*eps_f32 ~ 1e-4 here, so the headline's recurred
    # convergence does NOT imply a true residual < 1e-5; ``refine=`` runs
    # float64 defect-correction restarts on the host until the TRUE residual
    # passes tol (the reference's f64 policy, v3/cpu/common.py:23, recovered
    # on f32 hardware).  Reported with its full cost.
    refined = None
    if time.perf_counter() - _T_START < 200.0:
        _stage("refined solve (f64 defect correction to true tol)")
        b_ref = rng.standard_normal(n).astype(dtype)
        t0 = time.perf_counter()
        _, info_ref = krylov_tpu.solve(
            A, b_ref, method="mrr", tol=TOL, maxiter=MAXITER, refine=3
        )
        refined = {
            "refined_solve_s": round(time.perf_counter() - t0, 6),
            "refined_true_residual": float(info_ref["true_residual"]),
            "refined_converged": bool(info_ref["converged"]),
            "refinements": int(info_ref["refinements"]),
        }

    # --- NumPy/SciPy baseline (reference semantics, float64).
    _stage("running numpy baseline")
    base_time, base_iters, base_res = numpy_mrr_baseline(
        A_csr, b.astype(np.float64), TOL, MAXITER
    )

    extra = {
        "backend": jax.default_backend(),
        "dtype": str(np.dtype(dtype)),
        "converged": converged,
        "iterations": iters,
        "iterations_all_rhs": [int(v) for v in iters_all],
        "final_residual_recurred": final_residual,
        "final_residual_true": true_residual,
        "single_dispatch_wall_s": round(single_wall, 6),
        "nrhs_amortized_over": NRHS,
        "baseline_numpy_time_s": round(base_time, 6),
        "baseline_iterations": int(base_iters),
    }
    if solve_api_time is not None:
        extra["solve_api_incl_host_transfer_s"] = round(solve_api_time, 6)
    if refined is not None:
        extra.update(refined)

    # --- Optional SpMV microbenchmark, slope-based (cancels the fixed
    # per-dispatch tunnel overhead; fresh input per timed call defeats the
    # backend's result cache).
    if time.perf_counter() - _T_START < _BUDGET_S:
        _stage("spmv microbench")
        A_scaled = jax.tree.map(lambda d: d / 8.0, A)

        def spmv_loop(v, reps):
            return lax.fori_loop(0, reps, lambda i, u: A_scaled.matvec(u), v)

        loops = {
            r: jax.jit(lambda v, r=r: spmv_loop(v, r)) for r in (200, 1200)
        }
        elapsed = {}
        for r, fn in loops.items():
            v0 = jnp.asarray(rng.standard_normal(n).astype(dtype))
            jax.block_until_ready(fn(v0))  # compile
            best = float("inf")
            for _ in range(2):
                v1 = jnp.asarray(rng.standard_normal(n).astype(dtype))
                jax.block_until_ready(v1)
                t0 = time.perf_counter()
                jax.block_until_ready(fn(v1))
                best = min(best, time.perf_counter() - t0)
            elapsed[r] = best
        spmv_t = (elapsed[1200] - elapsed[200]) / 1000.0
        if spmv_t > 0:
            extra["spmv_nnz_per_s"] = round(A.nnz / spmv_t / 1e9, 3)
            extra["spmv_gflops"] = round(2 * A.nnz / spmv_t / 1e9, 3)
            extra["spmv_us"] = round(spmv_t * 1e6, 3)

    result = {
        "metric": "mrr_laplace2d_n250k_time_to_solution",
        "value": round(tpu_time, 6),
        "unit": "s",
        "vs_baseline": round(base_time / tpu_time, 3),
        "extra": extra,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
