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

    import krylov_tpu
    from krylov_tpu.sparse.fixtures import laplace2d

    NX = 500  # N = 250,000
    TOL = 1e-5
    MAXITER = 3000
    dtype = np.float32 if jax.default_backend() == "tpu" else np.float64

    _stage("building fixture")
    A = laplace2d(NX, dtype=dtype)
    n = A.shape[0]
    rng = np.random.default_rng(0)
    b = rng.standard_normal(n).astype(dtype)

    # --- Headline: MrR time-to-solution at device completion.  The fused
    # whole-solve-in-one-kernel Pallas path (krylov_tpu/kernels/fused.py)
    # engages automatically on TPU: ~1.1 ms vs 396 ms for the per-op
    # lax.while_loop path on this config.  Timed like the reference times
    # only its iteration loop (reference: v3/cpu/common.py:9-18).
    _stage("warming solve_device (compile)")
    b_dev = jnp.asarray(b)
    jax.block_until_ready(
        krylov_tpu.solve_device(A, b_dev, method="mrr", tol=TOL, maxiter=MAXITER)
    )
    _stage("timing solve_device")
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = krylov_tpu.solve_device(
            A, b_dev, method="mrr", tol=TOL, maxiter=MAXITER
        )
        jax.block_until_ready(res)
        times.append(time.perf_counter() - t0)
    tpu_time = min(times)

    # Result stats via small transfers only (scalars + the 12 KB trace);
    # materializing the 1 MB solution to host goes through the dev-tunnel
    # relay which can stall for minutes on the first large transfer.
    iters = int(res.iterations)
    converged = bool(res.converged)
    final_residual = float(res.residual_trace[iters])

    solve_api_time = None
    if time.perf_counter() - _T_START < 120.0:
        _stage("timing solve() api (incl. host transfers)")
        krylov_tpu.solve(A, b, method="mrr", tol=TOL, maxiter=MAXITER)
        t0 = time.perf_counter()
        krylov_tpu.solve(A, b, method="mrr", tol=TOL, maxiter=MAXITER)
        solve_api_time = time.perf_counter() - t0

    # --- NumPy/SciPy baseline (reference semantics, float64).
    import scipy.sparse as sp

    A64_dia = laplace2d(NX, dtype=np.float64).to_dia()
    ii = []
    jj = []
    vv = []
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
    _stage("running numpy baseline")
    base_time, base_iters, base_res = numpy_mrr_baseline(
        A_csr, b.astype(np.float64), TOL, MAXITER
    )

    extra = {
        "backend": jax.default_backend(),
        "dtype": str(np.dtype(dtype)),
        "converged": converged,
        "iterations": iters,
        "final_residual": final_residual,
        "baseline_numpy_time_s": round(base_time, 6),
        "baseline_iterations": int(base_iters),
    }
    if solve_api_time is not None:
        extra["solve_api_incl_host_transfer_s"] = round(solve_api_time, 6)

    # --- Optional SpMV microbenchmark (separate jit graph; skipped when the
    # remote compile service has already eaten the budget).
    if time.perf_counter() - _T_START < _BUDGET_S:
        _stage("spmv microbench")
        from jax import lax

        A_scaled = jax.tree.map(lambda d: d / 8.0, A)
        REPS = 200

        @jax.jit
        def spmv_loop(v):
            return lax.fori_loop(0, REPS, lambda i, u: A_scaled.matvec(u), v)

        spmv_loop(b_dev).block_until_ready()
        t0 = time.perf_counter()
        spmv_loop(b_dev).block_until_ready()
        spmv_t = (time.perf_counter() - t0) / REPS
        extra["spmv_nnz_per_s"] = round(A.nnz / spmv_t / 1e9, 3)
        extra["spmv_gflops"] = round(2 * A.nnz / spmv_t / 1e9, 3)

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
