"""Measure every BASELINE.md config row on the available hardware.

The reference publishes no numbers (SURVEY.md §6); BASELINE.md defines five
configs this framework must establish itself.  This harness runs each one
and prints a JSON line per row; RESULTS.md records a captured run.

Rows and what runs where:

  1  CG, 1-D Poisson N=10k, float64           -> CPU (parity vs scipy)
  2  MrR, 2-D Laplacian N=250k, single chip   -> TPU (time, nnz/s, GFLOP/s)
  3  k-skip CG k=4 vs CG: collective count    -> 8-virtual-device CPU mesh
     (the count is a STATIC property of the compiled HLO, identical on a
     real slice) + single-chip time-to-solution comparison on TPU
  4  general sparse >=1M rows (power-law),    -> TPU: .mtx -> native reader
     + k-skip MrR k=8 structured at same N       -> HybMatrix -> solve nnz/s
  4b row-4 companion: ill-conditioned power-law -> TPU: kappa~2000 (shift
     1e-3); CG / Jacobi-PCG / mixed-precision k-skip through the HYB path
  5  adaptive k-skip MrR, 10.08M rows (3-D)   -> TPU single chip + halo
     wire-bytes analysis (vs reference's full-vector Allgather)

Usage:
  PYTHONPATH=.:/root/.axon_site python benchmarks/baseline_configs.py --rows 2 3 4 5
  JAX_PLATFORMS=cpu python benchmarks/baseline_configs.py --rows 1 3
"""

import argparse
import json
import os
import re
import sys
import time

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # re-exec so the virtual-device flag lands before jax initializes
    if "--xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""
    ):
        env = dict(os.environ)
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        )
        os.execve(sys.executable, [sys.executable] + sys.argv, env)
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import krylov_tpu
from krylov_tpu.sparse.fixtures import laplace2d, poisson1d


def emit(row, **payload):
    print(json.dumps({"baseline_row": row, **payload}), flush=True)


# --only tag filter for rows 4/4b (round 5): re-capture a single solver row
# (e.g. a clean uncontended cg, or camrr on 4b) without paying for the whole
# sweep.  Empty = run everything.
_ONLY: set = set()


def _selected(tag: str) -> bool:
    return not _ONLY or any(pat in tag for pat in _ONLY)


def _entropy_rng():
    """OS-entropy-seeded rng for timed inputs: the remote TPU backend
    result-caches identical (program, input-values) executions ACROSS
    PROCESSES, so a fixed seed can replay a previous run's cached result in
    ~4 ms instead of executing (captured: round-4 row-4 cg,
    time_to_solution_s 0.0039 on a 14-iteration 1M-row solve).  Returns
    (rng, seed) so captures record the seed."""
    seed = int.from_bytes(os.urandom(8), "little")
    return np.random.default_rng(seed), seed


def _true_converged(info_converged, true_res, tol):
    """A captured row may only claim converged=true if the INDEPENDENT
    host-f64 true residual meets tol (VERDICT r4 #5: two round-4 rows said
    converged with true residual above tol)."""
    import math

    return bool(info_converged) and math.isfinite(true_res) and true_res < tol


def _fresh(rng, n, dtype):
    v = jnp.asarray(rng.standard_normal(n).astype(dtype))
    return jax.block_until_ready(v)


def _time_solve(A, b_rng, dtype, repeats=2, **kw):
    """Best-of wall time for solve_device on fresh right-hand sides.

    Timed through a HOST FETCH of the result's iteration counter: on the
    remote-tunnel backend ``block_until_ready`` is not a completion barrier
    (see bench.py module docstring), and the backend result-caches
    identical executions — hence fresh rhs per trial.  The ~25 ms fetch
    round-trip is negligible against these multi-second solves."""
    from krylov_tpu.sparse.formats import to_device

    # Commit the operator ONCE: containers are host-lazy, and re-passing
    # the host-lazy object makes every solve re-upload the matrix through
    # the tunnel INSIDE the timed window (measured round 5: 7.4 s vs
    # 1.33 s for the identical 1M-row chunked cg — ~200 MB re-upload per
    # call).  After this, solve's own to_device is a no-op.
    A = to_device(A)
    n = A.shape[0]
    fn = jax.jit(
        lambda bi: krylov_tpu.solve_device(A, bi, **kw)
    )
    r0 = fn(_fresh(b_rng, n, dtype))  # compile
    int(np.asarray(r0.iterations))
    best, res, b_best = float("inf"), None, None
    for _ in range(repeats):
        b = _fresh(b_rng, n, dtype)
        t0 = time.perf_counter()
        r = fn(b)
        int(np.asarray(r.iterations))  # completion barrier
        dt = time.perf_counter() - t0
        if dt < best:
            best, res, b_best = dt, r, b
    return best, res, b_best


def _solve_chunked_timed(A, b_rng, dtype, chunk_iters=64, warmup=True,
                        trials=2, **kw):
    """Chunk-dispatched solve through the public API, fresh rhs; returns
    (execution_seconds, info, b, x).  Long single executions on the 1M-row
    HYB gather operator fault the remote TPU (memory: ~60s+ executions), so
    the row-4 family runs chunked — bounded dispatches, honest
    restarted-Krylov accounting (info['chunks']).  Each chunk ends in a
    device_get (a true completion barrier), so the summed per-chunk
    execution time is trustworthy; wall time around the whole call minus
    compile is recorded by callers wanting a cross-check.

    ``warmup=True`` first runs the same solve on a DIFFERENT entropy rhs:
    on the remote backend the first execution of a freshly-compiled
    program pays a device-side program load measured in tens of seconds
    at the 1M-row irregular shape (round-5 capture: 92 s first execution
    vs ~1 s steady-state for 14 CG iterations whose dependent-chain
    ground truth is 72.8 ms/iter).  The warmup rhs is distinct so the
    timed run cannot be served from the backend's (program, input-values)
    result cache."""
    from krylov_tpu.sparse.formats import to_device

    A = to_device(A)  # commit once (see _time_solve: re-upload in timed window)
    n = A.shape[0]
    if warmup:
        b_w = np.asarray(b_rng.standard_normal(n), dtype=dtype)
        krylov_tpu.solve(A, b_w, chunk_iters=chunk_iters, **kw)
    # Best-of-2 fresh-rhs solves: the tunnel chip is shared, and a single
    # timed run can be inflated several-fold by a concurrent tenant
    # (observed round 5: 7.36 s captured vs 1.33 s reproduced repeatedly
    # in isolation).  Two trials bound the exposure; entropy inputs keep
    # the backend's result cache out of play.
    best = None
    for _ in range(trials):
        b = np.asarray(b_rng.standard_normal(n), dtype=dtype)
        x, info = krylov_tpu.solve(A, b, chunk_iters=chunk_iters, **kw)
        if best is None or info["time"] < best[0]:
            best = (info["time"], info, b, x)
    return best


def _time_solve_batched(A, b_rng, dtype, nrhs, **kw):
    """One-dispatch multi-RHS solve (vmapped kernel), timed through a host
    fetch on fresh entropy inputs (same discipline as _time_solve)."""
    import krylov_tpu
    from krylov_tpu.sparse.formats import to_device

    A = to_device(A)  # commit once (see _time_solve)
    n = A.shape[0]
    B_w = jnp.asarray(b_rng.standard_normal((nrhs, n)).astype(dtype))
    r0 = krylov_tpu.solve_batched(A, B_w, **kw)  # compile + first-exec load
    np.asarray(r0.iterations)
    best = None
    for _ in range(2):  # best-of-2: shared-chip contention defense
        B_t = jnp.asarray(b_rng.standard_normal((nrhs, n)).astype(dtype))
        jax.block_until_ready(B_t)
        t0 = time.perf_counter()
        res = krylov_tpu.solve_batched(A, B_t, **kw)
        np.asarray(res.iterations)  # completion barrier
        dt = time.perf_counter() - t0
        if best is None or dt < best[0]:
            best = (dt, res)
    return best


def _host_blocked_cg(A_sp, B, tol, maxiter):
    """Blocked (multi-RHS) reference-semantics CG on host scipy CSR in
    float64: one ``A @ X`` per iteration over (n, nrhs), per-column
    scalars, columns freeze at their own convergence.  The strongest fair
    host baseline for the multi-RHS capture (the reference itself solves
    one system at a time, v3/cpu/cg.py:19)."""
    t0 = time.perf_counter()
    n, nrhs = B.shape
    X = np.zeros((n, nrhs))
    b_norm = np.linalg.norm(B, axis=0)
    R = B - A_sp @ X
    P = R.copy()
    gamma = np.einsum("ij,ij->j", R, R)
    active = np.ones(nrhs, bool)
    iters = np.zeros(nrhs, int)
    for i in range(maxiter):
        rel = np.sqrt(gamma) / b_norm
        active &= rel >= tol
        if not active.any():
            break
        V = A_sp @ P[:, active]
        sigma = np.einsum("ij,ij->j", P[:, active], V)
        alpha = gamma[active] / sigma
        X[:, active] += alpha * P[:, active]
        R[:, active] -= alpha * V
        g_new = np.einsum("ij,ij->j", R[:, active], R[:, active])
        beta = g_new / gamma[active]
        P[:, active] = R[:, active] + beta * P[:, active]
        gamma[active] = g_new
        iters[active] += 1
    return time.perf_counter() - t0, [int(v) for v in iters]


def _true_residual64(A_host, b, x):
    """Host-float64 ||b - A x|| / ||b|| — the independent fidelity field
    every captured sub-row carries (VERDICT r3 item 9)."""
    from krylov_tpu.sparse.convert import host_matvec64

    b64 = np.asarray(b, np.float64)
    x64 = np.asarray(x, np.float64)
    if hasattr(A_host, "matvec"):
        Ax = np.asarray(host_matvec64(A_host, x64))
    else:
        Ax = np.asarray(A_host @ x64)
    return float(np.linalg.norm(b64 - Ax) / np.linalg.norm(b64))


def _host_reference_cg(A_sp, b, tol, maxiter):
    """Reference-semantics CG on host scipy CSR in float64 — the reference's
    own design point (reference: v3/cpu/cg.py:7-48, A.dot on scipy CSR).
    Returns (seconds, iterations, relative residual)."""
    t0 = time.perf_counter()
    n = b.shape[0]
    x = np.zeros(n)
    b_norm = np.linalg.norm(b)
    r = b - A_sp @ x
    p = r.copy()
    gamma = r.dot(r)
    i = 0
    while i < maxiter:
        if np.linalg.norm(r) / b_norm < tol:
            break
        v = A_sp @ p
        sigma = p.dot(v)
        alpha = gamma / sigma
        x += alpha * p
        r -= alpha * v
        old = gamma
        gamma = r.dot(r)
        beta = gamma / old
        p = r + beta * p
        i += 1
    return (
        time.perf_counter() - t0,
        i,
        float(np.linalg.norm(r) / b_norm),
    )


def row1():
    """CG, 1-D Poisson tridiagonal, N=10k, float64: iterations-to-tol and
    residual-history agreement with scipy.sparse.linalg.cg."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    jax.config.update("jax_enable_x64", True)
    n, tol = 10_000, 1e-5
    A = poisson1d(n, dtype=np.float64)
    b = np.ones(n)
    x, info = krylov_tpu.solve(A, b, method="cg", tol=tol)

    A_sp = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(n, n)).tocsr()
    hist = []
    spla.cg(
        A_sp, b, rtol=tol, atol=0.0, maxiter=n,
        callback=lambda xk: hist.append(
            np.linalg.norm(b - A_sp @ xk) / np.linalg.norm(b)
        ),
    )
    x_err = float(
        np.linalg.norm(A_sp @ x - b) / np.linalg.norm(b)
    )
    emit(
        1,
        method="cg", n=n, dtype="float64", tol=tol,
        iterations=int(info["iterations"]),
        scipy_iterations=len(hist),
        final_residual=float(info["residual"][-1]),
        true_residual=x_err,
        converged=bool(info["converged"]),
        iterations_within=abs(int(info["iterations"]) - len(hist)),
    )


def row2():
    """MrR, 2-D 5-point Laplacian N=250k, single chip (bench.py headline,
    re-measured here for the record)."""
    dtype = np.float32 if jax.default_backend() == "tpu" else np.float64
    A = laplace2d(500, dtype=dtype)
    rng = np.random.default_rng(0)
    t, res, b_used = _time_solve(A, rng, dtype, method="mrr", tol=1e-5, maxiter=3000)
    iters = int(res.iterations)
    emit(
        2,
        method="mrr", n=A.shape[0], dtype=str(np.dtype(dtype)),
        backend=jax.default_backend(),
        time_to_solution_s=round(t, 6),
        iterations=iters,
        converged=bool(res.converged),
        nnz_per_s_solve=round(A.nnz * iters / t / 1e9, 3),
        note="see bench.py for the amortized multi-RHS headline + SpMV roofline",
    )


_COLLECTIVES = ("all-reduce", "all-gather", "collective-permute",
                "reduce-scatter", "all-to-all")


def _collective_counts(hlo_text):
    counts = {}
    for c in _COLLECTIVES:
        # instruction occurrences like "%all-reduce.3 = ..." / "all-gather("
        k = len(re.findall(rf"= \S* {c}", hlo_text)) + len(
            re.findall(rf"{c}\.?\d* = ", hlo_text)
        )
        counts[c] = k
    return {k: v for k, v in counts.items() if v}


def row3():
    """k-skip CG (k=4) vs CG: collective count in the compiled sharded HLO
    (static per-outer-iteration structure) + time-to-solution."""
    from krylov_tpu.dist import make_mesh

    n_dev = jax.device_count()
    dtype = np.float32 if jax.default_backend() == "tpu" else np.float64
    A = laplace2d(256, dtype=dtype)  # N=65k
    n = A.shape[0]
    b = jnp.ones(n, dtype=dtype)

    result = {"n": n, "devices": n_dev, "backend": jax.default_backend()}
    if n_dev >= 2:
        from krylov_tpu.context import Context
        from krylov_tpu.dist.solve import _build
        from krylov_tpu.dist.spmv import shard_operator

        mesh = make_mesh()
        op, op_specs = shard_operator(A, n_dev, axis=mesh.axis_names[0])
        ctx = Context(axis=mesh.axis_names[0])
        counts = {}
        for method, k in (("cg", 0), ("kskipcg", 4)):
            fn = _build(
                mesh, mesh.axis_names[0], method, 1000, k, ctx, op_specs,
                None, False,
            )
            hlo = fn.lower(
                op, b, jnp.zeros_like(b), jnp.asarray(1e-5, b.dtype)
            ).compile().as_text()
            counts[method] = _collective_counts(hlo)
        result["collectives_cg"] = counts["cg"]
        result["collectives_kskipcg_k4"] = counts["kskipcg"]

    rng = np.random.default_rng(1)
    t_cg, r_cg, _ = _time_solve(A, rng, dtype, method="cg", tol=1e-5, maxiter=3000)
    t_ks, r_ks, _ = _time_solve(
        A, rng, dtype, method="kskipcg", k=4, tol=1e-5, maxiter=3000
    )
    result.update(
        cg_time_s=round(t_cg, 6), cg_iterations=int(r_cg.iterations),
        kskipcg_k4_time_s=round(t_ks, 6),
        kskipcg_k4_iterations=int(r_ks.iterations),
        both_converged=bool(r_cg.converged and r_ks.converged),
    )
    emit(3, **result)


_MTX_CACHE = "/tmp/krylov_tpu_powerlaw_1m.mtx"


def row4():
    """>=1M-row general-sparse SPD (power-law degrees, SuiteSparse-graph
    shape), through the FULL IO path: .mtx file -> native C++ reader ->
    HybMatrix (ELL+tail split) -> solve.  Reference analog: arbitrary
    ``scipy.sparse.csr_matrix`` systems (v3/cpu/cg.py:27) loaded from
    gitignored .mtx drivers (.gitignore:1-19).

    Also records the structured-grid k-skip measurement at the same N
    (laplace2d 1024^2): in float32 the raw k=8 recurrence is unstable at
    kappa ~ 1e5 (eps_f32*kappa ~ 1e-2 — an ALGORITHM property; the reference
    runs f64 everywhere, v3/cpu/common.py:23, and built the adaptive variant
    precisely to detect/repair this divergence), so the raw run and the
    adaptive recovery run are both recorded.
    """
    from krylov_tpu.sparse import io as kio
    from krylov_tpu.sparse.fixtures import powerlaw_spd

    dtype = np.float32 if jax.default_backend() == "tpu" else np.float64
    n = 1 << 20
    if not os.path.exists(_MTX_CACHE):
        A_sp = powerlaw_spd(n, seed=42)
        coo = A_sp.tocoo()
        with open(_MTX_CACHE, "w") as f:
            f.write("%%MatrixMarket matrix coordinate real general\n")
            f.write(f"{n} {n} {coo.nnz}\n")
            np.savetxt(
                f,
                np.column_stack([coo.row + 1, coo.col + 1, coo.data]),
                fmt="%d %d %.9g",
            )
    t0 = time.perf_counter()
    H = kio.load_mtx(_MTX_CACHE, dtype=dtype)
    t_load = time.perf_counter() - t0
    # True per-row nnz (ADVICE r2: hub rows span many tail chunks; the old
    # "ell width + one tail width" estimate understated max-width ELL storage
    # by orders of magnitude).  Plain ELL pads every row to max(row_nnz).
    row_nnz = np.sum(np.asarray(H.ell_data) != 0, axis=1).astype(np.int64)
    np.add.at(
        row_nnz,
        np.asarray(H.tail_rows),
        np.sum(np.asarray(H.tail_data) != 0, axis=1).astype(np.int64),
    )
    max_row_nnz = int(row_nnz.max())
    payload = {
        "general_sparse": dict(
            container=type(H).__name__,
            ell_width=int(H.width),
            tail_chunks=int(H.tail_data.shape[0]),
            stored_slots=int(H.stored_entries),
            plain_ell_slots_would_be=int(H.shape[0]) * max_row_nnz,
            load_convert_s=round(t_load, 2),
        )
    }
    nnz_h = H.nnz
    rng, seed = _entropy_rng()
    payload["general_sparse"]["entropy_seed"] = seed
    if jax.default_backend() == "tpu":
        # f64 scalar recurrences for the mixed-precision runs below
        jax.config.update("jax_enable_x64", True)
    for tag, method, kw in (
        ("cg", "cg", {}),
        ("kskipmrr_k8", "kskipmrr", dict(k=8)),
        # VERDICT r3 item 3: the adaptive rollback + normalized basis on the
        # general-sparse system where raw k=8 recorded NaN (captured
        # converging, 109 iterations, true residual 8.5e-7).
        ("adaptive_k8_bn", "adaptivekskipmrr",
         dict(k=8, scalar_dtype=jnp.float64, basis_norm=True)),
        # Chebyshev-basis CA-CG at the same skip size: the principled
        # float32 fix for s=8 where the monomial basis cannot survive
        # (basis_norm alone was captured still-NaN at k=8 — overflow is
        # fixed but the kappa^k information loss is not).
        ("cacg_s8", "cacg", dict(k=8, scalar_dtype=jnp.float64)),
        ("camrr_s8", "camrr", dict(k=8, scalar_dtype=jnp.float64)),
    ):
        if not _selected(tag):
            continue
        print(f"[row4] {tag} ...", file=sys.stderr, flush=True)
        t, info, b_used, x_out = _solve_chunked_timed(
            H, rng, dtype, method=method, tol=1e-6, maxiter=400,
            chunk_iters=64, **kw,
        )
        print(f"[row4] {tag} done {t:.1f}s", file=sys.stderr, flush=True)
        iters = int(info["iterations"])
        true_res = _true_residual64(H, b_used, x_out)
        payload["general_sparse"][tag] = dict(
            time_to_solution_s=round(t, 6),
            iterations=iters,
            converged=_true_converged(info["converged"], true_res, 1e-6),
            converged_recurred=bool(info["converged"]),
            final_residual=float(info["residual"][-1]),
            final_residual_true=true_res,
            nnz_per_s_solve=round(nnz_h * iters / t / 1e9, 3),
            chunks=int(info.get("chunks", 1)),
        )

    # Host-CSR reference baseline (VERDICT r3 item 4): the reference's own
    # design point is f64 CG with A.dot on scipy CSR (v3/cpu/cg.py:27).
    from krylov_tpu.sparse.fixtures import powerlaw_spd as _pl

    if _selected("host_reference") or "cg" in payload["general_sparse"]:
        A_sp64 = _pl(n, seed=42)
        b_h = np.random.default_rng(2).standard_normal(n)
        t_h, it_h, res_h = _host_reference_cg(A_sp64, b_h, 1e-6, 400)
        host_rate = round(A_sp64.nnz * it_h / t_h / 1e9, 3)
        payload["host_reference_cg_f64"] = dict(
            time_s=round(t_h, 3), iterations=it_h, final_residual=res_h,
            nnz_per_s=host_rate,
        )
        cg_row = payload["general_sparse"].get("cg")
        if cg_row and host_rate:
            payload["host_reference_cg_f64"]["tpu_cg_vs_host"] = round(
                cg_row["nnz_per_s_solve"] / host_rate, 2
            )
            payload["host_reference_cg_f64"]["tpu_cg_speedup_time"] = round(
                t_h / cg_row["time_to_solution_s"], 2
            )

    # Multi-RHS blocked CG (VERDICT r4 #4): the HYB gather's index stream
    # is identical for every right-hand side, so a vmapped 8-RHS solve
    # reuses one gather per 8 fused multiply-adds — the amortization lever
    # for beating the host on general sparse.  Captured per-RHS, against
    # BOTH host baselines: 8 sequential reference CGs and an equally
    # blocked host CG (scipy CSR @ (n, 8) — the strongest fair host form).
    if _selected("cg_multirhs"):
        try:
            nrhs = 8
            t_b, res_b = _time_solve_batched(
                H, rng, dtype, nrhs, method="cg", tol=1e-6, maxiter=400,
            )
            iters_b = [int(v) for v in np.asarray(res_b.iterations)]
            payload["general_sparse"]["cg_multirhs"] = dict(
                nrhs=nrhs,
                time_all_s=round(t_b, 6),
                time_per_rhs_s=round(t_b / nrhs, 6),
                iterations=iters_b,
                converged=all(bool(v) for v in np.asarray(res_b.converged)),
                nnz_per_s_solve=round(
                    nnz_h * sum(iters_b) / t_b / 1e9, 3
                ),
            )
            from krylov_tpu.sparse.fixtures import powerlaw_spd as _pl2

            A_h64 = _pl2(n, seed=42)
            Bh = np.random.default_rng(5).standard_normal((n, nrhs))
            t_hb, it_hb = _host_blocked_cg(A_h64, Bh, 1e-6, 400)
            payload["general_sparse"]["host_blocked_cg_f64"] = dict(
                nrhs=nrhs, time_all_s=round(t_hb, 3),
                time_per_rhs_s=round(t_hb / nrhs, 6), iterations=it_hb,
            )
            payload["general_sparse"]["multirhs_vs_host_blocked"] = round(
                (t_hb / nrhs) / (t_b / nrhs), 2
            )
        except Exception as e:  # never lose the row's other captures
            payload["general_sparse"]["cg_multirhs_error"] = (
                f"{type(e).__name__}: {e}"[:500]
            )

    A = laplace2d(1024, dtype=dtype)  # N = 1,048,576 structured
    for tag, method, extra_kw in (
        ("kskipmrr_k8", "kskipmrr", {}),
        # restarts=1: device-side defect correction so converged means
        # TRUE-residual-converged (round-4 captured recurred 1.0e-4 with
        # true 1.4e-4 at kappa~1e5 — VERDICT r4 #5).
        ("adaptive_k8", "adaptivekskipmrr", dict(restarts=1)),
    ):
        if not _selected("laplace2d_" + tag):
            continue
        t, res, b_used = _time_solve(
            A, rng, dtype, method=method, k=8, tol=1e-4, maxiter=4000,
            repeats=1, **extra_kw,
        )
        iters = int(res.iterations)
        true_res = _true_residual64(A, np.asarray(b_used), np.asarray(res.x))
        payload[f"laplace2d_{tag}"] = dict(
            time_to_solution_s=round(t, 6),
            iterations=iters,
            converged=_true_converged(res.converged, true_res, 1e-4),
            converged_recurred=bool(res.converged),
            final_residual=float(np.asarray(res.residual_trace)[res.index]),
            final_residual_true=true_res,
            nnz_per_s_solve=round(A.nnz * iters / t / 1e9, 3),
        )
    emit(
        4,
        k=8, n=n, nnz_general=int(nnz_h), nnz_laplace=int(A.nnz),
        dtype=str(np.dtype(dtype)), backend=jax.default_backend(),
        devices=jax.device_count(),
        **payload,
    )


def row4b():
    """Row-4 companion (VERDICT r2 #5): a genuinely ILL-CONDITIONED irregular
    matrix at >=1M rows.  ``powerlaw_spd(shift=1e-3,
    diag_scale_decades=1.5)`` keeps the heavy-tail row structure and fills
    the spectrum across ~5 decades via symmetric log-uniform diagonal
    scaling (the graded-diagonal structure of real SuiteSparse thermal*/
    G3_circuit-class SPD problems; the unscaled shifted normalized Laplacian
    has a single outlier eigenvalue that CG removes in ~16 iterations at any
    size).  Measured on the n=4096 instance of the same generator:
    kappa = 1.6e5 (eigsh both ends); at n=2^20 the provable bounds are
    lmin >= shift (since the scale factors are >= 1) and
    lmax <= (2+shift)*10^(2*1.5).  CG, Jacobi-PCG (which undoes the grading
    — the classic preconditioning win), and mixed-precision k-skip MrR all
    run through the same HYB container.  Reference analog: the
    SuiteSparse-class systems its drivers consumed (.gitignore:1-19)."""
    from krylov_tpu.sparse.convert import to_hyb
    from krylov_tpu.sparse.fixtures import powerlaw_spd

    dtype = np.float32 if jax.default_backend() == "tpu" else np.float64
    n = 1 << 20
    shift, decades = 1e-3, 1.5
    A_sp = powerlaw_spd(n, shift=shift, diag_scale_decades=decades, seed=42)
    H = to_hyb(A_sp, dtype=dtype)
    import scipy.sparse.linalg as spla

    lmax = float(
        spla.eigsh(A_sp, k=1, which="LA", return_eigenvectors=False,
                   tol=1e-3)[0]
    )
    rng, seed = _entropy_rng()
    tol = 1e-4 if dtype == np.float32 else 1e-6
    payload = {"entropy_seed": seed}
    from krylov_tpu import precond

    for tag, method, kw in (
        ("cg", "cg", {}),
        ("pcg_jacobi", "pcg", dict(M=precond.jacobi(H))),
        ("kskipmrr_k4_f64scalars", "kskipmrr",
         dict(k=4, scalar_dtype=jnp.float64)),
        # VERDICT r3 item 2 done-criterion: k=4 f32 vectors CONVERGING via
        # the normalized basis where the raw run recorded NaN.
        ("kskipmrr_k4_f64scalars_bn", "kskipmrr",
         dict(k=4, scalar_dtype=jnp.float64, basis_norm=True)),
        ("adaptive_k8_bn", "adaptivekskipmrr",
         dict(k=8, scalar_dtype=jnp.float64, basis_norm=True)),
        ("cacg_s8", "cacg",
         dict(k=8, scalar_dtype=jnp.float64, maxiter=1500, trials=1)),
        # camrr plateaus near tol on this graded spectrum (measured:
        # long 1.4e-4 plateau before breaking to 9.9e-5) — needs the
        # larger budget; converged at 385 iterations on the round-5
        # capture.
        ("camrr_s8", "camrr",
         dict(k=8, scalar_dtype=jnp.float64, maxiter=4800, trials=1)),
    ):
        if not _selected(tag):
            continue
        if "scalar_dtype" in kw:
            jax.config.update("jax_enable_x64", True)
        print(f"[row4b] {tag} ...", file=sys.stderr, flush=True)
        t, info, b_used, x_out = _solve_chunked_timed(
            H, rng, dtype, method=method, tol=tol,
            maxiter=kw.pop("maxiter", 8000),
            trials=kw.pop("trials", 2),
            chunk_iters=64, **kw,
        )
        print(f"[row4b] {tag} done {t:.1f}s", file=sys.stderr, flush=True)
        iters = int(info["iterations"])
        # independent host-f64 check against the SCIPY matrix (not the
        # HYB container) — VERDICT r3 weak-6: the pcg_jacobi claim
        # leaned on the recurred residual alone
        true_res = _true_residual64(A_sp, b_used, x_out)
        payload[tag] = dict(
            time_to_solution_s=round(t, 6),
            iterations=iters,
            converged=_true_converged(info["converged"], true_res, tol),
            converged_recurred=bool(info["converged"]),
            final_residual=float(info["residual"][-1]),
            final_residual_true=true_res,
            nnz_per_s_solve=round(H.nnz * iters / t / 1e9, 3),
            chunks=int(info.get("chunks", 1)),
        )

    # Host-CSR reference baseline at the same tolerance (the reference is
    # f64 end-to-end: v3/cpu/common.py:23, A.dot on scipy CSR).
    b_h = np.random.default_rng(11).standard_normal(n)
    t_h, it_h, res_h = _host_reference_cg(A_sp, b_h, tol, 8000)
    host_rate = round(A_sp.nnz * it_h / t_h / 1e9, 3)
    cg_row = payload.get("cg")
    payload["host_reference_cg_f64"] = dict(
        time_s=round(t_h, 3), iterations=it_h, final_residual=res_h,
        nnz_per_s=host_rate,
        tpu_cg_vs_host=(
            round(cg_row["nnz_per_s_solve"] / host_rate, 2)
            if host_rate and cg_row
            else None
        ),
    )
    emit(
        "4b",
        n=n, nnz=int(H.nnz), shift=shift, diag_scale_decades=decades,
        lmax_eigsh=round(lmax, 3), lmin_provable_lower_bound=shift,
        kappa_measured_n4096_same_generator=1.6e5,
        tol=tol,
        dtype=str(np.dtype(dtype)), backend=jax.default_backend(),
        container=type(H).__name__,
        **payload,
    )


def row5():
    """Adaptive k-skip MrR, >=10M rows (3-D 7-point Laplacian, 216^3 =
    10,077,696 — the realistic >=10M-row problem family; the 2-D Laplacian
    at this N has kappa ~ 1e6, beyond float32's attainable accuracy).
    On one chip: absolute nnz/s.  Wire-bytes analysis: the sharded stencil
    SpMV exchanges ONE boundary plane (216^2 values) per neighbor per SpMV
    vs the reference's full-N Allgather (v3/cpu/mpi/common.py:39-43);
    HLO-verified byte counts in benchmarks/overlap_analysis.py."""
    from krylov_tpu.sparse.fixtures import laplace3d

    dtype = np.float32 if jax.default_backend() == "tpu" else np.float64
    g = 216  # N = 10,077,696
    A = laplace3d(g, dtype=dtype, constant=True)
    rng, seed = _entropy_rng()
    t, res, b_used = _time_solve(
        A, rng, dtype, method="adaptivekskipmrr", k=8, tol=1e-4,
        maxiter=4000, repeats=1, restarts=1,
    )
    iters = int(res.iterations)
    true_res = _true_residual64(A, np.asarray(b_used), np.asarray(res.x))
    halo_bytes = g * g * np.dtype(dtype).itemsize * 2  # one plane up + down
    allgather_bytes = A.shape[0] * np.dtype(dtype).itemsize
    emit(
        5,
        method="adaptivekskipmrr", k=8, n=A.shape[0], nnz=int(A.nnz),
        dtype=str(np.dtype(dtype)), backend=jax.default_backend(),
        entropy_seed=seed,
        time_s=round(t, 6),
        iterations=iters,
        converged=_true_converged(res.converged, true_res, 1e-4),
        converged_recurred=bool(res.converged),
        final_residual=float(np.asarray(res.residual_trace)[res.index]),
        final_residual_true=true_res,
        nnz_per_s_solve=round(A.nnz * iters / t / 1e9, 3),
        halo_bytes_per_spmv_per_boundary=int(halo_bytes),
        reference_allgather_bytes_per_spmv=int(allgather_bytes),
        wire_reduction_x=round(allgather_bytes / halo_bytes, 1),
        note="weak-scaling efficiency requires a real multi-chip slice; "
        "see benchmarks/weak_scaling.py + benchmarks/overlap_analysis.py "
        "for the per-device harness and HLO wire-byte verification",
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", nargs="+", default=["1", "2", "3", "4", "5"])
    ap.add_argument("--only", nargs="+", default=(),
                    help="rows 4/4b: run only solver tags containing one "
                         "of these substrings (plus the host baseline "
                         "when 'cg'/'host_reference' matches)")
    args = ap.parse_args()
    _ONLY.update(args.only)
    if jax.default_backend() == "cpu":
        jax.config.update("jax_enable_x64", True)
    table = {"1": row1, "2": row2, "3": row3, "4": row4, "4b": row4b, "5": row5}
    for r in args.rows:
        t0 = time.perf_counter()
        try:
            table[r]()
        except Exception as e:  # keep measuring the remaining rows
            emit(r, error=f"{type(e).__name__}: {e}")
        print(
            f"[row {r}] {time.perf_counter()-t0:.1f}s",
            file=sys.stderr, flush=True,
        )


if __name__ == "__main__":
    main()
