"""Device-side defect-correction restarts (``restarts=``) and AOT timing.

The restart path is the single-dispatch counterpart of ``solve(refine=)``:
the true residual ``||b - A x||/||b||`` is recomputed ON DEVICE after the
base solve and, when still above tol, a correction system is solved and
folded into x — all inside one jitted call (api._run_single).  The reference
has no analog (it only ever reports the recurred residual,
reference: v3/cpu/common.py:16).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import krylov_tpu
from krylov_tpu.sparse.fixtures import laplace2d, poisson1d


def _true_rel(A, x, b):
    from krylov_tpu.sparse.convert import host_matvec64

    b64 = np.asarray(b, dtype=np.float64)
    return float(
        np.linalg.norm(b64 - host_matvec64(A, np.asarray(x, np.float64)))
        / np.linalg.norm(b64)
    )


@pytest.mark.parametrize("method", ["cg", "mrr"])
def test_restarts_drive_true_residual_below_tol(method, rng):
    # float32 vectors: the recurred residual drifts from the true one over
    # many iterations; restarts=2 must close the gap.
    A = laplace2d(48, dtype=np.float32)
    b = rng.standard_normal(A.shape[0]).astype(np.float32)
    tol = 1e-5

    res = krylov_tpu.solve_device(
        A, b, method=method, tol=tol, maxiter=4000, restarts=2
    )
    assert bool(res.converged)
    assert res.true_residual is not None
    assert float(res.true_residual) < tol
    assert _true_rel(A, res.x, b) < tol * 1.5  # host f64 cross-check


def test_restarts_skip_when_already_converged(rng):
    # f64 run: base solve already satisfies the true residual, so the
    # correction solve must be skipped (iterations unchanged vs restarts=0).
    A = poisson1d(600, dtype=np.float64)
    b = rng.standard_normal(600)
    r0 = krylov_tpu.solve_device(A, b, method="cg", tol=1e-9, maxiter=3000)
    r1 = krylov_tpu.solve_device(
        A, b, method="cg", tol=1e-9, maxiter=3000, restarts=1
    )
    assert int(r1.iterations) == int(r0.iterations)
    assert bool(r1.converged)
    assert float(r1.true_residual) < 1e-9


def test_restarts_rejected_with_mesh(rng):
    import jax
    from krylov_tpu.dist import make_mesh

    A = poisson1d(64, dtype=np.float64)
    b = rng.standard_normal(64)
    mesh = make_mesh(jax.devices()[:2])
    with pytest.raises(ValueError, match="single-device"):
        krylov_tpu.solve_device(A, b, mesh=mesh, restarts=1)


def test_solve_reports_compile_time_and_exec_time(rng):
    A = poisson1d(500, dtype=np.float64)
    b = rng.standard_normal(500)
    x, info = krylov_tpu.solve(A, b, method="cg", tol=1e-8)
    # first call through a fresh shape: compile time recorded separately,
    # info['time'] is execution-only
    assert "compile_time" not in info or info["compile_time"] > 0
    assert info["time"] > 0
    x2, info2 = krylov_tpu.solve(A, b, method="cg", tol=1e-8)
    assert "compile_time" not in info2  # cache hit
    np.testing.assert_allclose(x, x2, rtol=1e-12)


def test_solve_restarts_info(rng):
    A = laplace2d(32, dtype=np.float32)
    b = rng.standard_normal(A.shape[0]).astype(np.float32)
    x, info = krylov_tpu.solve(A, b, method="mrr", tol=1e-5, restarts=1)
    assert "true_residual" in info
    assert info["converged"] == (info["true_residual"] < 1e-5)


# --- chunk_iters: warm-restarted bounded dispatches ---------------------


@pytest.mark.parametrize("method", ["cg", "mrr", "kskipmrr"])
def test_chunked_solve_converges(method, rng):
    A = laplace2d(32)
    b = rng.standard_normal(A.shape[0]).astype(A.dtype)
    kw = dict(k=2) if method == "kskipmrr" else {}
    x, info = krylov_tpu.solve(
        A, b, method=method, tol=1e-5, maxiter=3000, chunk_iters=30, **kw
    )
    assert info["converged"]
    assert info["chunks"] > 1
    assert _true_rel(A, x, b) < 1e-4
    # concatenated histories stay consistent with the iteration count
    assert len(info["residual"]) == len(info["nosl"])
    assert np.all(np.diff(info["nosl"]) >= 0)


def test_chunked_solve_respects_maxiter(rng):
    A = laplace2d(32)
    b = rng.standard_normal(A.shape[0]).astype(A.dtype)
    x, info = krylov_tpu.solve(
        A, b, method="cg", tol=1e-30, maxiter=25, chunk_iters=10
    )
    assert not info["converged"]
    # stops at the first chunk boundary at/after maxiter
    assert 25 <= info["iterations"] <= 30
    assert info["chunks"] == 3


def test_chunked_matches_unchunked_when_chunk_large(rng):
    A = laplace2d(24)
    b = rng.standard_normal(A.shape[0]).astype(A.dtype)
    x1, i1 = krylov_tpu.solve(A, b, method="cg", tol=1e-5, maxiter=500)
    x2, i2 = krylov_tpu.solve(
        A, b, method="cg", tol=1e-5, maxiter=500, chunk_iters=500
    )
    # chunk >= maxiter takes the plain single-dispatch path
    assert "chunks" not in i2
    assert i1["iterations"] == i2["iterations"]
    np.testing.assert_allclose(x1, x2, rtol=1e-6)


def test_chunked_rejected_with_restarts_and_mesh(rng):
    A = laplace2d(16)
    b = rng.standard_normal(A.shape[0]).astype(A.dtype)
    with pytest.raises(ValueError, match="mutually exclusive"):
        krylov_tpu.solve(A, b, chunk_iters=10, restarts=1)
    from krylov_tpu.dist import make_mesh

    with pytest.raises(ValueError, match="single-device"):
        krylov_tpu.solve(A, b, mesh=make_mesh(), chunk_iters=10)


@pytest.mark.parametrize(
    "method,kw",
    [
        ("cg", {}),
        ("mrr", {}),
        ("kskipcg", {"k": 3}),
        ("kskipmrr", {"k": 3}),
        ("adaptivekskipmrr", {"k": 3}),
    ],
)
def test_chunked_carry_methods_are_exact(method, kw, rng):
    """The whole while_loop family carries its full recurrence state across
    chunk boundaries (kernels' carry_in/emit_carry): identical iteration
    count, residual history, and khistory to the unbroken solve — NOT
    restarted-Krylov semantics."""
    A = laplace2d(48)
    b = rng.standard_normal(A.shape[0]).astype(A.dtype)
    x1, i1 = krylov_tpu.solve(A, b, method=method, tol=1e-5, maxiter=3000, **kw)
    x2, i2 = krylov_tpu.solve(
        A, b, method=method, tol=1e-5, maxiter=3000, chunk_iters=40, **kw
    )
    assert i2["chunks"] >= 2
    assert i1["iterations"] == i2["iterations"]
    assert len(i1["residual"]) == len(i2["residual"])
    np.testing.assert_allclose(
        i1["residual"], i2["residual"], rtol=1e-5, atol=0
    )
    if "khistory" in i1:
        np.testing.assert_array_equal(i1["khistory"], i2["khistory"])
