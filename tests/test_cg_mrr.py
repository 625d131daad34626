"""CG / MrR solver correctness on analytic SPD fixtures."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

import krylov_tpu
from krylov_tpu.sparse import convert
from krylov_tpu.sparse.fixtures import laplace2d, poisson1d, random_spd_ell


def _check_solution(A_dense, b, x, tol):
    res = np.linalg.norm(b - A_dense @ x) / np.linalg.norm(b)
    assert res < tol * 1.5, f"relative residual {res} above tol {tol}"


@pytest.mark.parametrize("method", ["cg", "mrr"])
def test_poisson1d(method):
    n = 100
    A = poisson1d(n)
    b = np.ones(n)
    x, info = krylov_tpu.solve(A, b, method=method, tol=1e-8)
    assert info["converged"]
    _check_solution(A.todense(), b, x, 1e-8)
    # exact solution of the 1-D Poisson system with ones rhs is quadratic
    x_exact = np.linalg.solve(A.todense(), b)
    np.testing.assert_allclose(x, x_exact, rtol=1e-5)


@pytest.mark.parametrize("method", ["cg", "mrr"])
def test_laplace2d(method):
    A = laplace2d(16)
    n = A.shape[0]
    rng = np.random.default_rng(3)
    x_true = rng.standard_normal(n)
    b = A.todense() @ x_true
    x, info = krylov_tpu.solve(A, b, method=method, tol=1e-10)
    assert info["converged"]
    np.testing.assert_allclose(x, x_true, rtol=1e-6, atol=1e-8)


def test_cg_matches_scipy_iteration_count():
    """Iterations-to-tol within a small margin of scipy's CG (BASELINE row 1)."""
    A = laplace2d(12)
    n = A.shape[0]
    b = np.ones(n)
    x, info = krylov_tpu.solve(A, b, method="cg", tol=1e-8)

    csr = sp.csr_matrix(A.todense())
    iters = []
    spla.cg(csr, b, rtol=1e-8, atol=0.0, callback=lambda xk: iters.append(1))
    assert abs(info["iterations"] - len(iters)) <= 3


def test_cg_residual_history_properties():
    A = laplace2d(10)
    b = np.ones(A.shape[0])
    x, info = krylov_tpu.solve(A, b, method="cg", tol=1e-9)
    res = info["residual"]
    assert res[0] == pytest.approx(1.0)  # ||b||/||b|| with x0=0
    assert res[-1] < 1e-9
    # CG error is monotone in A-norm; relative residual should still decay
    # overall — check a loose monotonicity (no 10x blowups).
    assert np.all(res[1:] < 10 * np.maximum.accumulate(res[:-1]))


@pytest.mark.parametrize("method", ["cg", "mrr"])
def test_ell_general_sparse(method):
    A = random_spd_ell(80, row_nnz=8, seed=5)
    n = A.shape[0]
    rng = np.random.default_rng(9)
    x_true = rng.standard_normal(n)
    b = A.todense() @ x_true
    x, info = krylov_tpu.solve(A, b, method=method, tol=1e-10, maxiter=500)
    assert info["converged"]
    np.testing.assert_allclose(x, x_true, rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize("method", ["cg", "mrr"])
def test_dense_operator(method):
    rng = np.random.default_rng(11)
    n = 60
    Q = rng.standard_normal((n, n))
    A_dense = Q @ Q.T + n * np.eye(n)
    b = rng.standard_normal(n)
    x, info = krylov_tpu.solve(A_dense, b, method=method, tol=1e-10)
    assert info["converged"]
    np.testing.assert_allclose(A_dense @ x, b, rtol=1e-7)


def test_maxiter_divergence_reported():
    A = laplace2d(16)
    b = np.ones(A.shape[0])
    x, info = krylov_tpu.solve(A, b, method="cg", tol=1e-14, maxiter=3)
    assert not info["converged"]
    assert info["iterations"] == 3
    assert len(info["residual"]) == 4  # residual[0..3], final written post-loop


def test_x0_warm_start():
    A = poisson1d(50)
    b = np.ones(50)
    x_exact = np.linalg.solve(A.todense(), b)
    x, info = krylov_tpu.solve(A, b, method="cg", x0=x_exact, tol=1e-8)
    assert info["converged"]
    assert info["iterations"] == 0


def test_info_dict_contract():
    """Info dict matches the reference's contract (reference: v3/cpu/cg.py:43-47)."""
    A = poisson1d(30)
    b = np.ones(30)
    x, info = krylov_tpu.solve(A, b, method="cg", tol=1e-8)
    assert {"time", "nosl", "residual"} <= set(info)
    assert len(info["residual"]) == len(info["nosl"]) == info["iterations"] + 1
    assert np.all(np.diff(info["nosl"]) == 1)  # nosl[i] = i for CG


def test_refine_mixed_precision_defect_correction():
    """refine= forms the defect in float64, solves the correction in working
    precision, and accumulates x in float64 — the true residual must reach
    tol even when the f32 recurred residual drifted."""
    from krylov_tpu.sparse.convert import host_matvec64

    A = laplace2d(64, dtype=np.float32)
    n = A.shape[0]
    rng = np.random.default_rng(7)
    b = rng.standard_normal(n).astype(np.float32)
    b64 = b.astype(np.float64)

    def true_rel64(x):
        return float(
            np.linalg.norm(b64 - host_matvec64(A, np.asarray(x, np.float64)))
            / np.linalg.norm(b64)
        )

    tol = 1e-5
    x_plain, info_plain = krylov_tpu.solve(A, b, method="cg", tol=tol)
    x_ref, info_ref = krylov_tpu.solve(A, b, method="cg", tol=tol, refine=4)
    assert info_ref["refinements"] >= 0
    assert "true_residual" in info_ref
    assert x_ref.dtype == np.float64
    assert true_rel64(x_ref) <= true_rel64(x_plain) + 1e-12
    # the whole point: the float64 true residual reaches tol
    assert info_ref["true_residual"] < tol
    assert abs(info_ref["true_residual"] - true_rel64(x_ref)) < 1e-10
    assert info_ref["converged"]
    # history bookkeeping stays consistent across the refinement solves
    assert len(info_ref["residual"]) == len(info_ref["nosl"])
    assert info_ref["iterations"] >= info_plain["iterations"]


def test_refine_noop_when_converged_truly():
    """In float64 the recurred residual is honest; refine must not restart."""
    A = poisson1d(64)
    b = np.ones(64)
    x, info = krylov_tpu.solve(A, b, method="mrr", tol=1e-6, refine=3)
    assert info["refinements"] == 0
    assert info["true_residual"] < 1e-6
