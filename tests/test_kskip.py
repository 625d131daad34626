"""k-skip CG / k-skip MrR correctness."""

import numpy as np
import pytest

import krylov_tpu
from krylov_tpu.sparse.fixtures import laplace2d, poisson1d


@pytest.mark.parametrize("method", ["kskipcg", "kskipmrr"])
@pytest.mark.parametrize("k", [0, 1, 2, 4])
def test_kskip_converges(method, k):
    A = laplace2d(12)
    n = A.shape[0]
    rng = np.random.default_rng(4)
    x_true = rng.standard_normal(n)
    b = A.todense() @ x_true
    x, info = krylov_tpu.solve(A, b, method=method, k=k, tol=1e-10, maxiter=2000)
    assert info["converged"], f"{method} k={k} diverged: {info['residual'][-5:]}"
    np.testing.assert_allclose(x, x_true, rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("method", ["kskipcg", "kskipmrr"])
def test_kskip_nosl_stride(method):
    """Solution-update counts advance by k+1 per outer iteration
    (reference: v3/cpu/kskipcg.py:66-68).

    k=2 and random rhs: with b=ones this fixture excites few eigenmodes and
    converges exactly mid-block, hitting the k-skip 0/0 breakdown — the
    reference NaNs there too (verified); random rhs avoids the degenerate
    regime.  k-skip MrR at k>=3 diverges on this fixture in the reference as
    well; that instability is why the adaptive variant exists.
    """
    k = 2
    A = poisson1d(80)
    b = np.random.default_rng(12).standard_normal(80)
    x, info = krylov_tpu.solve(A, b, method=method, k=k, tol=1e-9, maxiter=1000)
    assert info["converged"]
    nosl = info["nosl"]
    start = 1 if method == "kskipmrr" else 0  # MrR init step
    diffs = np.diff(nosl[start + 1 :])
    assert np.all(diffs == k + 1), diffs


def test_kskip_k0_matches_cg_iterations():
    """k=0 k-skip CG is plain CG, one outer iteration per update."""
    A = laplace2d(10)
    b = np.ones(A.shape[0])
    _, info0 = krylov_tpu.solve(A, b, method="kskipcg", k=0, tol=1e-8, maxiter=1000)
    _, info_cg = krylov_tpu.solve(A, b, method="cg", tol=1e-8, maxiter=1000)
    assert info0["converged"] and info_cg["converged"]
    assert abs(info0["iterations"] - info_cg["iterations"]) <= 1
    m = min(len(info0["residual"]), len(info_cg["residual"]))
    # atol floor: the final converged entries sit at machine epsilon
    # (~1e-16) where only absolute comparison is meaningful.
    np.testing.assert_allclose(
        info0["residual"][:m], info_cg["residual"][:m], rtol=1e-6, atol=1e-12
    )


@pytest.mark.parametrize("k", [1, 3])
def test_kskip_fewer_outer_iterations(k):
    """k-skip reduces reduction points ~(k+1)x for similar update counts."""
    A = laplace2d(12)
    b = np.ones(A.shape[0])
    _, info = krylov_tpu.solve(A, b, method="kskipcg", k=k, tol=1e-8, maxiter=2000)
    assert info["converged"]
    outer = len(info["residual"]) - 1
    updates = info["iterations"]
    assert outer <= -(-updates // (k + 1)) + 1
