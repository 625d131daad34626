"""Batched multi-RHS solves via vmap (no reference analog)."""

import numpy as np
import pytest

import krylov_tpu
from krylov_tpu.api import solve_batched
from krylov_tpu.sparse.fixtures import laplace2d, poisson1d


@pytest.mark.parametrize("method,k", [("cg", 0), ("mrr", 0), ("kskipmrr", 2)])
def test_batched_matches_sequential(method, k):
    A = laplace2d(12)
    n = A.shape[0]
    rng = np.random.default_rng(0)
    B = rng.standard_normal((4, n))
    res = solve_batched(A, B, method=method, k=k, tol=1e-9, maxiter=1000)
    assert res.x.shape == (4, n)
    for i in range(4):
        x_i, info_i = krylov_tpu.solve(
            A, B[i], method=method, k=k, tol=1e-9, maxiter=1000
        )
        assert bool(res.converged[i]) and info_i["converged"]
        assert int(res.iterations[i]) == info_i["iterations"]
        np.testing.assert_allclose(
            np.asarray(res.x[i]), x_i, rtol=1e-8, atol=1e-12
        )


def test_batched_preconditioned():
    """solve_batched composes with M for the preconditioned methods."""
    from krylov_tpu import precond

    A = laplace2d(12)
    n = A.shape[0]
    rng = np.random.default_rng(5)
    B = rng.standard_normal((3, n))
    M = precond.jacobi(A)
    res = solve_batched(A, B, method="pcg", M=M, tol=1e-9, maxiter=1000)
    assert np.all(np.asarray(res.converged))
    for i in range(3):
        x_i, info_i = krylov_tpu.solve(
            A, B[i], method="pcg", M=M, tol=1e-9, maxiter=1000
        )
        assert int(res.iterations[i]) == info_i["iterations"]
        np.testing.assert_allclose(
            np.asarray(res.x[i]), x_i, rtol=1e-8, atol=1e-12
        )


def test_batched_mixed_convergence_points():
    """Systems converging at different iteration counts stay independent."""
    A = poisson1d(60)
    n = 60
    rng = np.random.default_rng(1)
    # one trivially-converged member (b = A @ small x) and harder ones
    B = np.stack(
        [
            1e-3 * np.asarray(A.matvec(np.ones(n) * 1e-3)),
            rng.standard_normal(n),
            rng.standard_normal(n) * 100,
        ]
    )
    res = solve_batched(A, B, method="cg", tol=1e-8, maxiter=500)
    iters = np.asarray(res.iterations)
    assert np.all(np.asarray(res.converged))
    assert len(set(iters.tolist())) > 1  # genuinely different stopping points
    for i in range(3):
        r = np.linalg.norm(B[i] - A.todense() @ np.asarray(res.x[i]))
        assert r / max(np.linalg.norm(B[i]), 1e-30) < 1e-7


def test_batched_cacg_matches_singles():
    """The Chebyshev-basis method composes with the batched (vmapped)
    dispatch — the static change-of-basis matrix and spectral bounds are
    shared across the batch."""
    import krylov_tpu
    from krylov_tpu.sparse.fixtures import laplace2d

    A = laplace2d(16, dtype=np.float64)
    rng = np.random.default_rng(3)
    B = rng.standard_normal((3, 256))
    res = solve_batched(
        A, B, method="cacg", k=4, spectral_bounds=(0.05, 8.0),
        tol=1e-8, maxiter=500,
    )
    assert np.all(np.asarray(res.converged))
    for i in range(3):
        x_i, info_i = krylov_tpu.solve(
            A, B[i], method="cacg", k=4, spectral_bounds=(0.05, 8.0),
            tol=1e-8, maxiter=500,
        )
        assert int(np.asarray(res.iterations)[i]) == info_i["iterations"]
        np.testing.assert_allclose(
            np.asarray(res.x[i]), x_i, rtol=1e-8, atol=1e-12
        )
