"""Pallas kernel correctness (interpret mode on the CPU mesh)."""

import numpy as np
import pytest

import jax.numpy as jnp

import krylov_tpu
from krylov_tpu.kernels import (
    fused_cg_solve_2d,
    fused_mrr_solve_2d,
    stencil_matvec_2d,
)
from krylov_tpu.sparse.fixtures import laplace2d


@pytest.mark.parametrize("dims", [(20, 24), (17, 13), (40, 40)])
def test_stencil_matvec_kernel(dims):
    A = laplace2d(*dims)
    x = np.random.default_rng(0).standard_normal(A.shape[0])
    y_ref = np.asarray(A.matvec(jnp.asarray(x)))
    y_k = np.asarray(
        stencil_matvec_2d(
            A.coef, jnp.asarray(x), stencil=A.stencil, grid=A.grid, interpret=True
        )
    )
    np.testing.assert_allclose(y_k, y_ref, rtol=1e-12)


@pytest.mark.parametrize("method", ["cg", "mrr"])
def test_fused_solver_matches_while_loop(method):
    """The whole-solve-in-one-kernel path reproduces the lax.while_loop
    solvers: same iteration count, matching residual history and solution."""
    A = laplace2d(24)
    n = A.shape[0]
    b = np.random.default_rng(0).standard_normal(n)
    bn = np.linalg.norm(b)
    fn = fused_cg_solve_2d if method == "cg" else fused_mrr_solve_2d
    x, trace, iters, conv = fn(
        A.coef,
        jnp.asarray(b),
        1e-8,
        bn,
        stencil=A.stencil,
        grid=A.grid,
        maxiter=500,
        interpret=True,
    )
    xr, info = krylov_tpu.solve(A, b, method=method, tol=1e-8, maxiter=500)
    assert bool(conv) and info["converged"]
    assert int(iters) == info["iterations"]
    m = int(iters) + 1
    np.testing.assert_allclose(
        np.asarray(trace)[:m], info["residual"][:m], rtol=1e-9, atol=1e-14
    )
    np.testing.assert_allclose(np.asarray(x), xr, rtol=1e-8, atol=1e-12)


def test_fused_maxiter_divergence():
    A = laplace2d(16)
    b = np.random.default_rng(1).standard_normal(A.shape[0])
    x, trace, iters, conv = fused_cg_solve_2d(
        A.coef,
        jnp.asarray(b),
        1e-14,
        np.linalg.norm(b),
        stencil=A.stencil,
        grid=A.grid,
        maxiter=5,
        interpret=True,
    )
    assert not bool(conv)
    assert int(iters) == 5
    assert np.all(np.asarray(trace)[:6] > 0)  # final residual written post-loop


def test_fused_flag_errors_on_cpu():
    A = laplace2d(16)
    b = np.ones(A.shape[0])
    with pytest.raises(ValueError, match="fused=True requires"):
        krylov_tpu.solve(A, b, method="cg", fused=True)
