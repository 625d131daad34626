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


@pytest.mark.parametrize("constant", [False, True])
@pytest.mark.parametrize("dims", [(6, 7, 9), (8, 8, 8)])
def test_stencil_matvec_kernel_3d(dims, constant):
    """3-D stencils run on the 2-D kernel over the collapsed (g0, g1*g2)
    view; the constant form additionally masks inner-axis boundary lanes."""
    from krylov_tpu.kernels import stencil_matvec_2d
    from krylov_tpu.sparse.fixtures import laplace3d

    A = laplace3d(*dims, constant=constant)
    x = np.random.default_rng(1).standard_normal(A.shape[0])
    y_ref = np.asarray(A.matvec(jnp.asarray(x)))
    coef2, stencil2, grid2, sub = A.collapse_to_2d()
    y_k = np.asarray(
        stencil_matvec_2d(
            coef2, jnp.asarray(x), stencil=stencil2, grid=grid2, sub=sub,
            interpret=True,
        )
    )
    np.testing.assert_allclose(y_k, y_ref, rtol=1e-12)


@pytest.mark.parametrize("constant", [False, True])
@pytest.mark.parametrize("method", ["cg", "mrr"])
def test_fused_solver_3d_matches_while_loop(method, constant):
    """Fused whole-solve kernels on a 3-D 7-point Laplacian (collapsed)."""
    from krylov_tpu.api import _run_fused
    from krylov_tpu.sparse.fixtures import laplace3d
    from krylov_tpu.kernels import fused_cg_solve_2d, fused_mrr_solve_2d

    A = laplace3d(10, constant=constant)
    n = A.shape[0]
    b = np.random.default_rng(2).standard_normal(n)
    bn = np.linalg.norm(b)
    coef2, stencil2, grid2, sub = A.collapse_to_2d()
    fn = fused_cg_solve_2d if method == "cg" else fused_mrr_solve_2d
    x, trace, iters, conv = fn(
        coef2, jnp.asarray(b), 1e-8, bn,
        stencil=stencil2, grid=grid2, maxiter=500, sub=sub, interpret=True,
    )
    xr, info = krylov_tpu.solve(A, b, method=method, tol=1e-8, maxiter=500)
    assert bool(conv) and info["converged"]
    assert int(iters) == info["iterations"]
    m = int(iters) + 1
    np.testing.assert_allclose(
        np.asarray(trace)[:m], info["residual"][:m], rtol=1e-9, atol=1e-14
    )
    np.testing.assert_allclose(np.asarray(x), xr, rtol=1e-8, atol=1e-12)


@pytest.mark.parametrize("constant", [False, True])
def test_fused_kskipmrr_3d(constant):
    """Fused adaptive k-skip MrR on a 3-D grid (collapsed form)."""
    from krylov_tpu.kernels import fused_kskipmrr_solve_2d
    from krylov_tpu.sparse.fixtures import laplace3d

    A = laplace3d(8, constant=constant)
    b = np.random.default_rng(4).standard_normal(A.shape[0])
    bn = np.linalg.norm(b)
    k = 2
    coef2, stencil2, grid2, sub = A.collapse_to_2d()
    x, trace, nosl, ktrace, iters, conv, index, final_k = (
        fused_kskipmrr_solve_2d(
            coef2, jnp.asarray(b), 1e-8, bn, k,
            stencil=stencil2, grid=grid2, maxiter=500, k_max=k,
            adaptive=True, sub=sub, interpret=True,
        )
    )
    xr, info = krylov_tpu.solve(
        A, b, method="adaptivekskipmrr", k=k, tol=1e-8, maxiter=500
    )
    assert bool(conv) and info["converged"]
    assert int(iters) == info["iterations"]
    m = int(index) + 1
    np.testing.assert_allclose(np.asarray(trace)[:m], info["residual"], rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(ktrace)[:m], info["khistory"])
    np.testing.assert_allclose(np.asarray(x), xr, rtol=1e-6, atol=1e-9)


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


@pytest.mark.parametrize("k", [1, 2, 4])
def test_fused_kskipcg_matches_while_loop(k):
    """The streamed-bundle k-skip CG kernel reproduces the while_loop solver
    bit-for-bit in iteration structure (same reductions in both)."""
    from krylov_tpu.kernels import fused_kskipcg_solve_2d

    A = laplace2d(24)
    b = np.random.default_rng(0).standard_normal(A.shape[0])
    bn = np.linalg.norm(b)
    x, trace, nosl, iters, conv, index = fused_kskipcg_solve_2d(
        A.coef, jnp.asarray(b), 1e-8, bn, k,
        stencil=A.stencil, grid=A.grid, maxiter=500, k_max=k, interpret=True,
    )
    xr, info = krylov_tpu.solve(A, b, method="kskipcg", k=k, tol=1e-8, maxiter=500)
    assert bool(conv) and info["converged"]
    assert int(iters) == info["iterations"]
    m = int(index) + 1
    np.testing.assert_allclose(np.asarray(trace)[:m], info["residual"], rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(nosl)[:m], info["nosl"])
    np.testing.assert_allclose(np.asarray(x), xr, rtol=1e-6, atol=1e-10)


@pytest.mark.parametrize("k,adaptive", [(1, False), (2, False), (4, False), (2, True), (4, True)])
def test_fused_kskipmrr_matches_while_loop(k, adaptive):
    """Streamed-bundle k-skip MrR / adaptive kernel vs the while_loop
    solvers.  x tolerance allows reduction-order drift: the while_loop path
    bundles inner products via an MXU Gram matmul, the kernel via VPU sums
    (measured ~5e-11 absolute at k=4, f64)."""
    from krylov_tpu.kernels import fused_kskipmrr_solve_2d

    method = "adaptivekskipmrr" if adaptive else "kskipmrr"
    A = laplace2d(24)
    b = np.random.default_rng(0).standard_normal(A.shape[0])
    bn = np.linalg.norm(b)
    x, trace, nosl, ktrace, iters, conv, index, final_k = (
        fused_kskipmrr_solve_2d(
            A.coef, jnp.asarray(b), 1e-8, bn, k,
            stencil=A.stencil, grid=A.grid, maxiter=500, k_max=k,
            adaptive=adaptive, interpret=True,
        )
    )
    xr, info = krylov_tpu.solve(A, b, method=method, k=k, tol=1e-8, maxiter=500)
    assert bool(conv) and info["converged"]
    assert int(iters) == info["iterations"]
    m = int(index) + 1
    np.testing.assert_allclose(np.asarray(trace)[:m], info["residual"], rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(nosl)[:m], info["nosl"])
    np.testing.assert_allclose(np.asarray(x), xr, rtol=1e-6, atol=1e-9)
    if adaptive:
        np.testing.assert_array_equal(np.asarray(ktrace)[:m], info["khistory"])
        assert int(final_k) == info["final_k"]


def test_fused_adaptive_rollback_parity():
    """Force the rollback path (non-normal advection-like stencil: MrR
    overshoots, the residual-increase guard fires) and check the kernel
    reproduces the while_loop rollback semantics including khistory and the
    k decrement."""
    from krylov_tpu.kernels import fused_kskipmrr_solve_2d
    from krylov_tpu.sparse.formats import StencilMatrix

    rng = np.random.default_rng(3)
    g = (16, 16)
    iy = np.arange(g[0])[:, None]
    ix = np.arange(g[1])[None, :]
    eps = 0.5
    coef = np.stack([
        -(1 + eps) * np.broadcast_to(iy > 0, g).astype(float),
        -(1 + eps) * np.broadcast_to(ix > 0, g).astype(float),
        np.full(g, 4.5),
        -(1 - eps) * np.broadcast_to(ix < g[1] - 1, g).astype(float),
        -(1 - eps) * np.broadcast_to(iy < g[0] - 1, g).astype(float),
    ])
    A = StencilMatrix(
        jnp.asarray(coef), ((-1, 0), (0, -1), (0, 0), (0, 1), (1, 0)), g
    )
    b = rng.standard_normal(A.shape[0])
    bn = np.linalg.norm(b)
    k = 6
    x, trace, nosl, ktrace, iters, conv, index, final_k = (
        fused_kskipmrr_solve_2d(
            A.coef, jnp.asarray(b), 1e-8, bn, k,
            stencil=A.stencil, grid=A.grid, maxiter=2000, k_max=k,
            adaptive=True, interpret=True,
        )
    )
    xr, info = krylov_tpu.solve(
        A, b, method="adaptivekskipmrr", k=k, tol=1e-8, maxiter=2000
    )
    assert info["final_k"] < k, "fixture must actually trigger rollbacks"
    assert int(final_k) == info["final_k"]
    m = int(index) + 1
    np.testing.assert_array_equal(np.asarray(ktrace)[:m], info["khistory"])
    np.testing.assert_array_equal(np.asarray(nosl)[:m], info["nosl"])
    np.testing.assert_allclose(np.asarray(trace)[:m], info["residual"], rtol=1e-5)
    assert int(iters) == info["iterations"]
    np.testing.assert_allclose(np.asarray(x), xr, rtol=1e-6, atol=1e-9)


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
