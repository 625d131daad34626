"""Constant-coefficient StencilMatrix form: per-term scalar weights instead
of stored coefficient grids (same operator, no HBM coefficient traffic).

Every consumer must give bit-identical (or reduction-order-identical)
results vs the stored-grid form: XLA matvec, DIA conversion, the Pallas
stencil kernel, the fused whole-solve kernels, preconditioner extraction,
and the sharded halo path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import krylov_tpu
from krylov_tpu.dist import make_mesh
from krylov_tpu.kernels import (
    fused_cg_solve_2d,
    fused_mrr_solve_2d,
    stencil_matvec_2d,
)
from krylov_tpu.precond import extract_diagonal, gershgorin_bounds, jacobi
from krylov_tpu.sparse.fixtures import laplace2d, laplace3d


@pytest.mark.parametrize("dims", [(16, 16), (17, 13)])
def test_grid_coef_materializes_grid_form(dims):
    Ac = laplace2d(*dims, constant=True)
    Ag = laplace2d(*dims)
    assert Ac.is_constant and not Ag.is_constant
    np.testing.assert_array_equal(
        np.asarray(Ac.grid_coef()), np.asarray(Ag.coef)
    )


def test_grid_coef_3d():
    Ac = laplace3d(5, 6, 7, constant=True)
    Ag = laplace3d(5, 6, 7)
    np.testing.assert_array_equal(
        np.asarray(Ac.grid_coef()), np.asarray(Ag.coef)
    )


@pytest.mark.parametrize("dims", [(16, 16), (17, 13)])
def test_matvec_matches_grid_form(dims):
    Ac = laplace2d(*dims, constant=True)
    Ag = laplace2d(*dims)
    x = np.random.default_rng(0).standard_normal(Ac.shape[0])
    np.testing.assert_array_equal(
        np.asarray(Ac.matvec(jnp.asarray(x))),
        np.asarray(Ag.matvec(jnp.asarray(x))),
    )


def test_matvec_matches_grid_form_3d():
    Ac = laplace3d(5, 6, 7, constant=True)
    Ag = laplace3d(5, 6, 7)
    x = np.random.default_rng(1).standard_normal(Ac.shape[0])
    np.testing.assert_array_equal(
        np.asarray(Ac.matvec(jnp.asarray(x))),
        np.asarray(Ag.matvec(jnp.asarray(x))),
    )


def test_to_dia_matches_grid_form():
    Ac = laplace2d(9, 11, constant=True)
    Ag = laplace2d(9, 11)
    Dc, Dg = Ac.to_dia(), Ag.to_dia()
    assert Dc.offsets == Dg.offsets
    np.testing.assert_array_equal(np.asarray(Dc.data), np.asarray(Dg.data))


@pytest.mark.parametrize("dims", [(20, 24), (17, 13)])
def test_pallas_stencil_kernel_constant(dims):
    """SMEM constant-weight kernel path vs the XLA matvec (interpret mode)."""
    A = laplace2d(*dims, constant=True)
    x = np.random.default_rng(2).standard_normal(A.shape[0])
    y_ref = np.asarray(A.matvec(jnp.asarray(x)))
    y_k = np.asarray(
        stencil_matvec_2d(
            A.coef, jnp.asarray(x), stencil=A.stencil, grid=A.grid, interpret=True
        )
    )
    np.testing.assert_allclose(y_k, y_ref, rtol=1e-12)


@pytest.mark.parametrize("method", ["cg", "mrr"])
@pytest.mark.parametrize("dims", [(24, 24), (19, 21)])
def test_fused_solver_constant_matches_grid_form(method, dims):
    """Fused whole-solve kernels with SMEM constant weights: identical
    iteration count and residual history vs the stored-grid form.  The
    (19, 21) case exercises the padded-row mask (g0 % 8 != 0), where the
    constant form has no stored boundary zeros to keep padding rows inert.
    """
    Ag = laplace2d(*dims)
    Ac = laplace2d(*dims, constant=True)
    n = Ag.shape[0]
    b = np.random.default_rng(3).standard_normal(n)
    bn = np.linalg.norm(b)
    fn = fused_cg_solve_2d if method == "cg" else fused_mrr_solve_2d
    out_g = fn(
        Ag.coef, jnp.asarray(b), 1e-8, bn,
        stencil=Ag.stencil, grid=Ag.grid, maxiter=800, interpret=True,
    )
    out_c = fn(
        Ac.coef, jnp.asarray(b), 1e-8, bn,
        stencil=Ac.stencil, grid=Ac.grid, maxiter=800, interpret=True,
    )
    xg, tg, ig, cg_ = out_g
    xc, tc, ic, cc = out_c
    assert bool(cg_) and bool(cc)
    assert int(ig) == int(ic)
    m = int(ig) + 1
    np.testing.assert_allclose(
        np.asarray(tc)[:m], np.asarray(tg)[:m], rtol=1e-12
    )
    np.testing.assert_allclose(np.asarray(xc), np.asarray(xg), rtol=1e-10)


def test_preconditioners_constant_form():
    Ac = laplace2d(12, constant=True)
    Ag = laplace2d(12)
    np.testing.assert_array_equal(extract_diagonal(Ac), extract_diagonal(Ag))
    np.testing.assert_array_equal(
        np.asarray(jacobi(Ac).data), np.asarray(jacobi(Ag).data)
    )
    assert gershgorin_bounds(Ac) == gershgorin_bounds(Ag)


@pytest.mark.parametrize("method", ["cg", "mrr", "kskipmrr"])
def test_sharded_halo_constant(method):
    """Replicated constant weights + zeroed wrap-around halos on the edge
    devices must reproduce the single-device solve on the 8-device mesh."""
    mesh = make_mesh(jax.devices()[:8])
    A = laplace2d(16, constant=True)
    b = np.random.default_rng(4).standard_normal(A.shape[0])
    k = 2 if method == "kskipmrr" else 0
    x1, i1 = krylov_tpu.solve(A, b, method=method, k=k, tol=1e-9, maxiter=2000)
    x8, i8 = krylov_tpu.solve(
        A, b, method=method, k=k, tol=1e-9, maxiter=2000, mesh=mesh
    )
    assert i1["converged"] and i8["converged"]
    np.testing.assert_allclose(x8, x1, rtol=1e-6, atol=1e-9)


def test_solve_constant_matches_grid(rng):
    """Front-door solve: same convergence path for both forms (XLA may fold
    the scalar-weight multiplies differently, so ULP-level slack)."""
    Ac = laplace2d(20, constant=True)
    Ag = laplace2d(20)
    b = rng.standard_normal(Ac.shape[0])
    xc, ic = krylov_tpu.solve(Ac, b, method="cg", tol=1e-9)
    xg, ig = krylov_tpu.solve(Ag, b, method="cg", tol=1e-9)
    assert ic["converged"] and ig["converged"]
    assert ic["iterations"] == ig["iterations"]
    m = min(len(ic["residual"]), len(ig["residual"]))
    np.testing.assert_allclose(
        ic["residual"][:m], ig["residual"][:m], rtol=1e-10
    )
    np.testing.assert_allclose(xc, xg, rtol=1e-9, atol=1e-12)
