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
