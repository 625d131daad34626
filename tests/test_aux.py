"""Auxiliary subsystems: checkpoint/resume, profiling, batched API exports."""

import numpy as np

import krylov_tpu
from krylov_tpu import checkpoint
from krylov_tpu.diagnostics import profiling
from krylov_tpu.sparse.fixtures import laplace2d


def test_checkpoint_roundtrip_and_resume(tmp_path):
    A = laplace2d(16)
    n = A.shape[0]
    rng = np.random.default_rng(0)
    x_true = rng.standard_normal(n)
    b = A.todense() @ x_true

    # partial solve, checkpoint, resume
    x_partial, info1 = krylov_tpu.solve(A, b, method="cg", tol=1e-12, maxiter=10)
    assert not info1["converged"]
    ckpt = tmp_path / "solve.npz"
    checkpoint.save(str(ckpt), x_partial, info1, problem="lap16")

    x_loaded, state = checkpoint.load(str(ckpt))
    np.testing.assert_array_equal(x_loaded, x_partial)
    assert state["meta"]["problem"] == "lap16"
    assert state["meta"]["iterations"] == 10

    x, info2 = checkpoint.resume(A, b, str(ckpt), method="cg", tol=1e-10)
    assert info2["converged"]
    assert info2["resumed_from"]["prior_iterations"] == 10
    np.testing.assert_allclose(x, x_true, rtol=1e-6, atol=1e-8)
    # warm start should need fewer iterations than from scratch
    _, info_cold = krylov_tpu.solve(A, b, method="cg", tol=1e-10)
    assert info2["iterations"] < info_cold["iterations"]


def test_phase_times():
    A = laplace2d(12)
    b = np.ones(A.shape[0])
    t = profiling.phase_times(A, b, method="cg", tol=1e-8, maxiter=500)
    assert t["converged"]
    assert t["solve_s"] <= t["compile_plus_first_solve_s"]
    assert t["iterations"] > 0


def test_build_info_trace_truncated_flag():
    """VERDICT r2 #7: when the fused path clamps residual RECORDING to the
    SMEM trace cap, info must say so instead of silently returning a history
    whose tail was overwritten (the full-history contract is reference
    behavior: v3/cpu/common.py:22-36).  The fused kernels are TPU-only, so
    the flag plumbing is unit-tested here and the end-to-end fused behavior
    is exercised on hardware (RESULTS.md)."""
    import jax.numpy as jnp

    from krylov_tpu.diagnostics import build_info
    from krylov_tpu.solvers import SolveResult

    def result(truncated):
        return SolveResult(
            x=jnp.zeros(4),
            residual_trace=jnp.zeros(9),
            nosl_trace=jnp.arange(9),
            iterations=jnp.int32(20),
            index=jnp.int32(8),
            converged=jnp.bool_(True),
            trace_truncated=truncated,
        )

    info = build_info(result(jnp.bool_(True)), 0.1)
    assert info["residual_truncated"] is True
    assert "residual_truncated" not in build_info(result(jnp.bool_(False)), 0.1)
    assert "residual_truncated" not in build_info(result(None), 0.1)
