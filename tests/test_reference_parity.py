"""Golden parity against the actual reference implementations.

Runs the reference's v3 CPU solvers (mounted read-only at /root/reference)
on the same float64 SPD systems and requires our convergence histories to
match within numerical tolerance — the fidelity bar from BASELINE.md.
Skipped automatically when the reference mount is absent (e.g. CI).

The reference pins ancient NumPy via ``np.int`` (reference:
v3/cpu/common.py:34, removed in NumPy >= 1.24); we restore the alias before
importing it.
"""

import os
import sys

import numpy as np
import pytest

import krylov_tpu

REF_ROOT = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF_ROOT, "v3")),
    reason="reference repo not mounted",
)


@pytest.fixture(scope="module")
def ref_v3cpu():
    if not hasattr(np, "int"):
        np.int = int  # compat shim for the reference's NumPy pin
    sys.path.insert(0, os.path.dirname(REF_ROOT))
    import importlib

    mods = {}
    for name in ["cg", "mrr", "kskipcg", "kskipmrr", "adaptivekskipmrr"]:
        mods[name] = importlib.import_module(f"reference.v3.cpu.{name}")
    yield mods
    sys.path.remove(os.path.dirname(REF_ROOT))


def _system(n_grid=12, seed=7):
    from krylov_tpu.sparse.fixtures import laplace2d

    A = laplace2d(n_grid)
    rng = np.random.default_rng(seed)
    x_true = rng.standard_normal(A.shape[0])
    b = A.todense() @ x_true
    return A, A.todense(), b


def _compare(info_ours, ref_nosl, ref_residual, rtol):
    ours = np.asarray(info_ours["residual"])
    ref = np.asarray(ref_residual)
    assert len(ours) == len(ref), (
        f"history length {len(ours)} vs reference {len(ref)}"
    )
    np.testing.assert_allclose(ours, ref, rtol=rtol, atol=1e-14)
    np.testing.assert_array_equal(np.asarray(info_ours["nosl"]), ref_nosl)


@pytest.mark.parametrize("method", ["cg", "mrr"])
def test_parity_simple(ref_v3cpu, method, capsys):
    A, A_dense, b = _system()
    x_ref, info_ref = getattr(ref_v3cpu[method], method)(
        A_dense, b.copy(), tol=1e-8, maxiter=2000
    )
    capsys.readouterr()
    x, info = krylov_tpu.solve(A, b, method=method, tol=1e-8, maxiter=2000)
    _compare(info, info_ref["nosl"], info_ref["residual"], rtol=1e-6)
    np.testing.assert_allclose(x, x_ref, rtol=1e-6, atol=1e-10)


def test_parity_adaptive_rollback(ref_v3cpu, capsys):
    """Rollback-path parity: identical khistory/nosl and matching residual
    histories on a skew-perturbed operator where the reference provably
    rolls back twice and lands at k=1."""
    from krylov_tpu.sparse.fixtures import poisson1d

    n, k, eps = 60, 3, 0.3
    A_dense = np.asarray(poisson1d(n).todense())
    rng = np.random.default_rng(5)
    P = rng.standard_normal((n, n)) * eps / n
    A_dense = A_dense + (P - P.T)
    b = rng.standard_normal(n)
    x_ref, info_ref = ref_v3cpu["adaptivekskipmrr"].adaptivekskipmrr(
        A_dense, b.copy(), tol=1e-8, maxiter=2 * n, k=k
    )
    capsys.readouterr()
    x, info = krylov_tpu.solve(
        A_dense, b, method="adaptivekskipmrr", k=k, tol=1e-8, maxiter=2 * n
    )
    assert len(info["residual"]) == len(info_ref["residual"])
    np.testing.assert_allclose(
        info["residual"], np.asarray(info_ref["residual"]), rtol=1e-4
    )
    np.testing.assert_array_equal(info["khistory"], info_ref["khistory"])
    np.testing.assert_array_equal(info["nosl"], info_ref["nosl"])
    assert (np.diff(np.asarray(info_ref["khistory"])) < 0).sum() >= 1


@pytest.mark.parametrize("method", ["kskipcg", "kskipmrr"])
@pytest.mark.parametrize("k", [1, 2, 4])
def test_parity_kskip(ref_v3cpu, method, k, capsys):
    A, A_dense, b = _system()
    x_ref, info_ref = getattr(ref_v3cpu[method], method)(
        A_dense, b.copy(), tol=1e-8, maxiter=2000, k=k
    )
    capsys.readouterr()
    x, info = krylov_tpu.solve(A, b, method=method, k=k, tol=1e-8, maxiter=2000)
    # k-skip recurrences amplify reduction-order differences (Gram matmul vs
    # sequential dots); histories must agree but with a looser rtol.
    _compare(info, info_ref["nosl"], info_ref["residual"], rtol=1e-4)
    np.testing.assert_allclose(x, x_ref, rtol=1e-5, atol=1e-9)
