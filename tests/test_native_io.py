"""Native C++ preprocessing layer + matrix IO."""

import os
import subprocess

import numpy as np
import pytest
import scipy.io
import scipy.sparse as sp

from krylov_tpu import native
from krylov_tpu.sparse import io as kio
from krylov_tpu.sparse.formats import DiaMatrix, EllMatrix


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module", autouse=True)
def built_library():
    lib = os.path.join(REPO, "native", "libkrylov_native.so")
    if not os.path.exists(lib):
        subprocess.run(["make", "-C", os.path.join(REPO, "native")], check=True)
    assert native.available(), "native library should load"


def _random_sym_coo(n, density, seed):
    m = sp.random(n, n, density=density, random_state=np.random.RandomState(seed))
    m = m + m.T
    m = m.tolil()
    m.setdiag(np.abs(m).sum(axis=1).A1 + 1.0)
    return m.tocoo()


def test_mtx_roundtrip_general(tmp_path):
    coo = _random_sym_coo(40, 0.1, 3)
    path = tmp_path / "mat.mtx"
    scipy.io.mmwrite(str(path), coo, symmetry="general")
    rows, cols, vals, shape = native.read_mtx(str(path))
    rebuilt = sp.coo_matrix((vals, (rows, cols)), shape=shape)
    np.testing.assert_allclose(rebuilt.toarray(), coo.toarray(), rtol=1e-12)


def test_mtx_roundtrip_symmetric(tmp_path):
    coo = _random_sym_coo(30, 0.12, 4)
    path = tmp_path / "sym.mtx"
    scipy.io.mmwrite(str(path), coo, symmetry="symmetric")
    rows, cols, vals, shape = native.read_mtx(str(path))
    rebuilt = sp.coo_matrix((vals, (rows, cols)), shape=shape)
    np.testing.assert_allclose(rebuilt.toarray(), coo.toarray(), rtol=1e-12)


def test_coo_to_csr_matches_scipy():
    coo = _random_sym_coo(50, 0.08, 5)
    indptr, indices, data = native.coo_to_csr(
        50, coo.row.astype(np.int32), coo.col.astype(np.int32), coo.data
    )
    ref = coo.tocsr()
    ref.sort_indices()
    ours = sp.csr_matrix((data, indices, indptr), shape=(50, 50))
    np.testing.assert_allclose(ours.toarray(), ref.toarray(), rtol=1e-12)


def test_csr_to_ell_native():
    csr = _random_sym_coo(25, 0.15, 6).tocsr()
    ell_data, ell_idx = native.csr_to_ell(
        25, csr.indptr.astype(np.int64), csr.indices.astype(np.int32), csr.data
    )
    dense = np.zeros((25, 25))
    for i in range(25):
        for s in range(ell_idx.shape[1]):
            dense[i, ell_idx[i, s]] += ell_data[i, s]
    np.testing.assert_allclose(dense, csr.toarray(), rtol=1e-12)


def test_csr_to_dia_native():
    csr = sp.diags(
        [np.full(37, -1.0), np.full(40, 4.0), np.full(37, -1.0)],
        [-3, 0, 3],
    ).tocsr()
    offsets, dia = native.csr_to_dia(
        40, csr.indptr.astype(np.int64), csr.indices.astype(np.int32), csr.data
    )
    assert list(offsets) == [-3, 0, 3]
    import jax.numpy as jnp

    A = DiaMatrix(jnp.asarray(dia), tuple(int(o) for o in offsets), (40, 40))
    np.testing.assert_allclose(A.todense(), csr.toarray(), rtol=1e-12)


def test_load_mtx_solves(tmp_path):
    """End to end: write .mtx -> load -> solve -> check residual."""
    import krylov_tpu

    coo = _random_sym_coo(60, 0.08, 7)
    path = tmp_path / "spd.mtx"
    scipy.io.mmwrite(str(path), coo, symmetry="general")
    A = kio.load_mtx(str(path))
    assert isinstance(A, (DiaMatrix, EllMatrix))
    rng = np.random.default_rng(0)
    x_true = rng.standard_normal(60)
    b = coo.tocsr() @ x_true
    x, info = krylov_tpu.solve(A, b, method="cg", tol=1e-10, maxiter=600)
    assert info["converged"]
    np.testing.assert_allclose(x, x_true, rtol=1e-6, atol=1e-8)


def test_load_npz(tmp_path):
    csr = _random_sym_coo(30, 0.1, 8).tocsr()
    path = tmp_path / "mat.npz"
    sp.save_npz(str(path), csr)
    A = kio.load_npz(str(path))
    np.testing.assert_allclose(A.todense(), csr.toarray(), rtol=1e-12)
