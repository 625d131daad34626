"""Matrix loading: Matrix Market (.mtx), scipy .npz, and .npy dense.

The reference's drivers loaded gitignored ``*.mtx / *.npy / *.npz`` matrices
(reference: .gitignore:1-19, v1/threads/.gitignore:1-7); these loaders make
that workflow first-class.  ``.mtx`` parsing uses the native C++ fast path
(``native/libkrylov_native.so``) when built — pure-python parsing dominates
end-to-end time for >=10M-row SuiteSparse matrices — with a scipy fallback.
"""

from __future__ import annotations

import numpy as np

from krylov_tpu import native
from krylov_tpu.sparse.formats import Operator, as_operator
from krylov_tpu.sparse import convert


def load_mtx(path: str, dtype=None, prefer: str = "auto") -> Operator:
    """Load a Matrix Market file into the best-fitting container.

    prefer: 'auto' (pattern analysis), 'dia', 'ell', or 'dense'.
    """
    rows, cols, vals, shape = native.read_mtx(path)
    n = shape[0]
    indptr, indices, data = native.coo_to_csr(n, rows, cols, vals)
    return _from_csr_arrays(n, shape, indptr, indices, data, dtype, prefer)


def load_npz(path: str, dtype=None, prefer: str = "auto") -> Operator:
    """Load a scipy-saved sparse matrix (.npz)."""
    import scipy.sparse as sp

    csr = sp.load_npz(path).tocsr()
    if prefer == "auto":
        return convert.from_scipy(csr, dtype=dtype)
    if prefer == "dia":
        return convert.to_dia(csr, dtype=dtype)
    if prefer == "ell":
        return convert.to_ell(csr, dtype=dtype)
    if prefer == "hyb":
        return convert.to_hyb(csr, dtype=dtype)
    if prefer == "dense":
        return convert.to_dense(csr, dtype=dtype)
    raise ValueError(f"unknown prefer={prefer!r}")


def load_npy(path: str, dtype=None) -> Operator:
    """Load a dense .npy matrix."""
    return as_operator(np.load(path), dtype=dtype)


def _from_csr_arrays(n, shape, indptr, indices, data, dtype, prefer):
    import jax.numpy as jnp

    from krylov_tpu.sparse.formats import DiaMatrix, EllMatrix

    if prefer == "dense":
        dense = np.zeros(shape)
        for r in range(n):
            for k in range(indptr[r], indptr[r + 1]):
                dense[r, indices[k]] += data[k]
        return as_operator(dense, dtype=dtype)

    row_nnz = np.diff(indptr)
    if prefer == "dia" or (
        prefer == "auto" and _diagonal_count(n, indptr, indices) <= 32
    ):
        offsets, dia = native.csr_to_dia(n, indptr, indices, data)
        return DiaMatrix(
            jnp.asarray(dia, dtype=dtype),
            tuple(int(o) for o in offsets),
            shape,
        )
    width = int(row_nnz.max(initial=1))
    if prefer in ("auto", "hyb"):
        w, hyb_slots = convert.hyb_split_width(row_nnz)
        if prefer == "hyb" or hyb_slots * 2 <= n * width:
            import scipy.sparse as sp

            csr = sp.csr_matrix((data, indices, indptr), shape=shape)
            return convert.to_hyb(csr, dtype=dtype, width=w)
    ell_data, ell_idx = native.csr_to_ell(n, indptr, indices, data, width)
    return EllMatrix(
        jnp.asarray(ell_data, dtype=dtype), jnp.asarray(ell_idx), shape
    )


def _diagonal_count(n, indptr, indices, cap: int = 64) -> int:
    offs = indices.astype(np.int64) - np.repeat(
        np.arange(n, dtype=np.int64), np.diff(indptr)
    )
    return len(np.unique(offs))
