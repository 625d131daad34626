"""Analytic SPD test problems (the benchmark configs from BASELINE.md).

The reference validated solvers on externally supplied ``.mtx``/``.npy``
matrices that were never committed (reference: .gitignore:1-19); these
constructors provide the standard SPD families the baselines are defined on.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from krylov_tpu.sparse.formats import DiaMatrix, EllMatrix, StencilMatrix
import jax.numpy as jnp


def poisson1d(n: int, dtype=np.float64) -> DiaMatrix:
    """1-D Poisson tridiagonal SPD matrix: diag 2, off-diags -1 (BASELINE config 1)."""
    main = np.full(n, 2.0, dtype=dtype)
    lower = np.zeros(n, dtype=dtype)
    upper = np.zeros(n, dtype=dtype)
    lower[1:] = -1.0  # A[i, i-1]
    upper[: n - 1] = -1.0  # A[i, i+1]
    data = np.stack([lower, main, upper])
    return DiaMatrix(jnp.asarray(data), (-1, 0, 1), (n, n))


def laplace2d(
    nx: int,
    ny: int | None = None,
    dtype=np.float64,
    constant: bool = False,
) -> StencilMatrix:
    """2-D 5-point Laplacian on an ny*nx grid, row-major (BASELINE configs 2-3).

    Returned as a grid-aware :class:`StencilMatrix` (the TPU-roofline
    container); interior stencil [4, -1, -1, -1, -1] with Dirichlet
    boundaries (couplings across the grid edge stored as zero).

    ``constant=True`` returns the constant-coefficient form — per-term
    scalar weights instead of stored grids (same operator; see
    :class:`StencilMatrix`) — which skips streaming 5 coefficient grids
    from HBM per matvec.
    """
    ny = ny if ny is not None else nx
    stencil = ((-1, 0), (0, -1), (0, 0), (0, 1), (1, 0))
    if constant:
        w = np.array([-1.0, -1.0, 4.0, -1.0, -1.0], dtype=dtype)
        return StencilMatrix(jnp.asarray(w), stencil, (ny, nx))
    iy = np.arange(ny)[:, None]
    ix = np.arange(nx)[None, :]
    main = np.full((ny, nx), 4.0, dtype=dtype)
    north = np.broadcast_to((iy > 0), (ny, nx)).astype(dtype) * -1.0  # (i-1, j)
    south = np.broadcast_to((iy < ny - 1), (ny, nx)).astype(dtype) * -1.0
    west = np.broadcast_to((ix > 0), (ny, nx)).astype(dtype) * -1.0  # (i, j-1)
    east = np.broadcast_to((ix < nx - 1), (ny, nx)).astype(dtype) * -1.0
    coef = np.stack([north, west, main, east, south]).astype(dtype)
    return StencilMatrix(jnp.asarray(coef), stencil, (ny, nx))


def laplace3d(
    nx: int,
    ny: int | None = None,
    nz: int | None = None,
    dtype=np.float64,
    constant: bool = False,
) -> StencilMatrix:
    """3-D 7-point Laplacian on an nz*ny*nx grid (for the >=10M-row configs)."""
    ny = ny if ny is not None else nx
    nz = nz if nz is not None else nx
    if constant:
        w = np.array([-1.0, -1.0, -1.0, 6.0, -1.0, -1.0, -1.0], dtype=dtype)
        stencil = (
            (-1, 0, 0),
            (0, -1, 0),
            (0, 0, -1),
            (0, 0, 0),
            (0, 0, 1),
            (0, 1, 0),
            (1, 0, 0),
        )
        return StencilMatrix(jnp.asarray(w), stencil, (nz, ny, nx))
    iz = np.arange(nz)[:, None, None]
    iy = np.arange(ny)[None, :, None]
    ix = np.arange(nx)[None, None, :]
    shp = (nz, ny, nx)
    main = np.full(shp, 6.0, dtype=dtype)
    zm = np.broadcast_to(iz > 0, shp).astype(dtype) * -1.0
    zp = np.broadcast_to(iz < nz - 1, shp).astype(dtype) * -1.0
    ym = np.broadcast_to(iy > 0, shp).astype(dtype) * -1.0
    yp = np.broadcast_to(iy < ny - 1, shp).astype(dtype) * -1.0
    xm = np.broadcast_to(ix > 0, shp).astype(dtype) * -1.0
    xp = np.broadcast_to(ix < nx - 1, shp).astype(dtype) * -1.0
    coef = np.stack([zm, ym, xm, main, xp, yp, zp]).astype(dtype)
    stencil = (
        (-1, 0, 0),
        (0, -1, 0),
        (0, 0, -1),
        (0, 0, 0),
        (0, 0, 1),
        (0, 1, 0),
        (1, 0, 0),
    )
    return StencilMatrix(jnp.asarray(coef), stencil, shp)


def random_spd_ell(
    n: int, row_nnz: int = 8, seed: int = 0, dtype=np.float64
) -> EllMatrix:
    """Random diagonally-dominant SPD matrix in ELL format (general-sparse path).

    Built as S + S^T + shift*I from a random sparse S, so it is symmetric and
    strictly diagonally dominant (hence SPD).
    """
    rng = np.random.default_rng(seed)
    half = max(1, row_nnz // 2)
    rows = np.repeat(np.arange(n), half)
    cols = rng.integers(0, n, size=rows.size)
    vals = rng.uniform(-1.0, 1.0, size=rows.size).astype(dtype)
    import scipy.sparse as sp

    S = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    A = S + S.T
    A = A.tolil()
    A.setdiag(np.abs(A).sum(axis=1).A1 + 1.0)
    A = A.tocsr()
    from krylov_tpu.sparse.convert import to_ell

    return to_ell(A, dtype=dtype)


def rhs_for_solution(A, x_true: np.ndarray) -> np.ndarray:
    """b = A @ x_true computed on host in float64 for a known-solution test."""
    dense_free = hasattr(A, "matvec")
    if dense_free:
        import jax

        return np.asarray(
            jax.device_get(A.matvec(jnp.asarray(x_true, dtype=A.dtype)))
        )
    return np.asarray(A @ x_true)


def ones_rhs(n: int, dtype=np.float64) -> np.ndarray:
    return np.ones(n, dtype=dtype)
