"""Pallas TPU kernel: structured-grid stencil SpMV.

The Pallas counterpart of :meth:`krylov_tpu.sparse.formats.StencilMatrix.matvec`
(the role cuSPARSE SpMV plays for the reference, reference:
v3/gpu/common.py:119 ``A.dot`` on device).  Layout:

- the (zero-padded) grid vector ``x`` resides fully in VMEM — for f32 grids
  up to ~3M points it fits comfortably in the 16 MB budget;
- the stencil coefficients stream through VMEM in row-slab blocks via the
  grid pipeline (they are the 5/7x larger operand, so they are the one worth
  double-buffering);
- each program computes one (TILE0, G1) output slab as a static unroll of
  shifted VMEM reads * coefficient multiply-adds — pure VPU work.

For grids too large for a VMEM-resident vector the caller should use the
XLA stencil path (which reaches HBM roofline at those sizes anyway — see
StencilMatrix docstring); this kernel's value is the small/medium-N regime
where XLA's per-op overhead dominates, and as the building block of the
fused solver kernels in :mod:`krylov_tpu.kernels.fused`.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pads_for(stencil, ndim):
    pads = []
    for ax in range(ndim):
        lo = max(0, -min(d[ax] for d in stencil))
        hi = max(0, max(d[ax] for d in stencil))
        pads.append((lo, hi))
    return pads


_SUBLANE_HALO = 8  # row halo rounded up to the 8-sublane alignment unit


def _stencil2d_kernel(coef_ref, xp_ref, out_ref, *, stencil, tile0, g1, p1, sub=None):
    """One (tile0, g1) output slab.

    Mosaic requires dynamic sublane offsets to be provably 8-aligned, so the
    kernel performs a single ALIGNED load of the slab plus an 8-row halo on
    each side (rows are padded by 8 instead of the stencil's 1), then takes
    STATIC shifted slices of the loaded value — these lower to cheap
    sublane/lane rotates.
    """
    i = pl.program_id(0)
    row0 = pl.multiple_of(i * tile0, 8)
    H = _SUBLANE_HALO
    xs = xp_ref[pl.ds(row0, tile0 + 2 * H), :]
    acc = jnp.zeros((tile0, g1), dtype=out_ref.dtype)
    i2 = None
    for s, (d0, d1) in enumerate(stencil):
        block = xs[H + d0 : H + d0 + tile0, p1 + d1 : p1 + d1 + g1]
        term = coef_ref[s] * block
        if sub is not None and sub[1][s] != 0:
            # collapsed-3-D inner-axis boundary mask (see
            # kernels.fused._apply_stencil and StencilMatrix.collapse_to_2d)
            g2, d2s = sub
            if i2 is None:
                i2 = lax.broadcasted_iota(jnp.int32, (tile0, g1), 1) % g2
            d2 = d2s[s]
            mask = (i2 + d2 >= 0) & (i2 + d2 < g2)
            term = jnp.where(mask, term, jnp.zeros((), term.dtype))
        acc = acc + term
    out_ref[:] = acc


def _pick_tile0(g0: int, g1: int, itemsize: int) -> int:
    # TPU lowering requires the sublane (second-to-last) block dim to be a
    # multiple of 8; the grid is zero-padded up to a tile multiple.  Aim for
    # ~512KB output slabs.
    target = (512 * 1024) // max(1, g1 * itemsize)
    t = max(8, (target // 8) * 8)
    return min(t, ((g0 + 7) // 8) * 8)


@functools.partial(
    jax.jit, static_argnames=("stencil", "grid", "sub", "interpret")
)
def stencil_matvec_2d(
    coef: jax.Array,
    x: jax.Array,
    *,
    stencil: Tuple[Tuple[int, int], ...],
    grid: Tuple[int, int],
    sub=None,
    interpret: bool = False,
) -> jax.Array:
    """y = A x for a 2-D stencil operator; returns the flat vector."""
    g0, g1 = grid
    (p0lo, p0hi), (p1lo, p1hi) = _pads_for(stencil, 2)
    H = _SUBLANE_HALO
    if p0lo > H or p0hi > H:
        raise ValueError(
            f"stencil row displacement exceeds the {H}-row kernel halo"
        )
    tile0 = _pick_tile0(g0, g1, x.dtype.itemsize)
    g0p = -(-g0 // tile0) * tile0  # grid padded to a tile multiple

    xg = x.reshape(grid)
    # Rows padded by the full 8-sublane halo so every slab load is aligned.
    xp = jnp.pad(xg, ((H, H + g0p - g0), (p1lo, p1hi)))
    const = coef.ndim == 1
    if const:
        # Constant weights ride in SMEM; the zero-padded x supplies the
        # boundary zeros that stored grid coefficients would otherwise carry
        # (identical result — a leaving-grid coupling reads padding).
        coef_p = coef
        coef_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    else:
        coef_p = (
            jnp.pad(coef, ((0, 0), (0, g0p - g0), (0, 0)))
            if g0p != g0
            else coef
        )
        coef_spec = pl.BlockSpec(
            (len(stencil), tile0, g1),
            lambda i: (0, i, 0),
            memory_space=pltpu.VMEM,
        )

    kernel = functools.partial(
        _stencil2d_kernel,
        stencil=stencil,
        tile0=tile0,
        g1=g1,
        p1=p1lo,
        sub=sub if const else None,
    )
    out = pl.pallas_call(
        kernel,
        grid=(g0p // tile0,),
        in_specs=[
            coef_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),  # padded x, resident
        ],
        out_specs=pl.BlockSpec(
            (tile0, g1), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((g0p, g1), x.dtype),
        interpret=interpret,
    )(coef_p, xp)
    return out[:g0].reshape(-1)


def stencil_matvec(A, x, interpret: bool = False):
    """Dispatch: Pallas kernel for 2-D/3-D grids (VMEM-sized), XLA otherwise.

    3-D grids run on the same 2-D kernel over the collapsed (g0, g1*g2)
    view (StencilMatrix.collapse_to_2d)."""
    from krylov_tpu.sparse.formats import StencilMatrix

    assert isinstance(A, StencilMatrix)
    if len(A.grid) in (2, 3):
        n = A.shape[0]
        # padded x + coef slabs must fit VMEM; stay under ~12 MB for x.
        if n * x.dtype.itemsize <= 12 * 1024 * 1024:
            coef2, stencil2, grid2, sub = A.collapse_to_2d()
            return stencil_matvec_2d(
                coef2, x, stencil=stencil2, grid=grid2, sub=sub,
                interpret=interpret,
            )
    return A.matvec(x)
