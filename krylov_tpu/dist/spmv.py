"""Row-partitioned SpMV with halo-exchange or all-gather vector assembly.

This replaces the reference's distributed SpMV engines:

- ``MultiCpu.dot`` — local SpMV + ``comm.Allgather`` of the full N-vector on
  every rank (reference: v3/cpu/mpi/common.py:39-43);
- ``MultiGpu.dot`` — P2P broadcast of x to every GPU, per-GPU SpMV, P2P
  gather, then (MPI variant) an ``Allgather`` across processes (reference:
  v3/gpu/common.py:112-126, v3/gpu/mpi/common.py:137-165).

The reference always ships the FULL iterate vector to every participant.
The TPU-native design keeps every vector row-sharded and exchanges only what
the sparsity structure needs:

- ``halo`` strategy (banded/DIA operators): each device ``ppermute``s its
  boundary strips of width = matrix bandwidth to its ring neighbors — O(bw)
  bytes instead of O(N) — and applies the band stencil to the extended local
  vector.  The interior (offset-0 diagonal) product is issued between the
  ppermutes and their uses so XLA's scheduler can overlap transfer with
  compute.
- ``allgather`` strategy (general ELL / dense): ``lax.all_gather`` assembles
  x (the reference's design point), then the local row block is applied.

Everything here runs *inside* ``shard_map``; :func:`shard_operator` prepares
the globally-shaped pytree + partition specs.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import PartitionSpec as P

from krylov_tpu.sparse.formats import (
    DenseMatrix,
    DiaMatrix,
    EllMatrix,
    HybMatrix,
    StencilMatrix,
    gather_rows,
)


@dataclasses.dataclass(frozen=True)
class ShardedOperator:
    """Row-block-partitioned operator for use inside ``shard_map``.

    ``arrays`` hold the format's data leaves (globally shaped outside the
    shard_map boundary, local row-block shaped inside).  ``kind``/``offsets``/
    ``shape``/``n_devices``/``strategy`` are static.  For stencils,
    ``offsets`` carries the displacement tuples and ``grid`` the global grid
    (partitioned along its leading axis).
    """

    kind: str  # 'dia' | 'stencil' | 'ell' | 'dense'
    arrays: Tuple[jax.Array, ...]
    offsets: Optional[Tuple]  # dia: int offsets; stencil: displacement tuples
    shape: Tuple[int, int]  # global (padded) shape
    n_devices: int
    strategy: str  # 'halo' | 'allgather'
    grid: Optional[Tuple[int, ...]] = None  # stencil only

    needs_ctx = True

    @property
    def dtype(self):
        return self.arrays[0].dtype

    @property
    def local_n(self) -> int:
        return self.shape[0] // self.n_devices

    def matvec(self, x_local, ctx):
        if self.kind == "stencil":
            return _stencil_halo_matvec(self, x_local, ctx)
        if self.strategy == "halo":
            return _dia_halo_matvec(
                self.arrays[0], self.offsets, x_local, ctx.axis, self.n_devices
            )
        return _allgather_matvec(self, x_local, ctx)


jax.tree_util.register_dataclass(
    ShardedOperator,
    data_fields=["arrays"],
    meta_fields=["kind", "offsets", "shape", "n_devices", "strategy", "grid"],
)


def _ring_halo(x_local, left: int, right: int, axis: str, n_devices: int):
    """Fetch ``left`` trailing entries from the left ring neighbor and
    ``right`` leading entries from the right ring neighbor.

    Wrap-around strips at the global edges carry neighbor data that is
    multiplied by structurally-zero band entries, so no boundary special-case
    is needed (the DIA container stores out-of-range band entries as zero).
    """
    fwd = [(i, (i + 1) % n_devices) for i in range(n_devices)]  # to right
    bwd = [(i, (i - 1) % n_devices) for i in range(n_devices)]  # to left
    left_halo = (
        lax.ppermute(x_local[-left:], axis, fwd) if left > 0 else None
    )
    right_halo = (
        lax.ppermute(x_local[:right], axis, bwd) if right > 0 else None
    )
    return left_halo, right_halo


def _dia_halo_matvec(data_local, offsets, x_local, axis, n_devices):
    """Banded SpMV on the local row block with ring halo exchange.

    data_local[d, i] = A[row0+i, row0+i+offsets[d]] for this device's row
    block starting at global row ``row0``.  Requires left + right <= local_n
    (the boundary fix-up slices below; checked at partition time in
    :func:`shard_operator` — note this differs from 2*bandwidth for
    asymmetric bands, e.g. offsets (0, 1, 2) need 2 <= local_n, not 4).

    Structured for TRANSFER/COMPUTE OVERLAP (verified on the scheduled
    8-chip v5e HLO, benchmarks/overlap_analysis.py): the bulk pass applies
    the whole band to the local block padded with ZEROS — no data dependence
    on the ppermutes, so XLA's latency-hiding scheduler hoists it between
    ``collective-permute-start`` and ``-done`` — and only the ``left``/
    ``right`` boundary entries are then recomputed from the received halos.
    (A previous version concatenated halos before a single full-band pass;
    the scheduler fused everything after the -done and nothing overlapped.)
    """
    local_n = x_local.shape[0]
    left = max(0, -min(offsets))
    right = max(0, max(offsets))

    # Issue the halo transfers first ...
    left_halo, right_halo = _ring_halo(x_local, left, right, axis, n_devices)

    def band(x_ext, out_n, row0):
        """Band applied to ``x_ext`` (= input rows [row0-left, row0+out_n+right))
        for output rows [row0, row0+out_n)."""
        y = jnp.zeros(out_n, x_local.dtype)
        for d, off in enumerate(offsets):
            start = left + off
            c = lax.slice(data_local[d], (row0,), (row0 + out_n,))
            y = y + c * lax.slice(x_ext, (start,), (start + out_n,))
        return y

    # ... the halo-independent bulk next (zero-padded: rows closer than the
    # bandwidth to the block edge come out wrong and are recomputed below).
    x_pad = jnp.pad(x_local, (left, right))
    y_bulk = band(x_pad, local_n, 0)
    if left == 0 and right == 0:
        return y_bulk

    # Boundary fix-up: recompute the first ``left`` and last ``right`` rows
    # from the received halos (tiny: O(bandwidth^2) work).
    parts = []
    if left:
        top_ext = jnp.concatenate([left_halo, x_local[: left + right]])
        parts.append(band(top_ext, left, 0))
    parts.append(y_bulk[left : local_n - right])
    if right:
        bot_ext = jnp.concatenate(
            [x_local[local_n - right - left :], right_halo]
        )
        parts.append(band(bot_ext, right, local_n - right))
    return jnp.concatenate(parts)


def _stencil_halo_matvec(op: ShardedOperator, x_local, ctx):
    """Stencil SpMV on the local leading-axis slab with plane halo exchange.

    The global grid is partitioned along axis 0 into slabs of
    ``grid[0] / n_devices`` planes; each device exchanges ``lo0``/``hi0``
    boundary planes with its ring neighbors (one plane = prod(grid[1:])
    elements — the per-SpMV wire traffic, vs the full N-vector the reference
    allgathers, reference: v3/cpu/mpi/common.py:39-43).  Wrap-around planes
    at the global edges are multiplied by structurally-zero stencil
    coefficients, so no boundary special-case is needed.
    """
    (coef_local,) = op.arrays
    grid = op.grid
    local_g0 = grid[0] // op.n_devices
    rest = grid[1:]
    local_grid = (local_g0,) + rest
    xg = x_local.reshape(local_grid)
    constant = coef_local.ndim == 1

    lo0 = max(0, -min(d[0] for d in op.offsets))
    hi0 = max(0, max(d[0] for d in op.offsets))

    # Issue the halo transfers first ...
    fwd = [(i, (i + 1) % op.n_devices) for i in range(op.n_devices)]
    bwd = [(i, (i - 1) % op.n_devices) for i in range(op.n_devices)]
    top_halo = (
        lax.ppermute(xg[-lo0:], ctx.axis, fwd) if lo0 > 0 else None
    )
    bot_halo = (
        lax.ppermute(xg[:hi0], ctx.axis, bwd) if hi0 > 0 else None
    )
    if constant:
        # Constant-coefficient form: there are no stored boundary zeros to
        # neutralize the ring wrap-around planes, so the global-edge devices
        # must zero the halos they receive across the wrap.
        idx = lax.axis_index(ctx.axis)
        if top_halo is not None:
            top_halo = jnp.where(idx == 0, jnp.zeros_like(top_halo), top_halo)
        if bot_halo is not None:
            bot_halo = jnp.where(
                idx == op.n_devices - 1, jnp.zeros_like(bot_halo), bot_halo
            )

    pads_rest = []
    for ax in range(1, len(grid)):
        lo = max(0, -min(d[ax] for d in op.offsets))
        hi = max(0, max(d[ax] for d in op.offsets))
        pads_rest.append((lo, hi))

    def stencil(x_ext, out_g0, row0):
        """Stencil applied to slab ``x_ext`` (= input planes
        [row0-lo0, row0+out_g0+hi0)) for output planes [row0, row0+out_g0)."""
        xp = jnp.pad(x_ext, [(0, 0)] + pads_rest)
        y = jnp.zeros((out_g0,) + rest, x_local.dtype)
        out_shape = (out_g0,) + rest
        for s, disp in enumerate(op.offsets):
            starts = (lo0 + disp[0],) + tuple(
                p[0] + d for p, d in zip(pads_rest, disp[1:])
            )
            limits = tuple(st + g for st, g in zip(starts, out_shape))
            if constant:
                c = coef_local[s]
            else:
                c = lax.slice_in_dim(coef_local[s], row0, row0 + out_g0, axis=0)
            y = y + c * lax.slice(xp, starts, limits)
        return y

    # ... the halo-independent bulk next: the whole stencil on the local
    # slab padded with ZERO planes.  No data dependence on the ppermutes, so
    # XLA's latency-hiding scheduler hoists this (99.9% of the FLOPs)
    # between collective-permute-start and -done — verified on the scheduled
    # 8-chip v5e HLO (benchmarks/overlap_analysis.py; a previous version
    # concatenated the halos before one full-stencil pass, and the scheduler
    # fused everything after the -done: nothing overlapped).
    x_pad = jnp.pad(xg, [(lo0, hi0)] + [(0, 0)] * len(rest))
    y_bulk = stencil(x_pad, local_g0, 0)
    if lo0 == 0 and hi0 == 0:
        return y_bulk.reshape(-1)

    # Boundary fix-up: the first lo0 / last hi0 output planes read halo
    # planes; recompute just those from the received halos (O(plane) work).
    parts = []
    if lo0:
        top_ext = jnp.concatenate([top_halo, xg[: lo0 + hi0]], axis=0)
        parts.append(stencil(top_ext, lo0, 0))
    parts.append(y_bulk[lo0 : local_g0 - hi0])
    if hi0:
        bot_ext = jnp.concatenate(
            [xg[local_g0 - hi0 - lo0 :], bot_halo], axis=0
        )
        parts.append(stencil(bot_ext, hi0, local_g0 - hi0))
    return jnp.concatenate(parts, axis=0).reshape(-1)


def _allgather_matvec(op: ShardedOperator, x_local, ctx):
    """Local row-block SpMV after assembling x (reference design point:
    v3/cpu/mpi/common.py:39-43)."""
    x_full = lax.all_gather(x_local, ctx.axis, tiled=True)
    if op.kind == "ell":
        data_local, indices_local = op.arrays
        return jnp.sum(data_local * gather_rows(x_full, indices_local), axis=1)
    if op.kind == "hyb":
        ell_data, ell_idx, tail_rows, tail_data, tail_idx = op.arrays
        y = jnp.sum(ell_data * gather_rows(x_full, ell_idx), axis=1)
        extra = jnp.sum(tail_data * gather_rows(x_full, tail_idx), axis=1)
        # tail_rows are LOCAL row ids (shard_operator re-bases them).
        return y.at[tail_rows].add(extra)
    if op.kind == "dense":
        (data_local,) = op.arrays
        return jnp.dot(data_local, x_full, precision=lax.Precision.HIGHEST)
    if op.kind == "dia":
        (data_local,) = op.arrays
        local_n = x_local.shape[0]
        row0 = lax.axis_index(ctx.axis) * local_n
        pad = max(abs(o) for o in op.offsets)
        # Zero-pad so out-of-range band columns read zeros (their band
        # entries are structurally zero anyway).
        x_pad = jnp.pad(x_full, (pad, pad))
        y = jnp.zeros_like(x_local)
        for d, off in enumerate(op.offsets):
            seg = lax.dynamic_slice(x_pad, (row0 + off + pad,), (local_n,))
            y = y + data_local[d] * seg
        return y
    raise ValueError(f"unknown kind {op.kind}")


def shard_operator(A, n_devices: int, axis: str = "rows"):
    """Prepare (globally-shaped ShardedOperator, in_specs) for ``shard_map``.

    The caller must have padded the system so N % n_devices == 0
    (see :func:`krylov_tpu.sparse.convert.pad_to_multiple`).
    """
    n = A.shape[0]
    if n % n_devices != 0:
        raise ValueError(
            f"N={n} not divisible by n_devices={n_devices}; pad first "
            "(krylov_tpu.sparse.convert.pad_to_multiple)"
        )
    local_n = n // n_devices
    if isinstance(A, StencilMatrix):
        lo0 = max(0, -min(d[0] for d in A.stencil))
        hi0 = max(0, max(d[0] for d in A.stencil))
        if (
            A.grid[0] % n_devices == 0
            and lo0 + hi0 <= A.grid[0] // n_devices
        ):
            op = ShardedOperator(
                kind="stencil",
                arrays=(A.coef,),
                offsets=A.stencil,
                shape=A.shape,
                n_devices=n_devices,
                strategy="halo",
                grid=A.grid,
            )
            # coef (nstencil, g0, ...) shards along the leading grid axis;
            # constant (nstencil,) weights replicate to every device.
            coef_spec = (
                P(None)
                if A.is_constant
                else P(None, axis, *([None] * (len(A.grid) - 1)))
            )
            specs = dataclasses.replace(op, arrays=(coef_spec,))
            return op, specs
        # Leading grid axis does not divide the mesh: fall back to the
        # generic flat-DIA halo/all-gather path.
        return shard_operator(A.to_dia(), n_devices, axis=axis)
    if isinstance(A, DiaMatrix):
        left = max(0, -min(A.offsets)) if A.offsets else 0
        right = max(0, max(A.offsets)) if A.offsets else 0
        if left + right <= local_n and n_devices > 1:
            strategy = "halo"
        else:
            strategy = "allgather"
        op = ShardedOperator(
            kind="dia",
            arrays=(A.data,),
            offsets=A.offsets,
            shape=A.shape,
            n_devices=n_devices,
            strategy=strategy,
        )
        specs = ShardedOperator(
            kind="dia",
            arrays=(P(None, axis),),
            offsets=A.offsets,
            shape=A.shape,
            n_devices=n_devices,
            strategy=strategy,
        )
        return op, specs
    if isinstance(A, EllMatrix):
        op = ShardedOperator(
            kind="ell",
            arrays=(A.data, A.indices),
            offsets=None,
            shape=A.shape,
            n_devices=n_devices,
            strategy="allgather",
        )
        specs = dataclasses.replace(op, arrays=(P(axis, None), P(axis, None)))
        return op, specs
    if isinstance(A, HybMatrix):
        # Row-shard the ELL block directly.  The tail block is re-grouped by
        # owning row block on host: every device gets the same number of tail
        # slots (max over blocks, padded with zero rows), and tail row ids are
        # re-based to LOCAL row numbers so the scatter-add needs no offset.
        t_rows = np.asarray(A.tail_rows)
        t_data = np.asarray(A.tail_data)
        t_idx = np.asarray(A.tail_indices)
        real = np.any(t_data != 0, axis=1)
        block = t_rows // local_n
        block = np.where(real, block, 0)
        tmax = max(int(np.bincount(block[real], minlength=n_devices).max(initial=0)), 1)
        wt = t_data.shape[1]
        g_rows = np.zeros((n_devices, tmax), dtype=t_rows.dtype)
        g_data = np.zeros((n_devices, tmax, wt), dtype=t_data.dtype)
        g_idx = np.zeros((n_devices, tmax, wt), dtype=t_idx.dtype)
        fill = np.zeros(n_devices, dtype=np.int64)
        for ti in np.flatnonzero(real):
            d = block[ti]
            s = fill[d]
            g_rows[d, s] = t_rows[ti] - d * local_n
            g_data[d, s] = t_data[ti]
            g_idx[d, s] = t_idx[ti]
            fill[d] += 1
        op = ShardedOperator(
            kind="hyb",
            arrays=(
                A.ell_data,
                A.ell_indices,
                jnp.asarray(g_rows.reshape(-1)),
                jnp.asarray(g_data.reshape(-1, wt)),
                jnp.asarray(g_idx.reshape(-1, wt)),
            ),
            offsets=None,
            shape=A.shape,
            n_devices=n_devices,
            strategy="allgather",
        )
        specs = dataclasses.replace(
            op,
            arrays=(P(axis, None), P(axis, None), P(axis), P(axis, None), P(axis, None)),
        )
        return op, specs
    if isinstance(A, DenseMatrix):
        op = ShardedOperator(
            kind="dense",
            arrays=(A.data,),
            offsets=None,
            shape=A.shape,
            n_devices=n_devices,
            strategy="allgather",
        )
        specs = dataclasses.replace(op, arrays=(P(axis, None),))
        return op, specs
    raise TypeError(f"cannot shard operator of type {type(A)}")
