"""``shard_map`` wrapper: run ANY solver kernel row-partitioned over a mesh.

This is the single mesh-parameterized entry point that replaces the
reference's per-backend solver copies (reference: the v3/cpu/mpi and
v3/gpu/mpi trees re-implement every algorithm).  The SAME kernel functions
from :mod:`krylov_tpu.solvers` run here unchanged — only the
:class:`~krylov_tpu.context.Context` (axis name) and the operator
(:class:`~krylov_tpu.dist.spmv.ShardedOperator`) change.

Unlike the reference's MPI variants, which return the result on rank 0 and
``exit(0)`` on every other rank (reference: v3/cpu/mpi/cg.py:61-62), the
sharded solve returns replicated traces and the sharded solution on all
hosts, keeping the solve composable inside larger jitted programs.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from krylov_tpu.context import Context
from krylov_tpu.solvers._common import SolveResult
from krylov_tpu.sparse.convert import pad_to_multiple
from krylov_tpu.dist.spmv import shard_operator

_KSKIP_METHODS = {"kskipcg", "kskipmrr", "adaptivekskipmrr"}
_PRECONDITIONED_METHODS = {"pcg", "chronopoulos_gear", "gropp", "pipelined_cg"}

_CACHE: dict = {}


def shard_preconditioner(M, n_devices: int, axis: str):
    """Prepare (sharded M pytree, specs) mirroring :func:`shard_operator`.

    Supports library-operator preconditioners (Jacobi's diagonal DiaMatrix,
    any container) and :class:`~krylov_tpu.precond.ChebyshevPreconditioner`
    (its inner operator is sharded recursively, so the polynomial recurrence
    runs on row blocks with the same halo/all-gather collectives as A).
    """
    import dataclasses as _dc

    from krylov_tpu.precond import ChebyshevPreconditioner

    if M is None:
        return None, None
    if isinstance(M, ChebyshevPreconditioner):
        inner_op, inner_specs = shard_operator(M.A, n_devices, axis=axis)
        return (
            _dc.replace(M, A=inner_op),
            _dc.replace(M, A=inner_specs),
        )
    return shard_operator(M, n_devices, axis=axis)


def _build(mesh, axis, method, maxiter, k, ctx, op_specs, m_specs, has_k_trace):
    key = (mesh, axis, method, maxiter, k, ctx, op_specs, m_specs, has_k_trace)
    if key in _CACHE:
        return _CACHE[key]

    from krylov_tpu.api import _get_kernel

    kernel = _get_kernel(method)
    in_specs = (op_specs, P(axis), P(axis), P())
    if m_specs is not None:
        in_specs = in_specs + (m_specs,)
    out_specs = SolveResult(
        x=P(axis),
        residual_trace=P(),
        nosl_trace=P(),
        iterations=P(),
        index=P(),
        converged=P(),
        k_trace=P() if has_k_trace else None,
        final_k=P() if has_k_trace else None,
    )

    def local_fn(op, b_local, x0_local, tol, *maybe_m):
        kwargs = dict(tol=tol, maxiter=maxiter, ctx=ctx)
        if method in _KSKIP_METHODS:
            kwargs["k"] = k
        if method in _PRECONDITIONED_METHODS:
            kwargs["M"] = maybe_m[0] if maybe_m else None
        return kernel(op, b_local, x0_local, **kwargs)

    fn = jax.jit(
        jax.shard_map(local_fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    )
    _CACHE[key] = fn
    return fn


def solve_sharded(
    A,
    b,
    x0,
    *,
    tol: float,
    method: str,
    maxiter: int,
    k: int = 0,
    M=None,
    mesh: Mesh,
    scalar_dtype=None,
) -> SolveResult:
    """Row-partition the system over ``mesh`` and solve under ``shard_map``."""
    (axis,) = mesh.axis_names
    n_devices = mesh.devices.size
    n_orig = b.shape[0]

    A_p, b_p, _ = pad_to_multiple(A, np.asarray(b), n_devices)
    x0_np = np.asarray(x0)
    pad = A_p.shape[0] - n_orig
    x0_p = np.concatenate([x0_np, np.zeros(pad, dtype=x0_np.dtype)]) if pad else x0_np

    if M is not None and pad:
        raise NotImplementedError(
            "preconditioned sharded solves require N divisible by the mesh "
            "size (padding a preconditioner is not supported yet)"
        )
    op, op_specs = shard_operator(A_p, n_devices, axis=axis)
    m_op, m_specs = shard_preconditioner(M, n_devices, axis=axis)
    ctx = Context(axis=axis, scalar_dtype=scalar_dtype)
    has_k_trace = method == "adaptivekskipmrr"
    fn = _build(
        mesh, axis, method, maxiter, k, ctx, op_specs, m_specs, has_k_trace
    )

    args = (op, jnp.asarray(b_p), jnp.asarray(x0_p), jnp.asarray(tol))
    if m_op is not None:
        args = args + (m_op,)
    result = fn(*args)
    if pad:
        result = SolveResult(
            x=result.x[:n_orig],
            residual_trace=result.residual_trace,
            nosl_trace=result.nosl_trace,
            iterations=result.iterations,
            index=result.index,
            converged=result.converged,
            k_trace=result.k_trace,
            final_k=result.final_k,
        )
    return result
