"""Conjugate gradient, as a single jitted ``lax.while_loop``.

Numerics follow the reference CG exactly (reference: v3/cpu/cg.py:7-48):
per iteration one SpMV, ``sigma = <p, Ap>``, ``alpha = gamma/sigma``,
``x += alpha p``, ``r -= alpha v``, ``beta = gamma'/gamma``, ``p = r + beta p``,
with convergence on the relative residual ``||r||/||b|| < tol`` checked
*before* the update.  The mesh-parameterized :class:`~krylov_tpu.context.Context`
replaces the reference's per-backend trees.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from krylov_tpu.context import Context, DEFAULT_CONTEXT
from krylov_tpu.solvers._common import (
    SolveResult,
    safe_div,
    scalar_dtype_of,
    tree_select,
)


def cg_kernel(
    A,
    b,
    x0,
    *,
    tol: float = 1e-5,
    maxiter: int,
    ctx: Context = DEFAULT_CONTEXT,
    carry_in=None,
    emit_carry: bool = False,
) -> SolveResult:
    """``carry_in=((x, r, p, gamma), valid)`` resumes the recurrence exactly
    from a previous chunk's ``result.carry`` (when the traced ``valid`` is
    True); ``emit_carry=True`` returns the post-loop state in
    ``result.carry``.  Used by :func:`krylov_tpu.api.solve`'s ``chunk_iters``
    for exact (non-restarted) chunked dispatch."""
    sdt = scalar_dtype_of(ctx, b)
    b_norm = ctx.norm(b)

    r0 = b - ctx.matvec(A, x0)
    p0 = r0
    gamma0 = ctx.dot(r0, r0)

    if carry_in is not None:
        (xc, rc, pc, gammac), valid = carry_in
        x0, r0, p0, gamma0 = tree_select(
            valid, (xc, rc, pc, gammac), (x0, r0, p0, gamma0)
        )

    res_trace = jnp.zeros(maxiter + 1, dtype=sdt)
    i0 = jnp.zeros((), jnp.int32)
    carry0 = (x0, r0, p0, gamma0, i0, jnp.zeros((), bool), res_trace)

    def cond(c):
        *_, i, converged, _trace = c
        return jnp.logical_and(~converged, i < maxiter)

    def body(c):
        x, r, p, gamma, i, _, trace = c
        res = jnp.sqrt(gamma) / b_norm  # gamma == <r, r> is carried
        trace = trace.at[i].set(res)
        conv = res < tol

        v = ctx.matvec(A, p)
        sigma = ctx.dot(p, v)
        alpha = safe_div(gamma, sigma)
        x_n = x + (alpha * p).astype(x.dtype)
        r_n = r - (alpha * v).astype(r.dtype)
        gamma_n = ctx.dot(r_n, r_n)
        beta = safe_div(gamma_n, gamma)
        p_n = r_n + (beta * p).astype(p.dtype)

        x, r, p, gamma = tree_select(
            conv, (x, r, p, gamma), (x_n, r_n, p_n, gamma_n)
        )
        i = jnp.where(conv, i, i + 1)
        return (x, r, p, gamma, i, conv, trace)

    x, r, p, gamma, i, converged, trace = lax.while_loop(cond, body, carry0)

    # Diverged exit: the reference's while/else writes the final residual
    # (reference: v3/cpu/cg.py:37-40).
    final_res = jnp.sqrt(gamma) / b_norm
    trace = jnp.where(converged, trace, trace.at[i].set(final_res))

    nosl = jnp.arange(maxiter + 1, dtype=jnp.int32)
    return SolveResult(
        x=x,
        residual_trace=trace,
        nosl_trace=nosl,
        iterations=i,
        index=i,
        converged=converged,
        carry=(x, r, p, gamma) if emit_carry else None,
    )
