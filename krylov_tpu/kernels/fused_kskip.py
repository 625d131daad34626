"""Fused whole-solve Pallas kernels for the k-skip family (k-skip CG,
k-skip MrR, adaptive k-skip MrR): the ENTIRE communication-avoiding outer
loop — basis construction, coefficient bundle, scalar recurrences, vector
updates, convergence test, adaptive rollback — in ONE kernel launch.

This finishes the job the reference left undone: its adaptive solver
imported a Cython ``scalar_iteration`` kernel for exactly this inner
iteration that was never committed (reference:
v1/processes/adaptivekskipmrr.py:5, gitignored per .gitignore:3-19).  Here
the whole solve is on-core: the ``lax.while_loop`` solvers in
:mod:`krylov_tpu.solvers` pay per-op dispatch every outer iteration; this
kernel pays dispatch ONCE per solve (measured ~22 ms/solve saved at the
BASELINE config-2 size, see kernels/fused.py).

Design notes (vs. the while_loop solvers):

- **Streamed bundle, O(1) VMEM in k.**  The bundle entries only ever pair
  ADJACENT basis vectors (``alpha[2s] = <Ar[s], Ar[s]>``,
  ``alpha[2s+1] = <Ar[s], Ar[s+1]>``, same structure for beta/delta and the
  CG a/f/c — reference: v3/cpu/kskipmrr.py:51-59, v3/cpu/kskipcg.py:40-48),
  so the kernel never materializes the (k+2, N) Krylov bases: it streams
  them through two 2-slot VMEM ring buffers, emitting the 6k+O(1) inner
  products on the fly.  VMEM use is ~12 grid-sized buffers regardless of k
  (the while_loop solvers and the reference both hold O(k) basis vectors).
- **Scalar recurrences on SMEM.**  alpha/beta/delta (a/f/c for CG) live in
  SMEM scratch arrays; the k-step recurrences (reference:
  v3/cpu/kskipmrr.py:72-93, v3/cpu/kskipcg.py:59-64) run as ``fori_loop``s
  with dynamic SMEM indexing — pure scalar dataflow next to the VPU.
- **Traced k.**  k is an SMEM scalar input, so the SAME compiled kernel
  serves every k <= k_max; the adaptive variant decrements it on rollback
  (floor 1, reference: v3/cpu/adaptivekskipmrr.py:63-65) with no host
  round-trip — the BASELINE north-star requirement.
- x0 is handled by the wrapper via the shift ``A(x0+dx)=b => A dx = b-Ax0``
  (identical residual history); b_norm stays that of the original b.

Scope: stencil operators (2-D grids, or 3-D via the collapsed-grid form)
whose ~12-grid working set fits VMEM; the while_loop path covers the rest.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from krylov_tpu.kernels.fused import _H, TRACE_CAP, _apply_stencil


def _sdiv(num, den):
    """Scalar safe divide (semantics of solvers._common.safe_div)."""
    zero = den == 0
    return jnp.where(zero, jnp.zeros_like(num), num / jnp.where(zero, 1.0, den))


def _dot(a, b):
    return jnp.sum(a * b)


class _Stencil:
    """Bound stencil application: y = A @ v via the shared padded buffer.

    ``pad_ref`` is zeroed once at kernel start; only its interior is ever
    written afterwards, so the border keeps supplying the boundary zeros.
    """

    def __init__(self, coef_ref, pad_ref, stencil, g0p, g1, p1lo, g0, sub=None):
        self.coef_ref = coef_ref
        self.pad_ref = pad_ref
        self.stencil = stencil
        self.g0p = g0p
        self.g1 = g1
        self.p1lo = p1lo
        self.g0 = g0
        self.sub = sub
        self.interior = (slice(_H, _H + g0p), slice(p1lo, p1lo + g1))

    def __call__(self, v):
        self.pad_ref[self.interior] = v
        return _apply_stencil(
            self.coef_ref,
            self.pad_ref[...],
            self.stencil,
            self.g0p,
            self.g1,
            self.p1lo,
            self.g0,
            self.sub,
        )


def _ring_read(ref, slot):
    return ref[pl.ds(slot, 1)][0]


def _ring_write(ref, slot, val):
    ref[pl.ds(slot, 1)] = val[None]


def _kskipmrr_fused_kernel(
    scal_ref,  # SMEM (2,): [tol, b_norm]
    kin_ref,  # SMEM (1,) int32: initial k
    coef_ref,  # VMEM (ns, g0p, g1) or SMEM (ns,)
    b_ref,  # VMEM (g0p, g1)
    x_ref,  # out VMEM (g0p, g1)
    trace_ref,  # out SMEM (trace_len,)
    nosl_ref,  # out SMEM (trace_len,) int32
    ktrace_ref,  # out SMEM (trace_len,) int32
    stats_ref,  # out SMEM (4,) int32: [i, converged, index, final_k]
    pad_ref,  # scratch VMEM padded SpMV source
    r_ref,
    y_ref,
    z_ref,
    ar1_ref,  # carried Ar[1]
    prex_ref,  # adaptive only (allocated regardless; unused when static)
    arb_ref,  # scratch VMEM (2, g0p, g1): Ar ring
    ayb_ref,  # scratch VMEM (2, g0p, g1): Ay ring
    alpha_ref,  # scratch SMEM (2*k_max+3,)
    beta_ref,  # scratch SMEM (2*k_max+2,)
    delta_ref,  # scratch SMEM (2*k_max+1,)
    *,
    stencil,
    g0p,
    g1,
    p1lo,
    maxiter,
    trace_len,
    adaptive: bool,
    g0=None,
    sub=None,
):
    """k-skip MrR / adaptive k-skip MrR whole-solve kernel.

    Semantics: solvers/kskip_mrr.py (static) and
    solvers/adaptive_kskip_mrr.py (adaptive), which follow the reference
    (reference: v3/cpu/kskipmrr.py:8-108, v3/cpu/adaptivekskipmrr.py:8-141)
    with the carried-Ar[1] optimization documented there.
    """
    tol = scal_ref[0]
    b_norm = scal_ref[1]
    k0 = kin_ref[0]
    dt = b_ref.dtype

    A = _Stencil(coef_ref, pad_ref, stencil, g0p, g1, p1lo, g0, sub)
    pad_ref[...] = jnp.zeros(pad_ref.shape, dt)

    # --- init half-iteration (reference: v3/cpu/kskipmrr.py:20-34) ---
    r = b_ref[...]  # x0 = 0 after the wrapper's shift
    res0 = jnp.sqrt(_dot(r, r)) / b_norm
    trace_ref[0] = res0
    nosl_ref[0] = 0
    Ar1 = A(r)
    zeta = _sdiv(_dot(r, Ar1), _dot(Ar1, Ar1))
    y = zeta * Ar1
    z = -zeta * r
    r = r - y
    y_ref[...] = y
    z_ref[...] = z
    r_ref[...] = r
    x_ref[...] = -z  # x = x0 - z with x0 = 0
    nosl_ref[1] = 1
    ar1_ref[...] = A(r)  # seed the carried Ar[1]
    ktrace_ref[0] = k0
    ktrace_ref[1] = k0
    if adaptive:
        prex_ref[...] = x_ref[...]

    def cond(carry):
        i, index, conv, kk, pre_res = carry
        return jnp.logical_and(~conv, i < maxiter)

    def body(carry):
        i, index, conv_prev, kk, pre_res = carry
        r = r_ref[...]
        res = jnp.sqrt(_dot(r, r)) / b_norm
        trace_ref[jnp.minimum(index, trace_len - 1)] = res

        if adaptive:
            # --- residual guard: rollback + k decrement (reference:
            # v3/cpu/adaptivekskipmrr.py:44-66) ---
            # non-finite => rollback (NaN compares False; see
            # solvers/adaptive_kskip_mrr.py rollback predicate)
            rose = jnp.logical_or(res > pre_res, ~jnp.isfinite(res))

            @pl.when(rose)
            def _():
                x_in = prex_ref[...]
                r_new = b_ref[...] - A(x_in)
                Ar1_new = A(r_new)
                zeta_ = _sdiv(_dot(r_new, Ar1_new), _dot(Ar1_new, Ar1_new))
                y_ = zeta_ * Ar1_new
                z_ = -zeta_ * r_new
                r_out = r_new - y_
                x_out = x_in - z_
                y_ref[...] = y_
                z_ref[...] = z_
                r_ref[...] = r_out
                x_ref[...] = x_out
                ar1_ref[...] = A(r_out)
                res_n = jnp.sqrt(_dot(r_out, r_out)) / b_norm
                idx_n = jnp.minimum(index + 1, trace_len - 1)
                trace_ref[idx_n] = res_n
                nosl_ref[idx_n] = i + 1
                ktrace_ref[idx_n] = jnp.where(kk > 1, kk - 1, kk)

            @pl.when(~rose)
            def _():
                prex_ref[...] = x_ref[...]

            kk = jnp.where(rose & (kk > 1), kk - 1, kk)
            i = jnp.where(rose, i + 1, i)
            index = jnp.where(rose, index + 1, index)
            pre_res = jnp.where(rose, pre_res, res)

        cur_res = trace_ref[jnp.minimum(index, trace_len - 1)]
        conv = cur_res < tol

        @pl.when(~conv)
        def _():
            # --- streamed bundle: bases + 6k+6 inner products, O(1) VMEM ---
            # (bundle structure: reference v3/cpu/kskipmrr.py:51-59)
            _ring_write(arb_ref, 0, r_ref[...])
            _ring_write(arb_ref, 1, ar1_ref[...])
            _ring_write(ayb_ref, 0, y_ref[...])

            def stream(s, _):
                cur = s % 2
                nxt = 1 - cur
                Ar_s = _ring_read(arb_ref, cur)
                Ar_s1 = _ring_read(arb_ref, nxt)
                Ay_s = _ring_read(ayb_ref, cur)
                alpha_ref[2 * s] = _dot(Ar_s, Ar_s)
                alpha_ref[2 * s + 1] = _dot(Ar_s, Ar_s1)
                beta_ref[2 * s] = _dot(Ay_s, Ar_s)
                beta_ref[2 * s + 1] = _dot(Ay_s, Ar_s1)
                delta_ref[2 * s] = _dot(Ay_s, Ay_s)

                @pl.when(s == kk)
                def _():
                    alpha_ref[2 * s + 2] = _dot(Ar_s1, Ar_s1)

                @pl.when(s < kk)
                def _():
                    _ring_write(arb_ref, cur, A(Ar_s1))  # Ar[s+2]
                    Ay_s1 = A(Ay_s)
                    _ring_write(ayb_ref, nxt, Ay_s1)  # Ay[s+1]
                    delta_ref[2 * s + 1] = _dot(Ay_s, Ay_s1)

                return 0

            lax.fori_loop(0, kk + 1, stream, 0)
            beta_ref[0] = jnp.zeros((), dt)  # beta[0] = 0 by definition

            # --- MrR step 1 (reference: v3/cpu/kskipmrr.py:62-70) ---
            d0 = alpha_ref[2] * delta_ref[0] - beta_ref[1] ** 2
            zeta_s = _sdiv(alpha_ref[1] * delta_ref[0], d0)
            eta_s = -_sdiv(alpha_ref[1] * beta_ref[1], d0)
            y_n = eta_s * y_ref[...] + zeta_s * ar1_ref[...]
            z_n = eta_s * z_ref[...] - zeta_s * r_ref[...]
            r_n = r_ref[...] - y_n
            y_ref[...] = y_n
            z_ref[...] = z_n
            r_ref[...] = r_n
            ar1_ref[...] = A(r_n)
            x_ref[...] = x_ref[...] - z_n

            # --- k scalar-recurrence steps (reference:
            # v3/cpu/kskipmrr.py:72-93) ---
            def k_step(j, st):
                zeta_s, eta_s = st
                delta_ref[0] = (
                    zeta_s**2 * alpha_ref[2] + eta_s * zeta_s * beta_ref[1]
                )
                alpha_ref[0] = alpha_ref[0] - zeta_s * alpha_ref[1]
                delta_ref[1] = (
                    eta_s**2 * delta_ref[1]
                    + 2 * eta_s * zeta_s * beta_ref[2]
                    + zeta_s**2 * alpha_ref[3]
                )
                beta_ref[1] = (
                    eta_s * beta_ref[1] + zeta_s * alpha_ref[2] - delta_ref[1]
                )
                alpha_ref[1] = -beta_ref[1]

                def l_step(l, _):
                    delta_ref[l] = (
                        eta_s**2 * delta_ref[l]
                        + 2 * eta_s * zeta_s * beta_ref[l + 1]
                        + zeta_s**2 * alpha_ref[l + 2]
                    )
                    tau = eta_s * beta_ref[l] + zeta_s * alpha_ref[l + 1]
                    beta_ref[l] = tau - delta_ref[l]
                    alpha_ref[l] = alpha_ref[l] - tau - beta_ref[l]
                    return 0

                lax.fori_loop(2, 2 * (kk - j) + 1, l_step, 0)

                d0 = alpha_ref[2] * delta_ref[0] - beta_ref[1] ** 2
                zeta_n = _sdiv(alpha_ref[1] * delta_ref[0], d0)
                eta_n = -_sdiv(alpha_ref[1] * beta_ref[1], d0)
                y_n = eta_n * y_ref[...] + zeta_n * ar1_ref[...]
                z_n = eta_n * z_ref[...] - zeta_n * r_ref[...]
                r_n = r_ref[...] - y_n
                y_ref[...] = y_n
                z_ref[...] = z_n
                r_ref[...] = r_n
                ar1_ref[...] = A(r_n)
                x_ref[...] = x_ref[...] - z_n
                return (zeta_n, eta_n)

            lax.fori_loop(0, kk, k_step, (zeta_s, eta_s))

            i_n = i + kk + 1
            idx_n = jnp.minimum(index + 1, trace_len - 1)
            nosl_ref[idx_n] = i_n
            if adaptive:
                ktrace_ref[idx_n] = kk

        i = jnp.where(conv, i, i + kk + 1)
        index = jnp.where(conv, index, index + 1)
        return (i, index, conv, kk, pre_res)

    i0 = jnp.ones((), jnp.int32)
    carry = (i0, i0, jnp.zeros((), bool), k0, res0)
    i, index, conv, kk, _ = lax.while_loop(cond, body, carry)

    # diverged exit writes the final residual (reference: v3/cpu/kskipmrr.py:112-115)
    r = r_ref[...]
    final_res = jnp.sqrt(_dot(r, r)) / b_norm

    @pl.when(~conv)
    def _():
        trace_ref[jnp.minimum(index, trace_len - 1)] = final_res

    stats_ref[0] = i
    stats_ref[1] = conv.astype(jnp.int32)
    stats_ref[2] = index
    stats_ref[3] = kk


def _kskipcg_fused_kernel(
    scal_ref,  # SMEM (2,): [tol, b_norm]
    kin_ref,  # SMEM (1,) int32
    coef_ref,
    b_ref,
    x_ref,
    trace_ref,
    nosl_ref,
    stats_ref,  # out SMEM (3,) int32: [i, converged, index]
    pad_ref,
    r_ref,
    p_ref,
    ap1_ref,  # Ap[1], preserved across the stream for CG step 1
    apc_ref,  # current A@p inside the inner steps
    arb_ref,  # (2, g0p, g1) Ar ring
    apb_ref,  # (2, g0p, g1) Ap ring
    a_ref,  # SMEM (2*k_max+1,)
    f_ref,  # SMEM (2*k_max+4,)  (f[2k+3] stays 0, unread in-loop)
    c_ref,  # SMEM (2*k_max+2,)
    *,
    stencil,
    g0p,
    g1,
    p1lo,
    maxiter,
    trace_len,
    g0=None,
    sub=None,
):
    """k-skip CG whole-solve kernel (semantics: solvers/kskip_cg.py, which
    follows reference: v3/cpu/kskipcg.py:8-87)."""
    tol = scal_ref[0]
    b_norm = scal_ref[1]
    kk = kin_ref[0]
    dt = b_ref.dtype

    A = _Stencil(coef_ref, pad_ref, stencil, g0p, g1, p1lo, g0, sub)
    pad_ref[...] = jnp.zeros(pad_ref.shape, dt)

    # r0 = p0 = b (x0 = 0 after the wrapper's shift)
    r_ref[...] = b_ref[...]
    p_ref[...] = b_ref[...]
    x_ref[...] = jnp.zeros((g0p, g1), dt)
    nosl_ref[0] = 0

    def cond(carry):
        i, index, conv = carry
        return jnp.logical_and(~conv, i < maxiter)

    def body(carry):
        i, index, _ = carry

        # --- streamed bundle (structure: reference v3/cpu/kskipcg.py:40-48) ---
        _ring_write(arb_ref, 0, r_ref[...])
        _ring_write(apb_ref, 0, p_ref[...])
        ap1 = A(p_ref[...])
        _ring_write(apb_ref, 1, ap1)
        ap1_ref[...] = ap1

        def stream(s, _):
            cur = s % 2
            nxt = 1 - cur
            Ar_s = _ring_read(arb_ref, cur)
            Ap_s = _ring_read(apb_ref, cur)
            Ap_s1 = _ring_read(apb_ref, nxt)
            a_ref[2 * s] = _dot(Ar_s, Ar_s)
            f_ref[2 * s] = _dot(Ap_s, Ap_s)
            f_ref[2 * s + 1] = _dot(Ap_s, Ap_s1)
            c_ref[2 * s] = _dot(Ar_s, Ap_s)
            c_ref[2 * s + 1] = _dot(Ar_s, Ap_s1)

            @pl.when(s < kk)
            def _():
                Ar_s1 = A(Ar_s)
                _ring_write(arb_ref, nxt, Ar_s1)  # Ar[s+1]
                a_ref[2 * s + 1] = _dot(Ar_s, Ar_s1)
                _ring_write(apb_ref, cur, A(Ap_s1))  # Ap[s+2]

            @pl.when(s == kk)
            def _():
                f_ref[2 * s + 2] = _dot(Ap_s1, Ap_s1)

            return 0

        lax.fori_loop(0, kk + 1, stream, 0)

        res = jnp.sqrt(a_ref[0]) / b_norm
        trace_ref[jnp.minimum(index, trace_len - 1)] = res
        conv = res < tol

        @pl.when(~conv)
        def _():
            # --- k+1 CG steps via scalar recurrences (reference:
            # v3/cpu/kskipcg.py:50-74) ---
            alpha = _sdiv(a_ref[0], f_ref[1])
            beta = _sdiv(alpha**2 * f_ref[2], a_ref[0]) - 1
            x_ref[...] = x_ref[...] + alpha * p_ref[...]
            r_n = r_ref[...] - alpha * ap1_ref[...]
            r_ref[...] = r_n
            p_n = r_n + beta * p_ref[...]
            p_ref[...] = p_n
            apc_ref[...] = A(p_n)

            def k_step(j, st):
                alpha, beta = st

                def l_step(l, _):
                    a_ref[l] = a_ref[l] + alpha * (
                        alpha * f_ref[l + 2] - 2 * c_ref[l + 1]
                    )
                    d = c_ref[l] - alpha * f_ref[l + 1]
                    c_ref[l] = a_ref[l] + d * beta
                    f_ref[l] = c_ref[l] + beta * (d + beta * f_ref[l])
                    return 0

                lax.fori_loop(0, 2 * (kk - j) + 1, l_step, 0)
                alpha_n = _sdiv(a_ref[0], f_ref[1])
                beta_n = _sdiv(alpha_n**2 * f_ref[2], a_ref[0]) - 1
                x_ref[...] = x_ref[...] + alpha_n * p_ref[...]
                r_n = r_ref[...] - alpha_n * apc_ref[...]
                r_ref[...] = r_n
                p_n = r_n + beta_n * p_ref[...]
                p_ref[...] = p_n
                apc_ref[...] = A(p_n)
                return (alpha_n, beta_n)

            lax.fori_loop(0, kk, k_step, (alpha, beta))

            i_n = i + kk + 1
            nosl_ref[jnp.minimum(index + 1, trace_len - 1)] = i_n

        i = jnp.where(conv, i, i + kk + 1)
        index = jnp.where(conv, index, index + 1)
        return (i, index, conv)

    carry = (jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32), jnp.zeros((), bool))
    i, index, conv = lax.while_loop(cond, body, carry)

    r = r_ref[...]
    final_res = jnp.sqrt(_dot(r, r)) / b_norm

    @pl.when(~conv)
    def _():
        trace_ref[jnp.minimum(index, trace_len - 1)] = final_res

    stats_ref[0] = i
    stats_ref[1] = conv.astype(jnp.int32)
    stats_ref[2] = index


def _prep(coef, b, tol, b_norm, stencil, grid):
    """Shared wrapper preprocessing: pad the grid to the 8-sublane multiple."""
    g0, g1 = grid
    p1lo = max(0, -min(d[1] for d in stencil))
    p1hi = max(0, max(d[1] for d in stencil))
    if max(abs(d[0]) for d in stencil) > _H:
        raise ValueError("stencil row displacement exceeds kernel halo")
    g0p = -(-g0 // _H) * _H

    bg = jnp.pad(b.reshape(grid), ((0, g0p - g0), (0, 0)))
    const = coef.ndim == 1
    if const:
        coef_p = coef
        coef_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    else:
        coef_p = (
            jnp.pad(coef, ((0, 0), (0, g0p - g0), (0, 0)))
            if g0p != g0
            else coef
        )
        coef_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    scal = jnp.stack(
        [jnp.asarray(tol, bg.dtype), jnp.asarray(b_norm, bg.dtype)]
    )
    return g0, g1, g0p, p1lo, p1hi, bg, const, coef_p, coef_spec, scal


@functools.partial(
    jax.jit,
    static_argnames=(
        "stencil", "grid", "maxiter", "k_max", "adaptive", "sub", "interpret"
    ),
)
def fused_kskipmrr_solve_2d(
    coef,
    b,
    tol,
    b_norm,
    k,
    *,
    stencil: Tuple[Tuple[int, int], ...],
    grid: Tuple[int, int],
    maxiter: int,
    k_max: int,
    adaptive: bool = False,
    sub=None,
    interpret: bool = False,
):
    """Whole k-skip MrR (or adaptive) solve in one kernel.

    ``k`` is a runtime value <= the static ``k_max`` (SMEM buffer bound).
    Returns ``(x_flat, trace, nosl, ktrace, iters, conv, index, final_k)``
    (``ktrace``/``final_k`` meaningful for ``adaptive=True`` only).
    """
    g0, g1, g0p, p1lo, p1hi, bg, const, coef_p, coef_spec, scal = _prep(
        coef, b, tol, b_norm, stencil, grid
    )
    trace_len = min(maxiter, TRACE_CAP) + 2
    kin = jnp.asarray([k], jnp.int32)

    kernel = functools.partial(
        _kskipmrr_fused_kernel,
        stencil=stencil,
        g0p=g0p,
        g1=g1,
        p1lo=p1lo,
        maxiter=maxiter,
        trace_len=trace_len,
        adaptive=adaptive,
        g0=g0 if const else None,
        sub=sub if const else None,
    )
    grid_buf = lambda: pltpu.VMEM((g0p, g1), bg.dtype)  # noqa: E731
    x, trace, nosl, ktrace, stats = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            coef_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((g0p, g1), bg.dtype),
            jax.ShapeDtypeStruct((trace_len,), bg.dtype),
            jax.ShapeDtypeStruct((trace_len,), jnp.int32),
            jax.ShapeDtypeStruct((trace_len,), jnp.int32),
            jax.ShapeDtypeStruct((4,), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((g0p + 2 * _H, g1 + p1lo + p1hi), bg.dtype),
            grid_buf(),  # r
            grid_buf(),  # y
            grid_buf(),  # z
            grid_buf(),  # Ar1
            grid_buf(),  # pre_x
            pltpu.VMEM((2, g0p, g1), bg.dtype),  # Ar ring
            pltpu.VMEM((2, g0p, g1), bg.dtype),  # Ay ring
            pltpu.SMEM((2 * k_max + 3,), bg.dtype),
            pltpu.SMEM((2 * k_max + 2,), bg.dtype),
            pltpu.SMEM((2 * k_max + 1,), bg.dtype),
        ],
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(scal, kin, coef_p, bg)

    x_flat = x[:g0].reshape(-1)
    return (
        x_flat,
        trace,
        nosl,
        ktrace,
        stats[0],
        stats[1].astype(bool),
        stats[2],
        stats[3],
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "stencil", "grid", "maxiter", "k_max", "sub", "interpret"
    ),
)
def fused_kskipcg_solve_2d(
    coef,
    b,
    tol,
    b_norm,
    k,
    *,
    stencil: Tuple[Tuple[int, int], ...],
    grid: Tuple[int, int],
    maxiter: int,
    k_max: int,
    sub=None,
    interpret: bool = False,
):
    """Whole k-skip CG solve in one kernel.

    Returns ``(x_flat, trace, nosl, iters, conv, index)``.
    """
    g0, g1, g0p, p1lo, p1hi, bg, const, coef_p, coef_spec, scal = _prep(
        coef, b, tol, b_norm, stencil, grid
    )
    trace_len = min(maxiter, TRACE_CAP) + 2
    kin = jnp.asarray([k], jnp.int32)

    kernel = functools.partial(
        _kskipcg_fused_kernel,
        stencil=stencil,
        g0p=g0p,
        g1=g1,
        p1lo=p1lo,
        maxiter=maxiter,
        trace_len=trace_len,
        g0=g0 if const else None,
        sub=sub if const else None,
    )
    grid_buf = lambda: pltpu.VMEM((g0p, g1), bg.dtype)  # noqa: E731
    x, trace, nosl, stats = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            coef_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((g0p, g1), bg.dtype),
            jax.ShapeDtypeStruct((trace_len,), bg.dtype),
            jax.ShapeDtypeStruct((trace_len,), jnp.int32),
            jax.ShapeDtypeStruct((3,), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((g0p + 2 * _H, g1 + p1lo + p1hi), bg.dtype),
            grid_buf(),  # r
            grid_buf(),  # p
            grid_buf(),  # Ap[1]
            grid_buf(),  # current A@p
            pltpu.VMEM((2, g0p, g1), bg.dtype),  # Ar ring
            pltpu.VMEM((2, g0p, g1), bg.dtype),  # Ap ring
            pltpu.SMEM((2 * k_max + 1,), bg.dtype),
            pltpu.SMEM((2 * k_max + 4,), bg.dtype),
            pltpu.SMEM((2 * k_max + 2,), bg.dtype),
        ],
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(scal, kin, coef_p, bg)

    x_flat = x[:g0].reshape(-1)
    return x_flat, trace, nosl, stats[0], stats[1].astype(bool), stats[2]
