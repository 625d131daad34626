"""Round-5 root-cause probes for the cacg TPU/CPU divergence (VERDICT r4 #2).

Probes (each printable as one JSON line, runnable on either backend with
--cpu forcing the host):

  numerics  f64 (emulated) dot/matmul precision: 1e16+1 payload, Gram-style
            matmul, cancellation — measured EXACT on the axon TPU backend.
  bounds    lanczos_bounds on the backend's native dtype — measured
            agreeing to 6 digits across backends.
  solve     end-to-end cacg/camrr at a given size/config (the
            smallest-failing-size scan; --dtype float32 lets CPU reproduce
            the TPU's vector numerics — measured converging, exonerating
            the vector dtype).
  dump      first-outer-iteration intermediate dump (chain norms, Gram,
            alphas, basis consistency) — measured bit-close across
            backends.
  outers    N forced outer iterations, unrolled vs lax.while_loop —
            exposed the two decisive facts: post-floor instability on
            EVERY backend, and the TPU's one-outer-later floor (emulated
            f64 Gram at ~2^-48).  while_loop lowering measured identical
            to unrolled.

Conclusion (round 5): fixed by the divergence guard in solvers/cacg.py;
see RESULTS.md "The cacg TPU/CPU divergence, root-caused".

Run:  python benchmarks/cacg_bisect.py --probe numerics
      JAX_PLATFORMS=cpu python benchmarks/cacg_bisect.py --probe numerics
"""

import argparse
import json
import sys

import numpy as np


def probe_numerics():
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from jax import lax

    out = {"backend": jax.default_backend()}

    # -- f64 dot precision: 1e16 + 1 is exact in f64, unrepresentable in f32.
    a = jnp.asarray(np.array([1e8, 1.0]), dtype=jnp.float64)
    d = jnp.dot(a, a, precision=lax.Precision.HIGHEST)
    out["dot_1e16_plus_1_err"] = float(np.asarray(d) - (1e16 + 1.0))

    # -- f64 matmul (Gram-style) precision, same payload through a (2,2) dot.
    B = jnp.stack([a, a])
    G = jnp.dot(B, B.T, precision=lax.Precision.HIGHEST)
    out["gram_1e16_plus_1_err"] = float(np.asarray(G)[0, 0] - (1e16 + 1.0))

    # -- f64 elementwise+sum fallback precision (what a hand-rolled reduction
    #    would deliver if dot is the broken primitive).
    s = jnp.sum(a * a)
    out["mulsum_1e16_plus_1_err"] = float(np.asarray(s) - (1e16 + 1.0))

    # -- cancellation: sum of [1, 1e-12, -1] — needs >f32 to see 1e-12.
    c = jnp.asarray(np.array([1.0, 1e-12, -1.0]), dtype=jnp.float64)
    one = jnp.ones(3, dtype=jnp.float64)
    out["dot_cancel_rel_err"] = float(
        (np.asarray(jnp.dot(c, one, precision=lax.Precision.HIGHEST)) - 1e-12)
        / 1e-12
    )
    print(json.dumps(out), flush=True)


def probe_bounds(n, graded):
    import jax
    from krylov_tpu.precond import lanczos_bounds
    from krylov_tpu.sparse.convert import to_hyb
    from krylov_tpu.sparse.fixtures import powerlaw_spd

    kw = dict(shift=1e-3, diag_scale_decades=1.5) if graded else {}
    A_sp = powerlaw_spd(n, seed=42, **kw)
    dtype = np.float32 if jax.default_backend() == "tpu" else np.float64
    H = to_hyb(A_sp, dtype=dtype)
    lmin, lmax = lanczos_bounds(H)
    print(json.dumps({
        "backend": jax.default_backend(), "n": n, "graded": graded,
        "dtype": str(np.dtype(dtype)), "lmin": lmin, "lmax": lmax,
    }), flush=True)


def probe_solve(n, graded, s, method="cacg", bounds=None, dtype=None):
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from krylov_tpu import api
    from krylov_tpu.sparse.convert import to_hyb
    from krylov_tpu.sparse.fixtures import powerlaw_spd

    kw = dict(shift=1e-3, diag_scale_decades=1.5) if graded else {}
    A_sp = powerlaw_spd(n, seed=42, **kw)
    if dtype is None:
        dtype = np.float32 if jax.default_backend() == "tpu" else np.float64
    H = to_hyb(A_sp, dtype=dtype)
    rng = np.random.default_rng(2)
    b = rng.standard_normal(n).astype(dtype)
    x, info = api.solve(
        H, b, method=method, k=s, tol=1e-6, maxiter=400,
        scalar_dtype=jnp.float64,
        spectral_bounds=tuple(bounds) if bounds else None,
    )
    x = np.asarray(x, np.float64)
    true_res = float(
        np.linalg.norm(b - A_sp @ x) / np.linalg.norm(b)
    )
    print(json.dumps({
        "backend": jax.default_backend(), "n": n, "graded": graded,
        "method": method, "s": s, "bounds": bounds,
        "dtype": str(np.dtype(dtype)),
        "iterations": int(info["iterations"]),
        "converged": bool(info["converged"]),
        "final_residual": float(info["residual"][-1]),
        "true_residual": true_res,
        "residual_trace_head": [
            float(v) for v in np.asarray(info["residual"])[:24]
        ],
    }), flush=True)


def probe_dump(n, graded, s):
    """Stage-by-stage first-outer-iteration dump (identical fixed inputs on
    every backend): chain norms, Gram entries, coefficient steps, recovery.
    Diffing the output across backends localizes where TPU and CPU part
    ways."""
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from jax import lax
    from krylov_tpu.context import Context
    from krylov_tpu.precond import lanczos_bounds
    from krylov_tpu.solvers.cacg import _chebyshev_T
    from krylov_tpu.sparse.convert import to_hyb
    from krylov_tpu.sparse.fixtures import powerlaw_spd
    from krylov_tpu.sparse.formats import to_device

    kw = dict(shift=1e-3, diag_scale_decades=1.5) if graded else {}
    A_sp = powerlaw_spd(n, seed=42, **kw)
    dtype = np.float32
    H = to_device(to_hyb(A_sp, dtype=dtype))
    ctx = Context(scalar_dtype=jnp.float64)
    lmin, lmax = 0.0476, 1.6654  # fixed: identical on every backend
    d = 0.5 * (lmax + lmin)
    c = 0.5 * (lmax - lmin)
    m = 2 * s + 1
    o = s + 1
    blocks = ((0, s), (o, s - 1))
    T = jnp.asarray(_chebyshev_T(m, blocks, lmin, lmax), jnp.float64)

    b = np.random.default_rng(123).standard_normal(n).astype(dtype)
    b = jnp.asarray(b)

    @jax.jit
    def one_outer(b):
        x = jnp.zeros_like(b)
        r = b - ctx.matvec(H, x)
        p = r

        def chain(v0, length):
            ch = [v0]
            if length >= 2:
                ch.append(((ctx.matvec(H, v0) - d * v0) / c).astype(dtype))
            for _ in range(length - 2):
                nxt = (
                    (2.0 / c) * (ctx.matvec(H, ch[-1]) - d * ch[-1])
                    - ch[-2]
                )
                ch.append(nxt.astype(dtype))
            return ch

        V = jnp.stack(chain(p, s + 1) + chain(r, s))
        G = ctx.gram(V)
        # basis consistency check: A V[j] vs V^T T[:, j] for ALL columns T
        # covers, measured in f64 on device
        errs = []
        for off, cols in blocks:
            for j in range(cols):
                av = ctx.matvec(H, V[off + j]).astype(jnp.float64)
                vt = jnp.einsum(
                    "i,in->n", T[:, off + j], V.astype(jnp.float64),
                    precision=lax.Precision.HIGHEST,
                )
                errs.append(
                    jnp.linalg.norm(av - vt) / jnp.linalg.norm(av)
                )
        p_hat = jnp.zeros(m, jnp.float64).at[0].set(1.0)
        r_hat = jnp.zeros(m, jnp.float64).at[o].set(1.0)
        x_hat = jnp.zeros(m, jnp.float64)
        rGr = G[o, o]
        alphas = []
        for _ in range(s):
            w = T @ p_hat
            alpha = rGr / (p_hat @ (G @ w))
            alphas.append(alpha)
            x_hat = x_hat + alpha * p_hat
            r_hat = r_hat - alpha * w
            rGr_new = r_hat @ (G @ r_hat)
            beta = rGr_new / rGr
            p_hat = r_hat + beta * p_hat
            rGr = rGr_new
        x_n = x + jnp.matmul(
            x_hat.astype(dtype), V, precision=lax.Precision.HIGHEST
        )
        r_true = b - ctx.matvec(H, x_n)
        # recurred residual of the coefficient algebra (should match r_true
        # up to basis conditioning x working precision)
        r_coef = jnp.sqrt(jnp.abs(rGr))
        return dict(
            chain_norms=jnp.linalg.norm(V.astype(jnp.float64), axis=1),
            gram_diag=jnp.diagonal(G),
            basis_consistency=jnp.stack(errs),
            alphas=jnp.stack(alphas),
            res_after_outer=jnp.linalg.norm(r_true.astype(jnp.float64))
            / jnp.linalg.norm(b.astype(jnp.float64)),
            res_recurred=r_coef / jnp.linalg.norm(b.astype(jnp.float64)),
        )

    out = {k: np.asarray(v).tolist() for k, v in one_outer(b).items()}
    out["backend"] = jax.default_backend()
    out["n"] = n
    print(json.dumps(out), flush=True)


def probe_outers(n, graded, s, outers=4, loop="unrolled"):
    """Run `outers` full cacg outer iterations with FIXED inputs/bounds,
    either unrolled inside one jit or as a lax.while_loop (the real
    kernel's form), printing the residual after each outer.  Separates
    'the algebra differs per outer' from 'the while_loop compilation
    differs' on a given backend."""
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from jax import lax
    from krylov_tpu.context import Context
    from krylov_tpu.solvers.cacg import _chebyshev_T
    from krylov_tpu.sparse.convert import to_hyb
    from krylov_tpu.sparse.fixtures import powerlaw_spd
    from krylov_tpu.sparse.formats import to_device

    kw = dict(shift=1e-3, diag_scale_decades=1.5) if graded else {}
    A_sp = powerlaw_spd(n, seed=42, **kw)
    dtype = np.float32
    H = to_device(to_hyb(A_sp, dtype=dtype))
    ctx = Context(scalar_dtype=jnp.float64)
    lmin, lmax = 0.0476, 1.6654
    d = 0.5 * (lmax + lmin)
    c = 0.5 * (lmax - lmin)
    m = 2 * s + 1
    o = s + 1
    blocks = ((0, s), (o, s - 1))
    T = jnp.asarray(_chebyshev_T(m, blocks, lmin, lmax), jnp.float64)
    b = jnp.asarray(
        np.random.default_rng(123).standard_normal(n).astype(dtype)
    )

    def chain(v0, length):
        ch = [v0]
        if length >= 2:
            ch.append(((ctx.matvec(H, v0) - d * v0) / c).astype(dtype))
        for _ in range(length - 2):
            nxt = (
                (2.0 / c) * (ctx.matvec(H, ch[-1]) - d * ch[-1]) - ch[-2]
            )
            ch.append(nxt.astype(dtype))
        return ch

    def outer(x, r, p):
        V = jnp.stack(chain(p, s + 1) + chain(r, s))
        G = ctx.gram(V)
        p_hat = jnp.zeros(m, jnp.float64).at[0].set(1.0)
        r_hat = jnp.zeros(m, jnp.float64).at[o].set(1.0)
        x_hat = jnp.zeros(m, jnp.float64)
        rGr = G[o, o]
        for _ in range(s):
            w = T @ p_hat
            alpha = rGr / (p_hat @ (G @ w))
            x_hat = x_hat + alpha * p_hat
            r_hat = r_hat - alpha * w
            rGr_new = r_hat @ (G @ r_hat)
            beta = rGr_new / rGr
            p_hat = r_hat + beta * p_hat
            rGr = rGr_new
        x_n = x + jnp.matmul(
            x_hat.astype(dtype), V, precision=lax.Precision.HIGHEST
        )
        p_n = jnp.matmul(
            p_hat.astype(dtype), V, precision=lax.Precision.HIGHEST
        )
        r_n = b - ctx.matvec(H, x_n)
        return x_n, r_n, p_n

    b_norm = jnp.linalg.norm(b.astype(jnp.float64))

    if loop == "unrolled":
        @jax.jit
        def run(b):
            x = jnp.zeros_like(b)
            r = b - ctx.matvec(H, x)
            p = r
            res = []
            for _ in range(outers):
                x, r, p = outer(x, r, p)
                res.append(
                    jnp.linalg.norm(r.astype(jnp.float64)) / b_norm
                )
            return jnp.stack(res)
    else:
        @jax.jit
        def run(b):
            x = jnp.zeros_like(b)
            r = b - ctx.matvec(H, x)
            p = r
            res0 = jnp.zeros(outers, jnp.float64)

            def body(st):
                x, r, p, i, res = st
                x, r, p = outer(x, r, p)
                res = res.at[i].set(
                    jnp.linalg.norm(r.astype(jnp.float64)) / b_norm
                )
                return (x, r, p, i + 1, res)

            def cond(st):
                return st[3] < outers

            st = lax.while_loop(
                cond, body, (x, r, p, jnp.zeros((), jnp.int32), res0)
            )
            return st[4]

    res = np.asarray(run(b))
    print(json.dumps({
        "backend": jax.default_backend(), "n": n, "s": s, "loop": loop,
        "residual_per_outer": [float(v) for v in res],
    }), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe", required=True,
                    choices=["numerics", "bounds", "solve", "dump", "outers"])
    ap.add_argument("--n", type=int, default=1 << 14)
    ap.add_argument("--graded", action="store_true")
    ap.add_argument("--s", type=int, default=8)
    ap.add_argument("--method", default="cacg")
    ap.add_argument("--bounds", type=float, nargs=2, default=None)
    ap.add_argument("--loop", default="unrolled",
                    choices=["unrolled", "while"])
    ap.add_argument("--dtype", default=None, choices=["float32", "float64"],
                    help="vector dtype override (default: f32 on tpu, f64 "
                         "on cpu) — lets a CPU run reproduce the TPU's f32 "
                         "vector numerics")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon sitecustomize "
                         "freezes JAX_PLATFORMS before scripts run; only "
                         "the config update works)")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    if args.probe == "numerics":
        probe_numerics()
    elif args.probe == "dump":
        probe_dump(args.n, args.graded, args.s)
    elif args.probe == "outers":
        probe_outers(args.n, args.graded, args.s, loop=args.loop)
    elif args.probe == "bounds":
        probe_bounds(args.n, args.graded)
    else:
        probe_solve(
            args.n, args.graded, args.s, args.method, args.bounds,
            dtype=np.dtype(args.dtype) if args.dtype else None,
        )
