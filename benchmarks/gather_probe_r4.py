"""Round-4 irregular-gather experiments: locate the row-4 solve-rate gap.

Round-3 captured 0.093 Gnnz/s on the 1M-row HYB CG solve, but the raw
element-gather rate measured ~0.30 Gelem/s and the slice-gather ~2.6x that
— so the solve is several times slower than its gather bound.  This probe
measures, with fetch-verified dependent-chain timing (block_until_ready is
not a completion barrier on the tunnel backend — see bench.py):

  ell        - the ELL block gather+multiply+rowsum alone (25.5M-slot op)
  tail       - the tail gather + scatter-add alone
  matvec     - the full HybMatrix.matvec
  cgiter     - matvec + the CG vector algebra (the real per-iteration cost)
  constperm  - a gather whose indices are COMPILE-TIME CONSTANTS, vs the
               same gather with runtime indices: does XLA specialize?
               (If yes, the sort-order/static-permutation pipeline becomes
               viable: all dynamic rearrangement replaced by one constant
               permutation.)
  wt8        - full matvec with tail_width=8 conversion (19.2M slots vs
               25.5M at wt=32: fewer gathers, 3.5x more scatter rows)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/gather_probe_r4.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def chain_cost(make_fn, fresh, lo=2, hi=8, reps=2):
    """Per-step cost via two-point slope; each timed call ends in a host
    fetch of a scalar reduction of the result (completion barrier)."""
    f_lo, f_hi = jax.jit(make_fn(lo)), jax.jit(make_fn(hi))
    x = fresh()
    float(np.asarray(f_lo(x)))
    float(np.asarray(f_hi(x)))
    best = np.inf
    for _ in range(reps):
        x = fresh()
        t0 = time.perf_counter()
        float(np.asarray(f_lo(x)))
        t_lo = time.perf_counter() - t0
        x = fresh()
        t0 = time.perf_counter()
        float(np.asarray(f_hi(x)))
        t_hi = time.perf_counter() - t0
        best = min(best, (t_hi - t_lo) / (hi - lo))
    return best


def main():
    from krylov_tpu.sparse.convert import to_hyb
    from krylov_tpu.sparse.fixtures import powerlaw_spd
    from krylov_tpu.sparse.formats import gather_rows, to_device

    n = 1 << 20
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} n={n}", flush=True)

    A_sp = powerlaw_spd(n, seed=42)
    H = to_device(to_hyb(A_sp, dtype=np.float32))
    H8 = to_device(to_hyb(A_sp, dtype=np.float32, tail_width=8))
    print(
        f"wt32: ell_w={H.width} slots={H.stored_entries/1e6:.1f}M "
        f"tail_chunks={H.tail_data.shape[0]}",
        flush=True,
    )
    print(
        f"wt8:  ell_w={H8.width} slots={H8.stored_entries/1e6:.1f}M "
        f"tail_chunks={H8.tail_data.shape[0]}",
        flush=True,
    )

    def fresh():
        return jnp.asarray(rng.standard_normal(n).astype(np.float32))

    def norm_step(y):
        return y / (jnp.linalg.norm(y) + 1.0)

    def mk_chain(body):
        def make(iters):
            def f(x):
                def step(_, x):
                    return norm_step(body(x))

                out = jax.lax.fori_loop(0, iters, step, x)
                return jnp.sum(out)

            return f

        return make

    rows = []

    def probe(name, body, elems):
        try:
            c = chain_cost(mk_chain(body), fresh)
            rows.append((name, c, elems))
            print(
                f"{name:10s} {c*1e3:9.2f} ms/step "
                f"{elems/c/1e9:7.2f} Gelem/s",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"{name:10s} FAILED: {type(e).__name__}: {e}", flush=True)

    ell_elems = H.ell_data.size
    tail_elems = H.tail_data.size

    probe(
        "ell",
        lambda x: jnp.sum(H.ell_data * gather_rows(x, H.ell_indices), axis=1),
        ell_elems,
    )
    probe(
        "tail",
        lambda x: x.at[H.tail_rows].add(
            jnp.sum(H.tail_data * gather_rows(x, H.tail_indices), axis=1)
        ),
        tail_elems,
    )
    probe("matvec", lambda x: H.matvec(x), H.stored_entries)
    probe("matvec_w8", lambda x: H8.matvec(x), H8.stored_entries)

    # CG iteration: matvec + 2 dots + 3 axpys (dependent chain on x)
    d = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    def cgiter(x):
        v = H.matvec(x)
        sigma = jnp.vdot(x, v)
        alpha = jnp.float32(1.0) / (sigma + 1.0)
        y = x + alpha * v
        g = jnp.vdot(y, y)
        return y + (g / (g + 1.0)) * d

    probe("cgiter", cgiter, H.stored_entries)

    # constant-index vs runtime-index gather at reduced size (constants are
    # baked into the executable; 2^18*16 idx = 16 MB literal)
    m = 1 << 18
    w = 16
    idx_small = rng.integers(0, n, size=(m, w), dtype=np.int32)
    data_small = jnp.asarray(rng.standard_normal((m, w)).astype(np.float32))
    idx_const = idx_small  # numpy closure -> XLA constant
    idx_dyn = jnp.asarray(idx_small)

    probe(
        "dyn_take",
        lambda x: jnp.pad(
            jnp.sum(data_small * jnp.take(x, idx_dyn, axis=0), axis=1),
            (0, n - m),
        ),
        m * w,
    )
    probe(
        "const_take",
        lambda x: jnp.pad(
            jnp.sum(data_small * jnp.take(x, idx_const, axis=0), axis=1),
            (0, n - m),
        ),
        m * w,
    )


if __name__ == "__main__":
    main()
