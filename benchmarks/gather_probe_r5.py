"""Round-5 multi-RHS gather layout probe (VERDICT r4 #4).

The blocked 8-RHS CG capture came in at only ~1.3x the host blocked CG,
far under the hoped-for index-stream amortization.  This probe measures
the candidate multi-RHS gather layouts at the REAL row-4 HYB shape
(idx (1M, 16), 8 RHS) as dependent fori_loop chains timed through a host
fetch (the only trustworthy completion signal on this backend):

  A  batch-trailing: X^T (n, 8); take(axis=0) -> (n, w, 8)   [current]
  B  batch-leading:  X (8, n);  take(axis=1) -> (8, n, w)
  C  per-lane map:   8 sequential single-RHS slice-gathers    [no amortization]
  S  single-RHS slice-gather (reference point, x1 work)

Run: PYTHONPATH=.:/root/.axon_site python benchmarks/gather_probe_r5.py
"""

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from krylov_tpu.sparse import formats
    from krylov_tpu.sparse.convert import to_hyb
    from krylov_tpu.sparse.fixtures import powerlaw_spd

    n = 1 << 20
    nrhs = 8
    reps = 10
    H = formats.to_device(to_hyb(powerlaw_spd(n, seed=42), dtype=np.float32))
    data, idx = H.ell_data, H.ell_indices
    rng = np.random.default_rng(int.from_bytes(os.urandom(8), "little"))

    def chain(step, x0):
        def body(_, x):
            y = step(x)
            # keep magnitudes bounded so the chain cannot overflow
            return y / 8.0

        return lax.fori_loop(0, reps, body, x0)

    def ell_A(X):  # X (nrhs, n) -> (nrhs, n), batch-trailing gather
        Xt = jnp.moveaxis(X, 0, -1)  # (n, nrhs)
        g = jnp.take(Xt, idx, axis=0)  # (n, w, nrhs)
        return jnp.moveaxis(jnp.sum(data[..., None] * g, axis=1), -1, 0)

    def ell_B(X):  # batch-leading gather
        g = jnp.take(X, idx, axis=1)  # (nrhs, n, w)
        return jnp.sum(data[None] * g, axis=-1)

    def ell_C(X):  # per-lane sequential single-RHS (no amortization)
        return lax.map(
            lambda x: jnp.sum(data * formats.gather_rows(x, idx), axis=1), X
        )

    def ell_S(x):  # single-RHS slice-gather
        return jnp.sum(data * formats.gather_rows(x, idx), axis=1)

    def hyb_vmapped(X):  # full HYB matvec incl. tail scatter, custom rules
        return jax.vmap(H.matvec)(X)

    def hyb_single(x):
        return H.matvec(x)

    out = {"backend": jax.default_backend(), "n": n, "nrhs": nrhs,
           "reps": reps, "w": int(H.width)}
    for name, fn, shape in (
        ("A_batch_trailing", ell_A, (nrhs, n)),
        ("B_batch_leading", ell_B, (nrhs, n)),
        ("C_per_lane_map", ell_C, (nrhs, n)),
        ("S_single_rhs", ell_S, (n,)),
        ("H_vmapped_full", hyb_vmapped, (nrhs, n)),
        ("H_single_full", hyb_single, (n,)),
    ):
        f = jax.jit(lambda x0, fn=fn: jnp.sum(chain(fn, x0)))
        x0 = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        try:
            float(np.asarray(f(x0)))  # compile + first-exec warmup
            best = float("inf")
            for _ in range(2):
                x1 = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
                jax.block_until_ready(x1)
                t0 = time.perf_counter()
                float(np.asarray(f(x1)))
                best = min(best, time.perf_counter() - t0)
            out[name + "_s_per_spmv"] = round(best / reps, 5)
        except Exception as e:
            out[name + "_error"] = f"{type(e).__name__}: {e}"[:200]
    if "S_single_rhs_s_per_spmv" in out:
        s = out["S_single_rhs_s_per_spmv"]
        for k in ("A_batch_trailing", "B_batch_leading", "C_per_lane_map"):
            if k + "_s_per_spmv" in out:
                out[k + "_vs_8x_single"] = round(
                    (8 * s) / out[k + "_s_per_spmv"], 2
                )
    if (
        "H_single_full_s_per_spmv" in out
        and "H_vmapped_full_s_per_spmv" in out
    ):
        out["H_vmapped_vs_8x_single"] = round(
            8 * out["H_single_full_s_per_spmv"]
            / out["H_vmapped_full_s_per_spmv"], 2
        )
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
