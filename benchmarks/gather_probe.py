"""Ground-truth microbenchmarks for irregular-gather SpMV formulations on TPU.

Round-2 left the HYB matvec on XLA's native gather with a rationale that
hand-written Mosaic gather "cannot beat XLA's tuned gather lowering"
(sparse/formats.py docstring).  Round-3 ground truth (fixed-iteration CG on a
2^20-row HybMatrix) measured ~187 ms per iteration -- ~85 Mnnz/s, three
orders of magnitude off the stencil path -- and long solves at that rate
trigger remote-device faults.  Standalone single-dispatch timings through the
axon tunnel are unreliable (result cache + RPC overhead), so every number
here comes from a *dependent chain*: an N-step fori_loop whose step feeds the
previous output back in, timed at two different step counts; the slope is the
per-op cost.  Inputs are freshly randomized per call to defeat the backend
result cache.

Formulations probed:
  flat      - y[i] = sum_s data[i,s] * x[idx[i,s]]   (current HYB ELL block)
  sorted    - same, but idx sorted ascending within each row at build time
  rowmajor  - gather of x[idx.ravel()] reshaped      (1-D flat index vector)
  lane      - lane-binned 2-D gather: out[i,l] = x2d[sub[i,l], l] via
              jnp.take_along_axis(x2d, sub, axis=0); maps to the TPU's
              native sublane-per-lane dynamic-gather IF Mosaic/XLA picks it
  onehotseg - per-128-column-block one-hot matmul (MXU burn, no gather)
  scatter   - tail scatter-add (y.at[rows].add(vals))

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/gather_probe.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def chain_cost(fn, make_args, lo=4, hi=20, reps=3):
    """Per-step cost of fn's inner loop via two-point slope, min over reps."""
    f_lo = jax.jit(lambda *a: fn(lo, *a))
    f_hi = jax.jit(lambda *a: fn(hi, *a))
    # compile both
    a = make_args()
    jax.block_until_ready(f_lo(*a))
    jax.block_until_ready(f_hi(*a))
    best = np.inf
    for _ in range(reps):
        a = make_args()
        t0 = time.perf_counter()
        jax.block_until_ready(f_lo(*a))
        t_lo = time.perf_counter() - t0
        a = make_args()
        t0 = time.perf_counter()
        jax.block_until_ready(f_hi(*a))
        t_hi = time.perf_counter() - t0
        best = min(best, (t_hi - t_lo) / (hi - lo))
    return best


def main():
    n = 1 << 20
    w = 16
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} n={n} w={w} gathered={n*w/1e6:.1f}M")

    idx_np = rng.integers(0, n, size=(n, w), dtype=np.int32)
    data_np = rng.standard_normal((n, w), dtype=np.float32)
    idx = jnp.asarray(idx_np)
    idx_sorted = jnp.asarray(np.sort(idx_np, axis=1))
    data = jnp.asarray(data_np)

    def fresh_x():
        return (jnp.asarray(rng.standard_normal(n, dtype=np.float32)),)

    def norm_step(y):
        return y / (jnp.linalg.norm(y) + 1.0)

    def flat(iters, x):
        def body(_, x):
            return norm_step(jnp.sum(data * jnp.take(x, idx, axis=0), axis=1))
        return jax.lax.fori_loop(0, iters, body, x)

    def sorted_(iters, x):
        def body(_, x):
            return norm_step(
                jnp.sum(data * jnp.take(x, idx_sorted, axis=0), axis=1)
            )
        return jax.lax.fori_loop(0, iters, body, x)

    flat_idx = jnp.asarray(idx_np.ravel())

    def rowmajor(iters, x):
        def body(_, x):
            g = jnp.take(x, flat_idx, axis=0).reshape(n, w)
            return norm_step(jnp.sum(data * g, axis=1))
        return jax.lax.fori_loop(0, iters, body, x)

    # lane-binned: table x2d[s, l] = x[s*128 + l]; an entry with column c
    # lives at lane c % 128, sublane c // 128.  Workload: same 16M gathered
    # elements, shaped (n*w/128, 128).
    m = n * w // 128
    sub_np = rng.integers(0, n // 128, size=(m, 128), dtype=np.int32)
    sub = jnp.asarray(sub_np)
    lane_data = jnp.asarray(rng.standard_normal((m, 128), dtype=np.float32))

    def lane(iters, x):
        def body(_, x):
            x2d = x.reshape(n // 128, 128)
            g = jnp.take_along_axis(x2d, sub, axis=0)  # (m, 128)
            y = (lane_data * g).reshape(n // 128, 128 * w)
            y = y[:, :128] + y[:, 128 : 2 * 128]  # cheap fold, keep chain
            return norm_step(y.reshape(-1))
        return jax.lax.fori_loop(0, iters, body, x)

    t_rows = rng.integers(0, n, size=(n // 64,), dtype=np.int32)
    t_rows = jnp.asarray(t_rows)
    t_vals = jnp.asarray(
        rng.standard_normal((n // 64,), dtype=np.float32)
    )

    def scatter(iters, x):
        def body(_, x):
            return norm_step(x.at[t_rows].add(t_vals * x[: n // 64]))
        return jax.lax.fori_loop(0, iters, body, x)

    for name, fn in [
        ("flat", flat),
        ("sorted", sorted_),
        ("rowmajor", rowmajor),
        ("lane", lane),
        ("scatter", scatter),
    ]:
        try:
            c = chain_cost(fn, fresh_x)
            gps = n * w / c / 1e9 if name != "scatter" else (n // 64) / c / 1e9
            print(f"{name:10s} {c*1e3:10.3f} ms/step   {gps:8.2f} Gelem/s")
        except Exception as e:  # noqa: BLE001
            print(f"{name:10s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
