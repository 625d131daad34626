"""Profiling hooks: device-level traces and phase micro-timing.

The reference's instrumentation is wall-clock around the whole loop plus a
single hand-rolled basis-phase timer (reference: v1/processes/common.py:21-26,
returned as ``krylov_base_times`` at v1/processes/adaptivekskipmrr.py:381).
On TPU the idiomatic equivalents are:

- :func:`trace_solve` — wrap a solve in a ``jax.profiler`` trace; the
  resulting TensorBoard/Perfetto trace attributes time to every fused
  kernel, collective, and transfer (far beyond the reference's one timer).
- :func:`phase_times` — coarse host-side phase timing (setup / solve /
  fetch) for quick regressions without a trace viewer.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Context manager: capture a device profile into ``log_dir``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def trace_solve(A, b, log_dir: str, **solve_kwargs):
    """Run ``krylov_tpu.solve`` under a profiler trace; returns (x, info)."""
    from krylov_tpu.api import solve

    with trace(log_dir):
        out = solve(A, b, **solve_kwargs)
    return out


def phase_times(A, b, **solve_kwargs) -> dict:
    """Host-side phase breakdown: compile (first call), solve (device
    completion, second call), fetch (host materialization)."""
    import numpy as np

    from krylov_tpu.api import solve_device

    t0 = time.perf_counter()
    res = solve_device(A, b, **solve_kwargs)
    jax.block_until_ready(res)
    compile_and_first = time.perf_counter() - t0

    t0 = time.perf_counter()
    res = solve_device(A, b, **solve_kwargs)
    jax.block_until_ready(res)
    solve_t = time.perf_counter() - t0

    t0 = time.perf_counter()
    np.asarray(res.x)
    np.asarray(res.residual_trace)
    fetch_t = time.perf_counter() - t0

    return {
        "compile_plus_first_solve_s": compile_and_first,
        "solve_s": solve_t,
        "fetch_s": fetch_t,
        "iterations": int(res.iterations),
        "converged": bool(res.converged),
    }
