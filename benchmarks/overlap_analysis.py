"""Verify (don't assume) the halo-exchange design: wire bytes + overlap.

The reference rebuilds the FULL iterate vector on every rank after each SpMV
(``comm.Allgather``, reference: v3/cpu/mpi/common.py:39-43).  This library's
sharded stencil/DIA SpMV instead ``ppermute``s only the boundary strips
(krylov_tpu/dist/spmv.py), and *orders* the transfers before the interior
compute so the compiler can overlap them.  This harness checks what the
compiler ACTUALLY emits, from the compiled HLO itself:

1. **Wire bytes per SpMV** — every collective instruction in the compiled
   module is extracted with its operand shape; bytes are computed from the
   shapes, not from analytic hand-counts, for both the halo strategy and the
   reference-design allgather strategy.

2. **Async overlap** — on TPU targets XLA splits overlappable collectives
   into ``collective-permute-start`` / ``-done`` pairs and hoists compute
   between them; the harness compiles the sharded solve AOT against an
   8-chip v5e topology (no hardware needed — PJRT compile-only) and reports,
   for each start/done pair, how many vector-compute instructions the
   scheduler placed inside the in-flight window.

3. **Wall-clock sanity** on the host-platform 8-device mesh: halo vs forced
   allgather on the same operator (inter-device copies cost there too).

4. **Multi-host / DCN structure** (``--dcn-topology``) — the sharded
   ADAPTIVE solve is AOT-compiled against a 2-slice v5e:2x4 topology (16
   chips, 4 hosts, two ICI domains joined by DCN — compile-only, no
   hardware).  On such a target XLA lowers cross-slice transfers to
   megascale ``send``/``recv`` host-transfer pairs while intra-slice
   boundaries stay ``collective-permute`` on ICI.  The harness separates
   the two and reports payload bytes for each: the halo design ships ONE
   boundary strip (grid-row bytes, constant in N/devices) across the DCN
   seam per SpMV, where the reference design allgathers the full iterate
   vector through every seam (reference: v3/cpu/mpi/common.py:39-43).

Usage:
  JAX_PLATFORMS=cpu python benchmarks/overlap_analysis.py          # 1 + 3
  python benchmarks/overlap_analysis.py --tpu-topology             # adds 2
  python benchmarks/overlap_analysis.py --dcn-topology             # adds 4
"""

import argparse
import dataclasses
import json
import os
import re
import sys
import time

if os.environ.get("JAX_PLATFORMS") == "cpu":
    if "--xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""
    ):
        env = dict(os.environ)
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        )
        os.execve(sys.executable, [sys.executable] + sys.argv, env)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

from jax.sharding import Mesh, PartitionSpec as P

from krylov_tpu.context import Context
from krylov_tpu.dist.solve import _build
from krylov_tpu.dist.spmv import shard_operator
from krylov_tpu.sparse.fixtures import laplace2d

_DTYPE_BYTES = {"f32": 4, "f64": 8, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                "pred": 1, "s8": 1, "u8": 1}

_SHAPE_RE = re.compile(r"(f32|f64|bf16|f16|s32|u32|pred|s8|u8)\[([\d,]*)\]")

_KIND_RE = re.compile(
    r"\b(all-reduce|all-gather|collective-permute|reduce-scatter|all-to-all)"
    r"(-start|-done)?\("
)


def _shape_bytes(type_str):
    total = 0
    for dt, dims in _SHAPE_RE.findall(type_str):
        elems = 1
        for d in dims.split(","):
            if d:
                elems *= int(d)
        total += elems * _DTYPE_BYTES[dt]
    return total


_MEGASCALE_RE = re.compile(r"=\s*(.*?)\b(send|recv)\(")


def dcn_transfers_in(hlo_text):
    """[(kind, payload_bytes)] for megascale (cross-slice DCN) send/recv.

    On multislice targets XLA lowers cross-slice collective-permute edges to
    host-transfer ``send``/``recv`` pairs handled by the megascale runtime
    (frontend attribute ``xla_megascale_runtime``); payload is read from the
    transferred buffer's shape."""
    out = []
    for ln in hlo_text.splitlines():
        if "xla_megascale_runtime" not in ln:
            continue
        m = _MEGASCALE_RE.search(ln)
        if not m:
            continue
        out.append((f"dcn_{m.group(2)}", _shape_bytes(m.group(1))))
    return out


def collectives_in(hlo_text):
    """[(name, kind, phase, payload_bytes)] for every collective instr.

    Handles both sync form (``%x = f32[...] all-reduce(...)``) and the TPU
    async form whose ``-start`` result is a tuple with layout annotations;
    payload is counted from the result type — at the ``-done`` for async
    pairs (the single received buffer), at the instruction itself otherwise.
    """
    out = []
    for ln in hlo_text.splitlines():
        m = re.match(r"\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(.*)$", ln)
        if not m:
            continue
        name, rest = m.groups()
        km = _KIND_RE.search(rest)
        if not km:
            continue
        kind, phase = km.group(1), km.group(2) or ""
        if phase == "-start":
            continue  # payload counted at the matching -done
        out.append((name, kind, phase, _shape_bytes(rest[: km.start()])))
    return out


def summarize(hlo_text):
    cols = collectives_in(hlo_text)
    by_kind = {}
    for _, kind, _, b in cols:
        cnt, tot = by_kind.get(kind, (0, 0))
        by_kind[kind] = (cnt + 1, tot + b)
    return {
        k: {"count": c, "payload_bytes": t} for k, (c, t) in by_kind.items()
    }


def overlap_windows(hlo_text):
    """For each collective-permute -start/-done pair, what the scheduler
    placed inside the in-flight window (the HLO module is printed in
    scheduled order for TPU targets).  ``compute_in_flight`` counts
    fusion/elementwise/dot instructions overlapped with the transfer;
    ``cycles_in_flight`` sums their backend-estimated cycles."""
    lines = hlo_text.splitlines()
    open_starts = {}
    windows = []
    for i, ln in enumerate(lines):
        ms = re.match(
            r"\s*%?([\w.\-]+)\s*=.*collective-permute-start\(", ln
        )
        if ms:
            open_starts[ms.group(1)] = i
            continue
        md = re.search(r"collective-permute-done\(%?([\w.\-]+)\)", ln)
        if md and md.group(1) in open_starts:
            i0 = open_starts.pop(md.group(1))
            body = lines[i0 + 1 : i]
            compute = [
                l
                for l in body
                if re.search(
                    r"= \S+ (fusion|multiply|add|subtract|divide|dot|convolution)\(",
                    l,
                )
            ]
            cycles = sum(
                int(c)
                for l in compute
                for c in re.findall(r'"estimated_cycles":"(\d+)"', l)
            )
            windows.append(
                {
                    "instructions_in_flight": len(body),
                    "compute_in_flight": len(compute),
                    "cycles_in_flight": cycles,
                }
            )
    return windows


def _specs_as(op, op_specs, strategy):
    return (
        dataclasses.replace(op, strategy=strategy),
        dataclasses.replace(op_specs, strategy=strategy),
    )


def build_and_lower(mesh, A, maxiter=500, method="mrr", strategy=None, k=0,
                    sb=None):
    (axis,) = mesh.axis_names
    n_dev = mesh.devices.size
    op, op_specs = shard_operator(A, n_dev, axis=axis)
    if strategy == "allgather" and op.kind in ("dia", "stencil"):
        if op.kind == "stencil":
            # allgather strategy is defined on the flat-DIA form
            op, op_specs = shard_operator(A.to_dia(), n_dev, axis=axis)
        op, op_specs = _specs_as(op, op_specs, "allgather")
    ctx = Context(axis=axis)
    fn = _build(
        mesh, axis, method, maxiter, k, ctx, op_specs, None,
        method == "adaptivekskipmrr", sb=sb,
    )
    n = A.shape[0]
    b = jax.ShapeDtypeStruct((n,), A.dtype)
    tol = jax.ShapeDtypeStruct((), A.dtype)
    return fn.lower(op, b, b, tol), op


def analyze_mesh(mesh, A, emit, label, method="mrr", k=0, dcn=False,
                 sb=None):
    for strategy in ("halo", "allgather"):
        lowered, op = build_and_lower(
            mesh, A, strategy=strategy, method=method, k=k, sb=sb
        )
        hlo = lowered.compile().as_text()
        summary = summarize(hlo)
        windows = overlap_windows(hlo)
        payload = dict(
            analysis=label,
            method=method,
            strategy=strategy if op.strategy == strategy else op.strategy,
            n=A.shape[0],
            devices=int(mesh.devices.size),
            collectives=summary,
            async_permute_windows=windows if windows else None,
        )
        if dcn:
            dt = dcn_transfers_in(hlo)
            by = {}
            for kind, b in dt:
                cnt, tot = by.get(kind, (0, 0))
                by[kind] = (cnt + 1, tot + b)
            payload["dcn_transfers"] = {
                kk: {"count": c, "payload_bytes": t}
                for kk, (c, t) in by.items()
            }
            # per-seam halo payload: one grid row of the 2-D operator
            payload["halo_strip_bytes"] = (
                int(np.sqrt(A.shape[0])) * np.dtype(A.dtype).itemsize
            )
            payload["reference_allgather_bytes_full_vector"] = (
                A.shape[0] * np.dtype(A.dtype).itemsize
            )
        emit(payload)


def wallclock_cpu_mesh(mesh, A, emit, repeats=3):
    """Halo vs forced-allgather wall time for 200 SpMV applications."""
    from jax import lax

    (axis,) = mesh.axis_names
    n_dev = mesh.devices.size
    n = A.shape[0]
    results = {}
    for strategy in ("halo", "allgather"):
        op, op_specs = shard_operator(A, n_dev, axis=axis)
        if strategy == "allgather":
            op, op_specs = _specs_as(op, op_specs, "allgather")
        ctx = Context(axis=axis)

        def local(op, v):
            return lax.fori_loop(
                0, 200, lambda i, u: op.matvec(u, ctx) / 8.0, v
            )

        fn = jax.jit(
            jax.shard_map(
                local, mesh=mesh, in_specs=(op_specs, P(axis)), out_specs=P(axis)
            )
        )
        rng = np.random.default_rng(0)
        v = jnp.asarray(rng.standard_normal(n).astype(A.dtype))
        jax.block_until_ready(fn(op, v))
        best = float("inf")
        for _ in range(repeats):
            v = jnp.asarray(rng.standard_normal(n).astype(A.dtype))
            t0 = time.perf_counter()
            jax.block_until_ready(fn(op, v))
            best = min(best, time.perf_counter() - t0)
        results[strategy] = best
    emit(
        dict(
            analysis="wallclock_200_spmv",
            backend=jax.default_backend(),
            n=n,
            devices=int(mesh.devices.size),
            halo_s=round(results["halo"], 4),
            allgather_s=round(results["allgather"], 4),
            halo_speedup_x=round(results["allgather"] / results["halo"], 2),
        )
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu-topology", action="store_true",
                    help="AOT-compile against an 8-chip v5e topology")
    ap.add_argument("--dcn-topology", action="store_true",
                    help="AOT-compile the adaptive solve against a 2-slice "
                         "(DCN-joined) v5e topology, 16 chips / 4 hosts")
    ap.add_argument("--nx", type=int, default=1024)
    args = ap.parse_args()

    def emit(payload):
        print(json.dumps(payload), flush=True)

    dtype = np.float32
    A = laplace2d(args.nx, dtype=dtype)

    if args.dcn_topology:
        from jax.experimental import topologies

        topo = topologies.get_topology_desc(
            platform="tpu", topology_name="v5e:2x4", num_slices=2
        )
        # order the row axis so exactly one halo boundary crosses the
        # slice (DCN) seam: slice-major device order
        devs = sorted(
            topo.devices, key=lambda d: (d.slice_index, d.process_index, d.id)
        )
        mesh = Mesh(np.array(devs), ("rows",))
        analyze_mesh(
            mesh, A, emit, "tpu_v5e_2x4_x2slices_dcn_aot",
            method="adaptivekskipmrr", k=4, dcn=True,
        )
        # Chebyshev-basis CA family across the DCN seam (round 5): the
        # one-Gram-psum-per-s-steps structure must survive the 2-slice
        # lowering (static bounds — no Lanczos run in an AOT compile).
        analyze_mesh(
            mesh, A, emit, "tpu_v5e_2x4_x2slices_dcn_aot",
            method="cacg", k=8, dcn=True, sb=(0.05, 8.0),
        )
        return
    if args.tpu_topology:
        from jax.experimental import topologies

        topo = topologies.get_topology_desc(
            platform="tpu", topology_name="v5e:2x4"
        )
        mesh = Mesh(np.array(topo.devices), ("rows",))
        analyze_mesh(mesh, A, emit, "tpu_v5e_2x4_aot")
    else:
        n_dev = jax.device_count()
        if n_dev < 2:
            print("need >=2 devices (JAX_PLATFORMS=cpu re-exec)", file=sys.stderr)
            return
        mesh = Mesh(np.array(jax.devices()), ("rows",))
        analyze_mesh(mesh, A, emit, f"{jax.default_backend()}_mesh")
        wallclock_cpu_mesh(mesh, A, emit)


if __name__ == "__main__":
    main()
