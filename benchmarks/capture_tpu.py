"""Retry-resilient TPU capture of the BASELINE rows.

Round-2 lost the row-4/row-5 solve numbers to a single remote-TPU device
fault that killed the whole measurement process (VERDICT r2 #1).  This
driver runs each requested row of :mod:`benchmarks.baseline_configs` in its
OWN subprocess so a fault costs one row one attempt, retries each row up to
``--attempts`` times with backoff, and appends every successful JSON row to
``benchmarks/captured_rows.jsonl`` incrementally — a later crash can never
erase an earlier capture.

Usage (TPU):
    python benchmarks/capture_tpu.py --rows 4 5
Usage (CPU sanity):
    JAX_PLATFORMS=cpu python benchmarks/capture_tpu.py --rows 1
"""

import argparse
import json
import math
import os
import subprocess
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
_OUT = os.path.join(_HERE, "captured_rows.jsonl")


def _finite(obj):
    """Strict-JSON sanitizer: non-finite floats become strings
    (json.dumps would otherwise emit bare NaN/Infinity tokens that jq,
    JSON.parse and other strict consumers reject)."""
    if isinstance(obj, dict):
        return {k: _finite(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_finite(v) for v in obj]
    if isinstance(obj, float) and not math.isfinite(obj):
        return repr(obj)
    return obj


def run_row(row: str, timeout_s: int, only=()) -> list[dict]:
    proc = subprocess.run(
        [sys.executable, os.path.join(_HERE, "baseline_configs.py"),
         "--rows", str(row)] + (["--only", *only] if only else []),
        capture_output=True,
        text=True,
        timeout=timeout_s,
        cwd=os.path.dirname(_HERE),
    )
    rows = []
    for line in proc.stdout.splitlines():
        if line.startswith("{"):
            try:
                rows.append(json.loads(line))
            except json.JSONDecodeError:
                pass
    if proc.returncode != 0:
        raise RuntimeError(
            f"row {row} process exited {proc.returncode}:\n"
            + proc.stderr[-2000:]
        )
    errors = [r for r in rows if "error" in r]
    if errors:
        raise RuntimeError(f"row {row} emitted error: {errors[0]['error']}")
    if not rows:
        raise RuntimeError(f"row {row} emitted nothing")
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", nargs="+", default=["2", "3", "4", "5"])
    ap.add_argument("--attempts", type=int, default=3)
    ap.add_argument("--timeout", type=int, default=2700,
                    help="per-attempt subprocess timeout (s)")
    ap.add_argument("--only", nargs="+", default=(),
                    help="row-4/4b solver-tag filter (substring match), "
                         "forwarded to baseline_configs --only")
    args = ap.parse_args()

    captured, failed = [], []
    for row in args.rows:
        for attempt in range(1, args.attempts + 1):
            t0 = time.perf_counter()
            try:
                rows = run_row(row, args.timeout, only=args.only)
            except Exception as e:
                dt = time.perf_counter() - t0
                print(
                    f"[capture] row {row} attempt {attempt}/{args.attempts} "
                    f"FAILED after {dt:.0f}s: {e}",
                    file=sys.stderr, flush=True,
                )
                if attempt < args.attempts:
                    time.sleep(10 * attempt)  # let a faulted device recover
                continue
            dt = time.perf_counter() - t0
            stamp = {"captured_attempt": attempt, "captured_wall_s": round(dt, 1)}
            with open(_OUT, "a") as f:
                for r in rows:
                    rec = _finite({**r, **stamp})
                    f.write(json.dumps(rec) + "\n")
                    print(json.dumps(rec), flush=True)
            captured.append(row)
            break
        else:
            failed.append(row)

    print(
        f"[capture] done: captured rows {captured}, failed rows {failed}",
        file=sys.stderr, flush=True,
    )
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
