"""Solve checkpointing: persist and resume iterative solves.

The reference's only "checkpoint" is the adaptive solver's in-memory
``pre_x`` rollback copy (reference: v3/cpu/adaptivekskipmrr.py:69); nothing
survives the process.  For production long-running solves this module
persists the iterate and solve metadata to disk (.npz) so a solve can be
resumed after preemption — standard restarted-Krylov semantics: the resumed
solve warm-starts from the checkpointed iterate (the Krylov space is rebuilt,
conjugacy is not carried across restarts).
"""

from __future__ import annotations

import json
import time
from typing import Optional, Tuple

import numpy as np


def save(path: str, x, info: Optional[dict] = None, **metadata) -> None:
    """Persist the iterate ``x`` (+ solve info / user metadata) to ``path``."""
    payload = {"x": np.asarray(x)}
    meta = {"saved_at": time.time(), **metadata}
    if info is not None:
        payload["residual"] = np.asarray(info.get("residual", []))
        payload["nosl"] = np.asarray(info.get("nosl", []))
        if "khistory" in info:
            payload["khistory"] = np.asarray(info["khistory"])
        meta["iterations"] = int(info.get("iterations", 0))
        meta["converged"] = bool(info.get("converged", False))
    payload["meta_json"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    )
    np.savez(path, **payload)


def load(path: str) -> Tuple[np.ndarray, dict]:
    """Load a checkpoint -> (x, state) where state has residual/nosl/meta."""
    with np.load(path) as z:
        x = z["x"]
        state = {}
        for key in ("residual", "nosl", "khistory"):
            if key in z:
                state[key] = z[key]
        if "meta_json" in z:
            state["meta"] = json.loads(bytes(z["meta_json"].tobytes()).decode())
    return x, state


def resume(A, b, path: str, **solve_kwargs):
    """Resume a checkpointed solve: warm-start from the saved iterate.

    Returns ``(x, info)`` like :func:`krylov_tpu.solve`; ``info`` gains a
    ``resumed_from`` entry with the checkpoint's prior iteration count.
    """
    from krylov_tpu.api import solve

    x_ckpt, state = load(path)
    x, info = solve(A, b, x0=x_ckpt, **solve_kwargs)
    info["resumed_from"] = {
        "path": path,
        "prior_iterations": state.get("meta", {}).get("iterations", None),
    }
    return x, info
