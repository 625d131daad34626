"""Production pattern: a long solve as bounded dispatches + checkpointing.

Long single device executions are operationally fragile (a preemption or a
device fault mid-dispatch loses everything).  This example shows the two
fault-tolerance layers composing:

1. ``solve(chunk_iters=N)`` — the solve runs as N-iteration device
   dispatches.  For the while_loop solvers (cg/mrr/kskip*/adaptive) the full
   recurrence state is carried across chunks, so the iteration sequence is
   EXACTLY the unbroken solve's.
2. ``krylov_tpu.checkpoint`` — persist the iterate to disk between runs and
   warm-resume after a process loss (restarted-Krylov semantics across the
   process boundary).

The reference's host loops are implicitly "chunked" at every iteration
(reference: v3/cpu/cg.py:19-40) and have no persistence story; here both
knobs are explicit.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import krylov_tpu
from krylov_tpu import checkpoint
from krylov_tpu.sparse.fixtures import powerlaw_spd
from krylov_tpu.sparse.convert import to_hyb

# An ill-conditioned irregular system (graded diagonal, kappa ~ 1e5 at this
# size with float64 semantics; see sparse/fixtures.py).
n = 4096
A = to_hyb(powerlaw_spd(n, shift=1e-3, diag_scale_decades=1.5, seed=42))
rng = np.random.default_rng(0)
b = rng.standard_normal(n).astype(A.dtype)

# --- 1. chunked solve: identical iterations, bounded dispatches ----------
x_chunked, info = krylov_tpu.solve(
    A, b, method="cg", tol=1e-4, maxiter=8000, chunk_iters=128
)
print(
    f"chunked: converged={info['converged']} iterations={info['iterations']}"
    f" chunks={info['chunks']}"
)

x_plain, info_plain = krylov_tpu.solve(A, b, method="cg", tol=1e-4, maxiter=8000)
assert info_plain["iterations"] == info["iterations"], "exact carry"
print(f"matches unbroken solve: {info_plain['iterations']} iterations")

# --- 2. checkpoint mid-solve, then resume in a 'new process' -------------
with tempfile.TemporaryDirectory() as d:
    ckpt = os.path.join(d, "solve.npz")
    # First run gets preempted after 200 iterations:
    x_partial, info1 = krylov_tpu.solve(
        A, b, method="cg", tol=1e-4, maxiter=200, chunk_iters=128
    )
    checkpoint.save(ckpt, x_partial, info1, matrix="powerlaw_spd(4096)")
    # ...process dies, restarts, resumes from disk:
    x_resumed, info2 = checkpoint.resume(
        A, b, ckpt, method="cg", tol=1e-4, maxiter=8000, chunk_iters=128
    )
    total = info1["iterations"] + info2["iterations"]
    true_res = float(
        np.linalg.norm(b - np.asarray(A.matvec(x_resumed)))
        / np.linalg.norm(b)
    )
    print(
        f"resumed: converged={info2['converged']} after "
        f"{info1['iterations']}+{info2['iterations']}={total} iterations, "
        f"true residual {true_res:.2e} "
        f"(resumed_from={info2['resumed_from']['prior_iterations']})"
    )
