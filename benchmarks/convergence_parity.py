"""Convergence-vs-reference harness: run every algorithm on the BASELINE
fixtures and compare residual histories against the reference implementations
(requires the reference mount at /root/reference; falls back to printing our
histories alone).

Usage:  JAX_PLATFORMS=cpu python benchmarks/convergence_parity.py
"""

import contextlib
import io
import os
import sys

import numpy as np

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)

import krylov_tpu
from krylov_tpu.sparse.fixtures import laplace2d, poisson1d

REF = "/root/reference"


def load_reference():
    if not os.path.isdir(os.path.join(REF, "v3")):
        return None
    if not hasattr(np, "int"):
        np.int = int
    sys.path.insert(0, os.path.dirname(REF))
    import importlib

    mods = {}
    for name in ["cg", "mrr", "kskipcg", "kskipmrr", "adaptivekskipmrr"]:
        mods[name] = getattr(
            importlib.import_module(f"reference.v3.cpu.{name}"), name
        )
    return mods


def main():
    ref = load_reference()
    cases = [
        ("cg", poisson1d(10_000), {}, 1e-8),  # BASELINE config 1
        ("mrr", laplace2d(64), {}, 1e-8),
        ("kskipcg", laplace2d(64), {"k": 4}, 1e-8),  # BASELINE config 3
        ("kskipmrr", laplace2d(64), {"k": 2}, 1e-8),
        ("adaptivekskipmrr", laplace2d(64), {"k": 3}, 1e-8),
    ]
    rng = np.random.default_rng(0)
    for method, A, kw, tol in cases:
        n = A.shape[0]
        b = rng.standard_normal(n)
        x, info = krylov_tpu.solve(A, b, method=method, tol=tol, maxiter=3 * n, **kw)
        line = (
            f"{method:18s} N={n:>7} iters={info['iterations']:>6} "
            f"conv={str(info['converged']):5s} final={info['residual'][-1]:.3e}"
        )
        if ref is not None and n <= 20_000:
            dense = A.todense()
            with contextlib.redirect_stdout(io.StringIO()):
                x_r, info_r = ref[method](dense, b.copy(), tol=tol, maxiter=3 * n, **kw)
            ours = np.asarray(info["residual"])
            theirs = np.asarray(info_r["residual"])
            m = min(len(ours), len(theirs))
            dev = float(
                np.nanmax(
                    np.abs(ours[:m] - theirs[:m]) / np.maximum(np.abs(theirs[:m]), 1e-300)
                )
            )
            line += f"  | ref iters={len(theirs)-1:>6} max_hist_rel_dev={dev:.2e}"
        print(line)


if __name__ == "__main__":
    main()
