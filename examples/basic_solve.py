"""Basic usage: solve SPD systems with every method, reference-style report.

    python examples/basic_solve.py
"""

import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import krylov_tpu
from krylov_tpu.sparse.fixtures import laplace2d

A = laplace2d(64, dtype=np.float32)  # 2-D 5-point Laplacian, N=4096
rng = np.random.default_rng(0)
b = rng.standard_normal(A.shape[0]).astype(np.float32)

for method, kw in [
    ("cg", {}),
    ("mrr", {}),
    ("kskipcg", {"k": 4}),
    ("kskipmrr", {"k": 2}),
    ("adaptivekskipmrr", {"k": 3}),
]:
    x, info = krylov_tpu.solve(A, b, method=method, tol=1e-5, verbose=True, **kw)
    true_res = np.linalg.norm(b - np.asarray(A.matvec(x))) / np.linalg.norm(b)
    print(f"-> true relative residual: {true_res:.3e}\n")
