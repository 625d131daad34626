from krylov_tpu.solvers._common import SolveResult
from krylov_tpu.solvers.cg import cg_kernel
from krylov_tpu.solvers.mrr import mrr_kernel

__all__ = ["SolveResult", "cg_kernel", "mrr_kernel"]
