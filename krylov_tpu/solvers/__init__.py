from krylov_tpu.solvers._common import SolveResult
from krylov_tpu.solvers.cg import cg_kernel
from krylov_tpu.solvers.mrr import mrr_kernel
from krylov_tpu.solvers.kskip_cg import kskipcg_kernel
from krylov_tpu.solvers.kskip_mrr import kskipmrr_kernel
from krylov_tpu.solvers.adaptive_kskip_mrr import adaptivekskipmrr_kernel
from krylov_tpu.solvers.cacg import cacg_kernel, camrr_kernel
from krylov_tpu.solvers.pipelined import (
    chronopoulos_gear_kernel,
    gropp_kernel,
    pcg_kernel,
    pipelined_cg_kernel,
)

__all__ = [
    "SolveResult",
    "cg_kernel",
    "mrr_kernel",
    "kskipcg_kernel",
    "kskipmrr_kernel",
    "adaptivekskipmrr_kernel",
    "cacg_kernel",
    "camrr_kernel",
    "pcg_kernel",
    "chronopoulos_gear_kernel",
    "gropp_kernel",
    "pipelined_cg_kernel",
]
