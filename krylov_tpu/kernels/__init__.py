from krylov_tpu.kernels.stencil import stencil_matvec, stencil_matvec_2d
from krylov_tpu.kernels.fused import fused_cg_solve_2d, fused_mrr_solve_2d
from krylov_tpu.kernels.fused_kskip import (
    fused_kskipcg_solve_2d,
    fused_kskipmrr_solve_2d,
)

__all__ = [
    "stencil_matvec",
    "stencil_matvec_2d",
    "fused_cg_solve_2d",
    "fused_mrr_solve_2d",
    "fused_kskipcg_solve_2d",
    "fused_kskipmrr_solve_2d",
]
