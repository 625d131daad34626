from krylov_tpu.sparse.formats import (
    DenseMatrix,
    DiaMatrix,
    EllMatrix,
    HybMatrix,
    Operator,
    StencilMatrix,
    as_operator,
)
from krylov_tpu.sparse import convert, fixtures, io

__all__ = [
    "DenseMatrix",
    "DiaMatrix",
    "EllMatrix",
    "HybMatrix",
    "StencilMatrix",
    "Operator",
    "as_operator",
    "convert",
    "fixtures",
    "io",
]
