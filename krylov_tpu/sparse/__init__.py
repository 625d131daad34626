from krylov_tpu.sparse.formats import (
    DenseMatrix,
    DiaMatrix,
    EllMatrix,
    Operator,
    as_operator,
)
from krylov_tpu.sparse import convert, fixtures

__all__ = [
    "DenseMatrix",
    "DiaMatrix",
    "EllMatrix",
    "Operator",
    "as_operator",
    "convert",
    "fixtures",
]
