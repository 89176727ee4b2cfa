from gardenia_tpu.ops.semiring import (
    Semiring, F32_PLUS_TIMES, F32_MIN_PLUS, I32_MIN_PLUS, I32_PLUS_TIMES,
    I32_MIN_SELECT2,
)
from gardenia_tpu.ops.ell import EllMatrix, EllBucket, build_ell
from gardenia_tpu.ops.spmv import spmv_ell, spmv_segment

__all__ = [
    "Semiring", "F32_PLUS_TIMES", "F32_MIN_PLUS", "I32_MIN_PLUS",
    "I32_PLUS_TIMES", "I32_MIN_SELECT2",
    "EllMatrix", "EllBucket", "build_ell", "spmv_ell", "spmv_segment",
]
