"""Semirings for generalized SpMV.

The reference implements each graph kernel as a hand-specialized edge loop
(e.g. PR pull src/pr/omp_base.cc:27-34, BFS bottom-up src/bfs/omp_beamer.cc:13,
SSSP relax src/sssp/omp_base.cc:45-58).  On TPU every one of those loops is
the same dense-masked computation y = A (x) under a different (add, mul)
semiring, so we factor the semiring out and implement ONE blocked SpMV.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax.numpy as jnp
import numpy as np

from gardenia_tpu.core import types as T


@dataclasses.dataclass(frozen=True)
class Semiring:
    """(add, mul) with identity `zero`.

    pad_x: value stored in the padded slot of the gathered operand so that
           mul(0, pad_x) == zero (ELL pads values with 0).
    scatter: which jnp scatter op combines partial row results ('add'/'min'/
             'max') — must match `add`.
    """

    name: str
    add: Callable[[Any, Any], Any]
    mul: Callable[[Any, Any], Any]
    zero: Any
    pad_x: Any
    scatter: str
    dtype: Any

    def reduce(self, arr, axis):
        if self.scatter == "add":
            return jnp.sum(arr, axis=axis)
        if self.scatter == "min":
            return jnp.min(arr, axis=axis)
        if self.scatter == "max":
            return jnp.max(arr, axis=axis)
        raise ValueError(self.scatter)

    def scatter_into(self, y, idx, vals):
        ref = y.at[idx]
        if self.scatter == "add":
            return ref.add(vals, mode="drop")
        if self.scatter == "min":
            return ref.min(vals, mode="drop")
        if self.scatter == "max":
            return ref.max(vals, mode="drop")
        raise ValueError(self.scatter)


_INF_F32 = np.float32(np.inf)

# y[i] = sum_j A[i,j] * x[j]   — SpMV, PageRank pull, BC accumulation
F32_PLUS_TIMES = Semiring("f32_plus_times", jnp.add, jnp.multiply,
                          np.float32(0), np.float32(0), "add", jnp.float32)

# y[i] = min_j (A[i,j] + x[j]) — SSSP relaxation (float weights)
F32_MIN_PLUS = Semiring("f32_min_plus", jnp.minimum, jnp.add,
                        _INF_F32, _INF_F32, "min", jnp.float32)

# integer distances with MYINFINITY sentinel (reference common.h:66)
I32_MIN_PLUS = Semiring("i32_min_plus", jnp.minimum, jnp.add,
                        np.int32(T.MYINFINITY), np.int32(T.MYINFINITY),
                        "min", jnp.int32)

# y[i] = sum_j x[j] over neighbors — frontier-overlap counts (BFS, TC rows)
I32_PLUS_TIMES = Semiring("i32_plus_times", jnp.add, jnp.multiply,
                          np.int32(0), np.int32(0), "add", jnp.int32)

# y[i] = min_j x[j] — min-label propagation (CC / SV hooking, BFS parent);
# mul ignores the matrix value ("select second")
I32_MIN_SELECT2 = Semiring("i32_min_select2", jnp.minimum,
                           lambda a, x: x,
                           np.int32(np.iinfo(np.int32).max),
                           np.int32(np.iinfo(np.int32).max), "min", jnp.int32)
