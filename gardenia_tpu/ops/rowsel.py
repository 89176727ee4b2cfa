"""Row-select gather: the TPU-native random-access primitive.

XLA lowers a 1D gather x[idx] to a scalar loop (~8.5 ns/element measured
on v5e); gathering whole 128-lane ROWS is vectorized and runs at HBM
bandwidth.  So we fetch the 128-wide row containing each index and select
the target lane with a one-hot dot:

    value[i] = sum_j x2d[idx[i] >> 7, j] * (j == idx[i] & 127)

~3x faster than the scalar gather in f32, more in narrow dtypes (the
traffic is one row per edge, so bf16 halves it — safe whenever values
are small integers, e.g. BFS frontier counts < 256).

This is the device analog of the reference's warp-per-row coalesced
loads (src/spmv/warp.cu): a full memory transaction per access, lanes
doing the selection.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gardenia_tpu.core import types as T

LANES = 128
LANE_BITS = 7


def enabled() -> bool:
    """Row-select gathering beats the scalar gather only on TPU; on CPU
    (tests, virtual multichip meshes) the plain gather is far cheaper."""
    return jax.default_backend() in ("tpu", "axon")


def pad_rows(n: int) -> int:
    """Number of 128-wide rows covering indices 0..n (incl. sentinel n)."""
    return (n + 1 + LANES - 1) // LANES


def to_rows(x: jax.Array, n: int, pad_value, dtype=None) -> jax.Array:
    """Reshape a 1D operand (plus sentinel slot at index n) into the
    (rows, 128) row table the gather reads."""
    dtype = dtype or x.dtype
    rows = pad_rows(n)
    total = rows * LANES
    flat = jnp.full((total,), pad_value, dtype)
    flat = flat.at[:n].set(x.astype(dtype))
    return flat.reshape(rows, LANES)


def gather(x2d: jax.Array, idx: jax.Array, *, acc_dtype=jnp.float32
           ) -> jax.Array:
    """value[...] = x_flat[idx[...]] via row gather + one-hot lane dot.

    idx: any-shaped int32 indices into the flattened table.
    Returns acc_dtype values with idx's shape.
    """
    if not enabled():
        return x2d.reshape(-1)[idx].astype(acc_dtype)
    rows = x2d[idx >> LANE_BITS]                       # (..., 128)
    lane = (idx & (LANES - 1))[..., None]
    onehot = lane == jnp.arange(LANES, dtype=jnp.int32)
    # select-with-where (not multiply) so sentinel values like the
    # min-plus infinity never produce inf*0 = nan
    vals = jnp.where(onehot, rows.astype(acc_dtype),
                     jnp.zeros((), acc_dtype))
    return jnp.sum(vals, axis=-1)


def take2d(x2d: jax.Array, idx: jax.Array) -> jax.Array:
    """take() over a PREBUILT row table (see to_rows).  Use when the
    operand is loop-invariant or lives padded in a loop carry: take()
    rebuilds the (rows, 128) padding on every call — an O(n) copy that
    dominates compact-frontier rounds when n is graph-sized."""
    if not enabled():
        # padded flat view: any sentinel index <= rows*128-1 is valid
        return x2d.reshape(-1)[idx]
    return gather(x2d, idx, acc_dtype=x2d.dtype)


def take(x: jax.Array, idx: jax.Array, pad_value=0) -> jax.Array:
    """Drop-in fast replacement for x[idx] (1D x, any-shape idx).

    Indices equal to x.shape[0] read `pad_value` (matching the sentinel
    convention used across the ELL/COO layouts); larger indices are
    undefined."""
    n = x.shape[0]
    if not enabled():
        ext = jnp.concatenate(
            [x, jnp.full((1,), pad_value, x.dtype)])
        return ext[jnp.minimum(idx, n)]
    if x.dtype == jnp.bool_:
        return take(x.astype(jnp.int32), idx,
                    pad_value=int(bool(pad_value))) != 0
    x2d = to_rows(x, n, pad_value)
    return gather(x2d, idx, acc_dtype=x.dtype)
