"""TPU-friendly 1-D gather.

Empirical Mosaic/XLA-TPU behavior (measured on v5e, jax 0.9): a 1-D
gather ``jnp.take(table, idx)`` with a (B,) index vector compiles in
O(minutes) when the table has roughly 128..1023 elements (e.g. 256: 348s,
128: 76s), while tiny tables (<= 64) and 2-D tables shaped (rows, 128)
with >= 8 rows compile in under a second and run fast. One-hot matmul
gathers are even worse (464s compile).

``gather1d`` therefore routes every gather to a fast-compiling form:
tables <= 64 entries use plain take; anything larger is zero-padded to a
(max(rows, 8), 128) layout and indexed with (idx // 128, idx % 128).
The pad/reshape is loop-invariant, so XLA hoists it out of scan bodies.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

_LANE = 128
_MIN_ROWS = 8


def gather1d(table: Array, idx: Array) -> Array:
    """table (N,), idx (...,) int -> (...,) table[idx], TPU-fast-compiling."""
    if table.ndim != 1:
        return jnp.take(table, idx, axis=0)
    n = table.shape[0]
    if n <= 64:
        return jnp.take(table, idx, axis=0)
    rows = max(-(-n // _LANE), _MIN_ROWS)
    pad = rows * _LANE - n
    t2 = jnp.pad(table, (0, pad)).reshape(rows, _LANE)
    return t2[idx // _LANE, idx % _LANE]
