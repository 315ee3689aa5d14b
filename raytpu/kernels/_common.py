"""Shared layout helpers/constants for the Pallas kernels."""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

LANE = 128
BIG = 3.0e38        # stand-in for +inf (f32 max ~ 3.4e38)

# SMEM capacity guard: primitive SoA tables live in scalar memory; the
# probe on v5e accepted >= 256KB, but stay well inside it. 8192 padded
# triangles x 12 channels x 4B = 384KB would exceed; cap conservatively.
MAX_SMEM_PRIMS = 4096


def pad_rows(x: Array, rows: int) -> Array:
    """(B,) -> zero-padded (rows, 128)."""
    pad = rows * LANE - x.shape[0]
    return jnp.pad(x, (0, pad)).reshape(rows, LANE)


def pad_prims(arrs, n_pad: int) -> Array:
    """Stack 1-D primitive channels into a zero-padded (C, n_pad) table."""
    return jnp.stack([jnp.pad(a, (0, n_pad - a.shape[0])) for a in arrs])
