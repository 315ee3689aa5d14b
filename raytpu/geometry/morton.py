"""Morton (Z-order) triangle reordering for cull locality.

The chunked-AABB cull (kernels/intersect.py, kernels/trace_scene.py)
builds one box per 128 consecutive triangles; its skip rate depends
entirely on how spatially compact each chunk is. OBJ files order faces
by authoring history, so chunks can span the whole scene. Sorting
triangles by the Morton code of their centroid makes consecutive
triangles spatial neighbors — chunk boxes shrink, rays skip more chunks.

Output-identical by construction: triangle order only affects
closest-hit TIE-BREAKS (the first strictly-closer primitive wins,
main.c:52-92), and exact f32 distance ties between distinct triangles
do not occur away from shared edges, which the u/v/w >= 1e-7 acceptance
already excludes. Applied once at scene load (host-side numpy), before
any device transfer.
"""

from __future__ import annotations

import numpy as np

from raytpu.core.types import Triangles
from raytpu.core.vec3 import Vec3


def _spread_bits(v: np.ndarray) -> np.ndarray:
    """Spread the low 10 bits of v so there are two zero bits between
    each (the classic Morton bit-interleave helper)."""
    v = v.astype(np.uint64) & 0x3FF
    v = (v | (v << 16)) & np.uint64(0x030000FF)
    v = (v | (v << 8)) & np.uint64(0x0300F00F)
    v = (v | (v << 4)) & np.uint64(0x030C30C3)
    v = (v | (v << 2)) & np.uint64(0x09249249)
    return v


def morton_codes(cx: np.ndarray, cy: np.ndarray, cz: np.ndarray) -> np.ndarray:
    """30-bit Morton codes of points normalized to the scene's bounding
    box (10 bits per axis)."""
    codes = np.zeros(cx.shape, np.uint64)
    for i, c in enumerate((cx, cy, cz)):
        lo, hi = float(c.min()), float(c.max())
        span = hi - lo
        q = (
            np.zeros_like(c)
            if span <= 0
            else np.clip((c - lo) / span * 1023.0, 0, 1023)
        )
        codes |= _spread_bits(q.astype(np.uint32)) << np.uint64(i)
    return codes


def morton_order(tris: Triangles) -> Triangles:
    """Stable-sort the triangle SoA by centroid Morton code."""
    if tris.count <= 1:
        return tris
    ax, ay, az = (np.asarray(c) for c in tris.a)
    bx, by, bz = (np.asarray(c) for c in tris.b)
    cx, cy, cz = (np.asarray(c) for c in tris.c)
    codes = morton_codes(
        (ax + bx + cx) / 3.0, (ay + by + cy) / 3.0, (az + bz + cz) / 3.0
    )
    perm = np.argsort(codes, kind="stable")
    if (perm == np.arange(perm.size)).all():
        return tris

    import jax.numpy as jnp

    take = lambda arr: jnp.asarray(np.asarray(arr)[perm])
    takev = lambda v: Vec3(take(v.x), take(v.y), take(v.z))
    return Triangles(
        a=takev(tris.a), b=takev(tris.b), c=takev(tris.c),
        ua=take(tris.ua), va=take(tris.va), ub=take(tris.ub),
        vb=take(tris.vb), uc=take(tris.uc), vc=take(tris.vc),
        mat_id=take(tris.mat_id),
    )
