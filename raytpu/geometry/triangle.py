"""Branchless vectorized ray-triangle intersection + AABB culling.

Reformulates hit_triangle (/root/reference/mesh.h:70-94; CUDA twin
triangle.hu:244-268) — Moller-Trumbore with barycentric inside tests and
backface culling — as a masked (B rays x T triangles) distance matrix.
The reference's epsilons are kept verbatim: det >= 1e-6 (backface cull)
and dst/u/v/w >= 1e-7 acceptance (mesh.h:88).

Also provides the slab-test AABB cull of the CUDA fork (hit_BBox,
/root/reference/triangle.hu:42-59; box build triangle.hu:143-160): one
box per mesh chunk, used to mask out whole triangle tiles.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import Array

from raytpu.core.types import Triangles
from raytpu.core.vec3 import Vec3

INF = jnp.inf


class TriangleGeom(NamedTuple):
    """Precomputed per-triangle quantities, hoisted out of the per-ray loop
    (the reference recomputes these per ray per triangle, mesh.h:72-75)."""

    edge_ab: Vec3   # B - A          (T,)
    edge_ac: Vec3   # C - A          (T,)
    normal_raw: Vec3  # cross(AB, AC), unnormalized
    normal: Vec3    # normalized plane normal
    a: Vec3


def precompute(tris: Triangles) -> TriangleGeom:
    edge_ab = tris.b - tris.a
    edge_ac = tris.c - tris.a
    n_raw = edge_ab.cross(edge_ac)
    return TriangleGeom(edge_ab, edge_ac, n_raw, n_raw.normalize(), tris.a)


def triangle_distances(
    origin: Vec3,
    direction: Vec3,
    geom: TriangleGeom,
    det_eps: float = 1e-6,
    eps: float = 1e-7,
) -> Array:
    """Distances (B, T); +inf where no hit (mesh.h:70-94)."""
    # (B, 1) vs (1, T) broadcasting, all elementwise on the VPU
    ox, oy, oz = origin.x[:, None], origin.y[:, None], origin.z[:, None]
    dx, dy, dz = direction.x[:, None], direction.y[:, None], direction.z[:, None]

    ax, ay, az = geom.a.x[None, :], geom.a.y[None, :], geom.a.z[None, :]
    nx, ny, nz = (
        geom.normal_raw.x[None, :],
        geom.normal_raw.y[None, :],
        geom.normal_raw.z[None, :],
    )
    abx, aby, abz = (
        geom.edge_ab.x[None, :],
        geom.edge_ab.y[None, :],
        geom.edge_ab.z[None, :],
    )
    acx, acy, acz = (
        geom.edge_ac.x[None, :],
        geom.edge_ac.y[None, :],
        geom.edge_ac.z[None, :],
    )

    # ao = origin - A ; dao = cross(ao, dir)
    aox, aoy, aoz = ox - ax, oy - ay, oz - az
    daox = aoy * dz - aoz * dy
    daoy = aoz * dx - aox * dz
    daoz = aox * dy - aoy * dx

    det = -(dx * nx + dy * ny + dz * nz)
    # The C code divides by det unguarded (mesh.h:79); invalid dets are
    # masked out below, so forward results match. The guard only keeps
    # reverse-mode gradients finite (0-cotangent * inf would give NaN).
    inv_det = 1.0 / jnp.where(det >= det_eps, det, 1.0)
    dst = (aox * nx + aoy * ny + aoz * nz) * inv_det
    u = (acx * daox + acy * daoy + acz * daoz) * inv_det
    v = -(abx * daox + aby * daoy + abz * daoz) * inv_det
    w = 1.0 - u - v

    valid = (det >= det_eps) & (dst >= eps) & (u >= eps) & (v >= eps) & (w >= eps)
    return jnp.where(valid, dst, INF)


def triangle_distance_one(
    origin: Vec3,
    direction: Vec3,
    a: Vec3,
    edge_ab: Vec3,
    edge_ac: Vec3,
    normal_raw: Vec3,
    det_eps: float = 1e-6,
    eps: float = 1e-7,
) -> Array:
    """Per-ray distance to ONE (already gathered) triangle: all args (B,).
    Elementwise twin of triangle_distances for the recompute-the-winner
    backward trick (see sphere_distance_one)."""
    ao = origin - a
    dao = ao.cross(direction)
    det = -direction.dot(normal_raw)
    inv_det = 1.0 / jnp.where(det >= det_eps, det, 1.0)
    dst = ao.dot(normal_raw) * inv_det
    u = edge_ac.dot(dao) * inv_det
    v = -edge_ab.dot(dao) * inv_det
    w = 1.0 - u - v
    valid = (det >= det_eps) & (dst >= eps) & (u >= eps) & (v >= eps) & (w >= eps)
    return jnp.where(valid, dst, INF)


class AABB(NamedTuple):
    """Axis-aligned box (BBox, triangle.hu:8-11)."""

    mn: Vec3
    mx: Vec3


def build_aabb(tris: Triangles) -> AABB:
    """Single box over all triangles (triangle.hu:143-160 builds one per
    mesh; chunked culling generalizes this)."""
    def mn(*arrs):
        return jnp.min(jnp.stack(arrs))

    def mx(*arrs):
        return jnp.max(jnp.stack(arrs))

    lo = Vec3(
        mn(tris.a.x, tris.b.x, tris.c.x),
        mn(tris.a.y, tris.b.y, tris.c.y),
        mn(tris.a.z, tris.b.z, tris.c.z),
    )
    hi = Vec3(
        mx(tris.a.x, tris.b.x, tris.c.x),
        mx(tris.a.y, tris.b.y, tris.c.y),
        mx(tris.a.z, tris.b.z, tris.c.z),
    )
    return AABB(lo, hi)


def hit_aabb(origin: Vec3, direction: Vec3, box: AABB) -> Array:
    """Slab test (hit_BBox, triangle.hu:42-59); (B,) bool."""
    inv = Vec3(1.0 / direction.x, 1.0 / direction.y, 1.0 / direction.z)
    t0 = Vec3(
        (box.mn.x - origin.x) * inv.x,
        (box.mn.y - origin.y) * inv.y,
        (box.mn.z - origin.z) * inv.z,
    )
    t1 = Vec3(
        (box.mx.x - origin.x) * inv.x,
        (box.mx.y - origin.y) * inv.y,
        (box.mx.z - origin.z) * inv.z,
    )
    tmin = Vec3(
        jnp.minimum(t0.x, t1.x), jnp.minimum(t0.y, t1.y), jnp.minimum(t0.z, t1.z)
    ).max_component()
    tmax = Vec3(
        jnp.maximum(t0.x, t1.x), jnp.maximum(t0.y, t1.y), jnp.maximum(t0.z, t1.z)
    ).min_component()
    return (tmax >= tmin) & (tmax >= 0.0)


def barycentric(
    a: Vec3, b: Vec3, c: Vec3, normal: Vec3, p: Vec3
) -> tuple[Array, Array, Array]:
    """Area-ratio barycentric coordinates, matching get_barycentric_coord
    (/root/reference/texture.h:16-27): signed areas projected on the hit
    normal. Inputs are per-ray gathered winning triangles (B,)."""
    area_abc = normal.dot((b - a).cross(c - a))
    area_pbc = normal.dot((b - p).cross(c - p))
    area_pca = normal.dot((c - p).cross(a - p))
    # degenerate-triangle guard (grad safety; valid hits have area > 0)
    inv = 1.0 / jnp.where(jnp.abs(area_abc) > 1e-20, area_abc, 1.0)
    w_a = area_pbc * inv
    w_b = area_pca * inv
    w_c = 1.0 - w_a - w_b
    return w_a, w_b, w_c
