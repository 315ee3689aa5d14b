"""Pallas TPU megakernel: fused closest-hit over spheres + triangles.

The XLA fallback (raytpu.integrator.hit) materializes (B, S) and (B, T)
distance matrices in HBM every bounce (~40 MB/bounce at production
sizes) just to argmin-reduce them. This kernel keeps the whole
primitive-scan in VMEM: each grid step owns a (ROWS, 128) tile of rays,
the entire (padded) primitive SoA sits in VMEM (~KBs for tipe-raytracer
scale scenes), and the running (best_t, best_index) pair lives in
registers — the distance matrix never exists.

Loop structure mirrors closest_hit (/root/reference/main.c:52-92):
spheres are scanned before triangles and a later primitive replaces the
winner only on strictly smaller distance, reproducing the reference's
tie-breaking exactly. Epsilon conventions are the reference's
(sphere.h:29 root acceptance, mesh.h:88 det/barycentric epsilons),
baked in as compile-time constants.

The kernel is selection-only (per-ray winner index + distance); the
differentiable path recomputes the winner's distance elementwise outside
the kernel (see integrator.hit), so no custom VJP is needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytpu.core.types import Scene
from raytpu.core.vec3 import Vec3
from raytpu.geometry.triangle import TriangleGeom
from raytpu.kernels._common import (
    BIG,
    LANE,
    MAX_SMEM_PRIMS,
    pad_prims as _pad_prims,
    pad_rows as _pad_rows,
)

ROWS = 64           # rays per grid step = ROWS * LANE = 8192


def pallas_supported(scene: Scene) -> bool:
    """Primitive tables must fit SMEM (see _common.MAX_SMEM_PRIMS);
    callers fall back to the XLA distance-matrix path otherwise."""
    return (
        scene.spheres.count <= MAX_SMEM_PRIMS
        and scene.triangles.count <= MAX_SMEM_PRIMS
    )


def _intersect_kernel(
    sph_ref, tri_ref, box_ref, ox, oy, oz, dx, dy, dz, t_out, idx_out,
    *, n_spheres, n_tris, sphere_eps, det_eps, tri_eps,
):
    shape = ox.shape
    best = jnp.full(shape, BIG, jnp.float32)
    bidx = jnp.full(shape, -1, jnp.int32)

    rox, roy, roz = ox[:], oy[:], oz[:]
    rdx, rdy, rdz = dx[:], dy[:], dz[:]
    # a = |d|^2 is primitive-independent
    a_quad = rdx * rdx + rdy * rdy + rdz * rdz
    inv_2a = 0.5 / jnp.maximum(a_quad, 1e-20)

    def sphere_body(s, carry):
        best, bidx = carry
        cx, cy, cz, r = sph_ref[0, s], sph_ref[1, s], sph_ref[2, s], sph_ref[3, s]
        ocx, ocy, ocz = rox - cx, roy - cy, roz - cz
        b = 2.0 * (ocx * rdx + ocy * rdy + ocz * rdz)
        c = ocx * ocx + ocy * ocy + ocz * ocz - r * r
        disc = b * b - 4.0 * a_quad * c
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t1 = (-b - sq) * inv_2a
        t2 = (-b + sq) * inv_2a
        hit = disc > 0.0
        t = jnp.where(
            hit & (t1 >= sphere_eps),
            t1,
            jnp.where(hit & (t2 >= sphere_eps), t2, BIG),
        )
        better = t < best
        return jnp.where(better, t, best), jnp.where(better, s, bidx)

    best, bidx = jax.lax.fori_loop(0, n_spheres, sphere_body, (best, bidx))

    def tri_body(t_i, carry):
        best, bidx = carry
        ax, ay, az = tri_ref[0, t_i], tri_ref[1, t_i], tri_ref[2, t_i]
        abx, aby, abz = tri_ref[3, t_i], tri_ref[4, t_i], tri_ref[5, t_i]
        acx, acy, acz = tri_ref[6, t_i], tri_ref[7, t_i], tri_ref[8, t_i]
        nx, ny, nz = tri_ref[9, t_i], tri_ref[10, t_i], tri_ref[11, t_i]

        aox, aoy, aoz = rox - ax, roy - ay, roz - az
        # dao = cross(ao, d)
        daox = aoy * rdz - aoz * rdy
        daoy = aoz * rdx - aox * rdz
        daoz = aox * rdy - aoy * rdx

        det = -(rdx * nx + rdy * ny + rdz * nz)
        inv_det = 1.0 / jnp.where(det >= det_eps, det, 1.0)
        dst = (aox * nx + aoy * ny + aoz * nz) * inv_det
        u = (acx * daox + acy * daoy + acz * daoz) * inv_det
        v = -(abx * daox + aby * daoy + abz * daoz) * inv_det
        w = 1.0 - u - v
        valid = (
            (det >= det_eps)
            & (dst >= tri_eps)
            & (u >= tri_eps)
            & (v >= tri_eps)
            & (w >= tri_eps)
        )
        t = jnp.where(valid, dst, BIG)
        better = t < best
        return (
            jnp.where(better, t, best),
            jnp.where(better, n_spheres + t_i, bidx),
        )

    if n_tris > 0:
        # chunked AABB cull (the CUDA fork's hit_BBox, triangle.hu:42-59,
        # generalized from one box per mesh to one per 128-triangle
        # chunk): if no ray in this tile enters a chunk's box, the whole
        # 128-triangle inner loop is skipped.
        n_chunks = -(-n_tris // LANE)
        inv_dx = 1.0 / rdx
        inv_dy = 1.0 / rdy
        inv_dz = 1.0 / rdz

        def chunk_body(c, carry):
            lo_x, lo_y, lo_z = box_ref[0, c], box_ref[1, c], box_ref[2, c]
            hi_x, hi_y, hi_z = box_ref[3, c], box_ref[4, c], box_ref[5, c]
            t0x = (lo_x - rox) * inv_dx
            t1x = (hi_x - rox) * inv_dx
            t0y = (lo_y - roy) * inv_dy
            t1y = (hi_y - roy) * inv_dy
            t0z = (lo_z - roz) * inv_dz
            t1z = (hi_z - roz) * inv_dz
            tmin = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.minimum(t0z, t1z),
            )
            tmax = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.maximum(t0z, t1z),
            )
            any_hit = jnp.any((tmax >= tmin) & (tmax >= 0.0))

            def run(carry):
                def body(j, carry):
                    return tri_body(c * LANE + j, carry)

                return jax.lax.fori_loop(0, LANE, body, carry)

            return jax.lax.cond(any_hit, run, lambda x: x, carry)

        best, bidx = jax.lax.fori_loop(0, n_chunks, chunk_body, (best, bidx))

    t_out[:] = best
    idx_out[:] = bidx


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_spheres", "n_tris", "sphere_eps", "det_eps", "tri_eps", "interpret",
    ),
)
def _intersect_call(
    sph, tri, boxes, ox, oy, oz, dx, dy, dz,
    *, n_spheres, n_tris, sphere_eps, det_eps, tri_eps, interpret,
):
    rows = ox.shape[0]
    grid = (max(rows // ROWS, 1),)
    block_rows = min(ROWS, rows)
    ray_spec = pl.BlockSpec(
        (block_rows, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    # primitive SoA tables live in SMEM: the kernel reads them one scalar
    # at a time at dynamic indices, which VMEM lanes cannot do
    prim_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    kernel = functools.partial(
        _intersect_kernel,
        n_spheres=n_spheres,
        n_tris=n_tris,
        sphere_eps=sphere_eps,
        det_eps=det_eps,
        tri_eps=tri_eps,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[prim_spec, prim_spec, prim_spec] + [ray_spec] * 6,
        out_specs=[ray_spec, ray_spec],
        out_shape=[
            jax.ShapeDtypeStruct((rows, LANE), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANE), jnp.int32),
        ],
        interpret=interpret,
    )(sph, tri, boxes, ox, oy, oz, dx, dy, dz)


def pallas_select(
    scene: Scene,
    geom: TriangleGeom | None,
    origin: Vec3,
    direction: Vec3,
    sphere_eps: float,
    det_eps: float,
    tri_eps: float,
    interpret: bool = False,
) -> tuple[Array, Array]:
    """Winner selection for a ray batch: (best_t (B,), best_idx (B,)).

    best_idx < n_spheres selects a sphere, otherwise triangle
    best_idx - n_spheres; -1 = miss (best_t >= BIG). Not differentiable
    (callers recompute the winner's distance, integrator.hit).
    """
    b = origin.x.shape[0]
    n_s = scene.spheres.count
    n_t = scene.triangles.count

    rows = max(-(-b // LANE), 8)
    # pad rows so the grid divides evenly
    rows = -(-rows // ROWS) * ROWS if rows > 8 else rows

    ox, oy, oz = (_pad_rows(c, rows) for c in origin)
    dx, dy, dz = (_pad_rows(c, rows) for c in direction)

    s_pad = max(-(-n_s // LANE) * LANE, LANE)
    sph = _pad_prims(
        [
            scene.spheres.center.x,
            scene.spheres.center.y,
            scene.spheres.center.z,
            scene.spheres.radius,
        ],
        s_pad,
    )
    t_pad = max(-(-n_t // LANE) * LANE, LANE)
    n_chunks = t_pad // LANE
    if n_t > 0:
        tri = _pad_prims(
            [
                geom.a.x, geom.a.y, geom.a.z,
                geom.edge_ab.x, geom.edge_ab.y, geom.edge_ab.z,
                geom.edge_ac.x, geom.edge_ac.y, geom.edge_ac.z,
                geom.normal_raw.x, geom.normal_raw.y, geom.normal_raw.z,
            ],
            t_pad,
        )
        # per-128-chunk AABBs over real triangles (+/-inf padding keeps
        # padded slots out of the boxes)
        vb = geom.a + geom.edge_ab
        vc = geom.a + geom.edge_ac
        lo, hi = [], []
        for comp in range(3):
            parts = [
                [geom.a.x, vb.x, vc.x],
                [geom.a.y, vb.y, vc.y],
                [geom.a.z, vb.z, vc.z],
            ][comp]
            stack = jnp.stack(parts)                       # (3, T)
            pad = t_pad - n_t
            lo.append(jnp.min(
                jnp.pad(stack, ((0, 0), (0, pad)), constant_values=jnp.inf)
                .reshape(3, n_chunks, LANE), axis=(0, 2),
            ))
            hi.append(jnp.max(
                jnp.pad(stack, ((0, 0), (0, pad)), constant_values=-jnp.inf)
                .reshape(3, n_chunks, LANE), axis=(0, 2),
            ))
        boxes = jnp.stack(lo + hi)                         # (6, n_chunks)
        # inflate slightly: vb/vc are recomputed (a+edge) so they can sit
        # ~1 ulp inside the true vertices; keep the cull conservative
        eps = 1e-5 * (jnp.abs(boxes) + 1.0)
        boxes = boxes + jnp.concatenate(
            [-eps[:3], eps[3:]], axis=0
        )
    else:
        tri = jnp.zeros((12, t_pad), jnp.float32)
        boxes = jnp.zeros((6, n_chunks), jnp.float32)

    best_t, best_idx = _intersect_call(
        sph, tri, boxes, ox, oy, oz, dx, dy, dz,
        n_spheres=n_s, n_tris=n_t,
        sphere_eps=sphere_eps, det_eps=det_eps, tri_eps=tri_eps,
        interpret=interpret,
    )
    return best_t.reshape(-1)[:b], best_idx.reshape(-1)[:b]
