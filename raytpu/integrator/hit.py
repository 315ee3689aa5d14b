"""Closest-hit resolution over spheres + triangles.

The branchless reformulation of closest_hit (/root/reference/main.c:52-92):
the reference linearly scans spheres then triangles keeping the strictly
closer hit (so on exact ties the earlier primitive wins, and spheres beat
triangles). Here each primitive class produces a (B, rays x prims)
distance matrix whose argmin (first-min, matching the scan's tie-break)
selects the winner; material/normal/UV data is then gathered only for the
winning primitive per ray — unlike the reference, which runs
tri_uvmapping for every progressively-closer triangle (main.c:86).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
from jax import Array

from raytpu.core.gather import gather1d
from raytpu.core.types import Materials, RenderConfig, Scene
from raytpu.core.vec3 import Vec3
from raytpu.geometry.sphere import sphere_distances, sphere_normal
from raytpu.geometry.triangle import TriangleGeom, precompute, triangle_distances
from raytpu.materials.texture import sky_emission, triangle_material


class Hit(NamedTuple):
    did_hit: Array   # (B,) bool
    dst: Array       # (B,) distance (inf on miss)
    point: Vec3      # (B,)
    normal: Vec3     # (B,) geometric normal (un-flipped, like the reference)
    mat: Materials   # (B,)


def closest_hit(
    scene: Scene,
    geom: Optional[TriangleGeom],
    origin: Vec3,
    direction: Vec3,
    cfg: RenderConfig,
    with_material: bool = True,
) -> Hit:
    """Vectorized closest_hit (main.c:52-92). ``geom`` is the precomputed
    triangle bundle (pass None to compute on the fly)."""
    b = origin.x.shape[0]
    n_spheres = scene.spheres.count
    n_tris = scene.triangles.count
    inf = jnp.full((b,), jnp.inf, jnp.float32)

    # --- spheres -------------------------------------------------------
    if n_spheres > 0:
        s_dists = sphere_distances(
            origin, direction, scene.spheres.center, scene.spheres.radius,
            eps=cfg.sphere_eps,
        )
        s_idx = jnp.argmin(s_dists, axis=1)
        s_t = jnp.min(s_dists, axis=1)
    else:
        s_idx = jnp.zeros((b,), jnp.int32)
        s_t = inf

    # --- triangles -----------------------------------------------------
    if n_tris > 0:
        if geom is None:
            geom = precompute(scene.triangles)
        t_dists = triangle_distances(
            origin, direction, geom, det_eps=cfg.tri_det_eps, eps=cfg.tri_eps
        )
        t_idx = jnp.argmin(t_dists, axis=1)
        t_t = jnp.min(t_dists, axis=1)
    else:
        t_idx = jnp.zeros((b,), jnp.int32)
        t_t = inf

    # spheres scanned first; triangle replaces only on strictly smaller dst
    tri_wins = t_t < s_t
    dst = jnp.where(tri_wins, t_t, s_t)
    did_hit = jnp.isfinite(dst)
    safe_dst = jnp.where(did_hit, dst, 0.0)
    point = origin + direction * safe_dst

    if not with_material:
        zero = Vec3.zeros((b,))
        return Hit(did_hit, dst, point, zero, Materials.zeros((b,)))

    # --- gather winner data -------------------------------------------
    normal = Vec3.zeros((b,))
    mat = Materials.zeros((b,))

    if n_spheres > 0:
        centers = scene.spheres.center.take(s_idx)
        n_s = sphere_normal(point, centers)
        m_s = scene.spheres.mat.take(s_idx)
        if scene.sky_sphere_index >= 0 and scene.sky.rgb.x.shape[0] > 0:
            # textured sky emission (sphere_uvmapping path, texture.h:92-112;
            # commented out in main.c:64-71 — enabled via sky_sphere_index)
            radii = gather1d(scene.spheres.radius, s_idx)
            sky_rgb = sky_emission(scene.sky, point, centers, radii)
            is_sky = s_idx == scene.sky_sphere_index
            m_s = m_s.replace(emission=Vec3.where(is_sky, sky_rgb, m_s.emission))
        sphere_sel = did_hit & ~tri_wins
        normal = Vec3.where(sphere_sel, n_s, normal)
        mat = Materials.where(sphere_sel, m_s, mat)

    if n_tris > 0:
        tris = scene.triangles
        a = tris.a.take(t_idx)
        bb = tris.b.take(t_idx)
        c = tris.c.take(t_idx)
        n_t = geom.normal.take(t_idx)
        m_t = triangle_material(
            a, bb, c,
            (gather1d(tris.ua, t_idx), gather1d(tris.va, t_idx)),
            (gather1d(tris.ub, t_idx), gather1d(tris.vb, t_idx)),
            (gather1d(tris.uc, t_idx), gather1d(tris.vc, t_idx)),
            n_t, point,
            gather1d(tris.mat_id, t_idx),
            scene.atlas, scene.mat_table,
        )
        tri_sel = did_hit & tri_wins
        normal = Vec3.where(tri_sel, n_t, normal)
        mat = Materials.where(tri_sel, m_t, mat)

    return Hit(did_hit, dst, point, normal, mat)


def any_hit(
    scene: Scene,
    geom: Optional[TriangleGeom],
    origin: Vec3,
    direction: Vec3,
    cfg: RenderConfig,
) -> Array:
    """Occlusion query: did the ray hit anything? Used by the AO estimator
    (ambient_occlusion, main.c:94-116), which only consumes didHit since
    attenuation = (distance/dst)^I == 1 for normalized directions."""
    return closest_hit(scene, geom, origin, direction, cfg, with_material=False).did_hit
