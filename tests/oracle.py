"""Trusted float64 oracle renderer.

A deliberately slow, scalar, numpy-f64 mirror of the reference CPU
integrator (/root/reference/main.c:52-242 + camera.h + sphere.h + mesh.h +
texture.h + pile.h), consuming *exactly the same* threefry RNG draws as
the production JAX renderer (raytpu.core.rng). Golden tests render tiny
images with both and compare (SURVEY.md §4: "golden-image integration
tests ... against a slow, trusted pure-JAX (f64, un-jitted) oracle").

This file intentionally follows the C control flow (loops, early returns,
linked-list stack) rather than the vectorized design, so it is an
independent implementation path.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import numpy as np

from raytpu.core import rng as rtrng


# --- scalar vec helpers (f64) ------------------------------------------
def norm(v):
    n = math.sqrt(v @ v)
    return v / n if n > 0 else v * 0.0


def reflect(v, n):
    return v - 2.0 * (v @ n) * n


def refract(v, normal, n1, n2):
    # rtutility.h:210-227 with the index-squaring quirk
    n1 = n1 * n1
    n2 = n2 * n2
    radical = 1.0 - ((n1 / n2) ** 2) * (1.0 - (normal @ v) ** 2)
    if radical > 0:
        comp_tan = (v - normal * (v @ normal)) * (n1 / n2)
        comp_norm = -normal * math.sqrt(radical)
        return comp_tan + comp_norm
    return reflect(v, normal)


def random_unit(u, v):
    # rtutility.h:189-203 with sin(acos(x)) = sqrt(1-x^2) eliminated
    # algebraically (same form as raytpu.core.vec3.random_unit_vector)
    theta = 2.0 * math.pi * u
    cos_phi = max(-1.0, min(1.0, 2.0 * v - 1.0))
    sin_phi = math.sqrt(max(0.0, 1.0 - cos_phi * cos_phi))
    return np.array(
        [
            math.cos(theta) * sin_phi,
            math.sin(theta) * sin_phi,
            cos_phi,
        ]
    )


def rgb_to_hsl(rgb):
    r, g, b = rgb
    mx, mn = max(r, g, b), min(r, g, b)
    l = (mx + mn) / 2.0
    if mx == mn:
        return np.array([0.0, 0.0, l])
    d = mx - mn
    s = d / (mx + mn) if l < 0.5 else d / (2.0 - mx - mn)
    if mx == r:
        h = (g - b) / d + (6.0 if g < b else 0.0)
    elif mx == g:
        h = (b - r) / d + 2.0
    else:
        h = (r - g) / d + 4.0
    return np.array([h / 6.0, s, l])


def _hue(t1, t2, hue):
    if hue < 0:
        hue += 1
    if hue > 1:
        hue -= 1
    if 6 * hue < 1:
        return t1 + (t2 - t1) * 6 * hue
    if 2 * hue < 1:
        return t2
    if 3 * hue < 2:
        return t1 + (t2 - t1) * (2.0 / 3.0 - hue) * 6
    return t1


def hsl_to_rgb(hsl):
    h, s, l = hsl
    if s == 0:
        return np.array([l, l, l])
    t2 = l * (1 + s) if l < 0.5 else l + s - l * s
    t1 = 2 * l - t2
    return np.array([_hue(t1, t2, h + 1 / 3), _hue(t1, t2, h), _hue(t1, t2, h - 1 / 3)])


# --- scene mirrors -------------------------------------------------------
@dataclass
class OMaterial:
    diffuse: np.ndarray
    emission: np.ndarray
    emission_strength: float
    reflection: float
    alpha: float
    ior: float


@dataclass
class OSphere:
    center: np.ndarray
    radius: float
    mat: OMaterial


@dataclass
class OTriangle:
    a: np.ndarray
    b: np.ndarray
    c: np.ndarray
    uv: np.ndarray  # (3, 2)
    mat_id: int


@dataclass
class OScene:
    spheres: list
    triangles: list
    atlas_rgb: np.ndarray | None = None    # (M*H*W, 3)
    atlas_alpha: np.ndarray | None = None  # (M*H*W,)
    atlas_w: int = 1
    atlas_h: int = 1
    # per-mat-id table (MatTable mirror)
    table_emission: np.ndarray | None = None
    table_es: np.ndarray | None = None
    table_refl: np.ndarray | None = None
    table_ior: np.ndarray | None = None
    table_alpha_const: np.ndarray | None = None
    table_use_alpha: np.ndarray | None = None
    table_eft: np.ndarray | None = None
    # textured sky sphere (sphere_uvmapping, texture.h:92-112)
    sky_rgb: np.ndarray | None = None   # (H*W, 3)
    sky_w: int = 1
    sky_h: int = 1
    sky_sphere_index: int = -1


def scene_from_jax(scene) -> OScene:
    """Convert a raytpu Scene pytree into the oracle's f64 mirror."""
    sph = []
    s = scene.spheres
    for i in range(s.count):
        sph.append(
            OSphere(
                center=np.array(
                    [float(s.center.x[i]), float(s.center.y[i]), float(s.center.z[i])]
                ),
                radius=float(s.radius[i]),
                mat=OMaterial(
                    diffuse=np.asarray(s.mat.diffuse.to_array()[i], np.float64),
                    emission=np.asarray(s.mat.emission.to_array()[i], np.float64),
                    emission_strength=float(s.mat.emission_strength[i]),
                    reflection=float(s.mat.reflection[i]),
                    alpha=float(s.mat.alpha[i]),
                    ior=float(s.mat.ior[i]),
                ),
            )
        )
    tris = []
    t = scene.triangles
    for i in range(t.count):
        tris.append(
            OTriangle(
                a=np.asarray(t.a.to_array()[i], np.float64),
                b=np.asarray(t.b.to_array()[i], np.float64),
                c=np.asarray(t.c.to_array()[i], np.float64),
                uv=np.array(
                    [
                        [float(t.ua[i]), float(t.va[i])],
                        [float(t.ub[i]), float(t.vb[i])],
                        [float(t.uc[i]), float(t.vc[i])],
                    ]
                ),
                mat_id=int(t.mat_id[i]),
            )
        )
    o = OScene(spheres=sph, triangles=tris)
    if scene.atlas.alpha.shape[0] > 0:
        o.atlas_rgb = np.asarray(scene.atlas.rgb.to_array(), np.float64)
        o.atlas_alpha = np.asarray(scene.atlas.alpha, np.float64)
        o.atlas_w = scene.atlas.width
        o.atlas_h = scene.atlas.height
    if scene.sky.rgb.x.shape[0] > 0:
        o.sky_rgb = np.asarray(scene.sky.rgb.to_array(), np.float64)
        o.sky_w = scene.sky.width
        o.sky_h = scene.sky.height
        o.sky_sphere_index = scene.sky_sphere_index
    mt = scene.mat_table
    o.table_emission = np.asarray(mt.emission.to_array(), np.float64)
    o.table_es = np.asarray(mt.emission_strength, np.float64)
    o.table_refl = np.asarray(mt.reflection, np.float64)
    o.table_ior = np.asarray(mt.ior, np.float64)
    o.table_alpha_const = np.asarray(mt.alpha_const, np.float64)
    o.table_use_alpha = np.asarray(mt.use_alpha_const, bool)
    o.table_eft = np.asarray(mt.emission_from_texture, bool)
    return o


# --- intersection (mirrors sphere.h / mesh.h / texture.h) ----------------
def hit_sphere(center, radius, ro, rd):
    oc = ro - center
    a = rd @ rd
    b = 2.0 * (oc @ rd)
    c = oc @ oc - radius * radius
    disc = b * b - 4 * a * c
    if disc > 0:
        sq = math.sqrt(disc)
        for t in ((-b - sq) / (2 * a), (-b + sq) / (2 * a)):
            if t >= 1e-4:
                p = ro + rd * t
                return t, p, norm(p - center)
    return None


def hit_triangle(tri: OTriangle, ro, rd):
    edge_ab = tri.b - tri.a
    edge_ac = tri.c - tri.a
    n = np.cross(edge_ab, edge_ac)
    ao = ro - tri.a
    dao = np.cross(ao, rd)
    det = -(rd @ n)
    inv = 1.0 / det if det != 0 else math.inf
    dst = (ao @ n) * inv
    u = (edge_ac @ dao) * inv
    v = -(edge_ab @ dao) * inv
    w = 1.0 - u - v
    if det >= 1e-6 and dst >= 1e-7 and u >= 1e-7 and v >= 1e-7 and w >= 1e-7:
        return dst, ro + rd * dst, norm(n)
    return None


def tri_material(scene: OScene, tri: OTriangle, p, n) -> OMaterial:
    # texture.h:44-89
    area_abc = n @ np.cross(tri.b - tri.a, tri.c - tri.a)
    wa = (n @ np.cross(tri.b - p, tri.c - p)) / area_abc
    wb = (n @ np.cross(tri.c - p, tri.a - p)) / area_abc
    wc = 1.0 - wa - wb
    u = wa * tri.uv[0, 0] + wb * tri.uv[1, 0] + wc * tri.uv[2, 0]
    v = wa * tri.uv[0, 1] + wb * tri.uv[1, 1] + wc * tri.uv[2, 1]
    u = math.fmod(u, 1.0)
    v = math.fmod(v, 1.0)
    if u < 0:
        u += 1.0
    if v < 0:
        v += 1.0
    m = tri.mat_id
    if scene.atlas_rgb is not None:
        w_, h_ = scene.atlas_w, scene.atlas_h
        x = min(int(u * w_), w_ - 1)
        y = min(int(v * h_), h_ - 1)
        idx = (y * w_ + x) + w_ * h_ * m
        diffuse = scene.atlas_rgb[idx]
        tex_alpha = scene.atlas_alpha[idx]
    else:
        diffuse = np.array([0.784, 0.965, 1.0])
        tex_alpha = 1.0
    alpha = scene.table_alpha_const[m] if scene.table_use_alpha[m] else tex_alpha
    emission = scene.table_emission[m].copy()
    if scene.table_eft is not None and scene.table_eft[m]:
        emission = emission * diffuse
    return OMaterial(
        diffuse=diffuse,
        emission=emission,
        emission_strength=scene.table_es[m],
        reflection=scene.table_refl[m],
        alpha=alpha,
        ior=scene.table_ior[m],
    )


def sphere_uv_emission(scene: OScene, s: "OSphere", p):
    """sphere_uvmapping (texture.h:92-112): equirect texel at the hit."""
    d = (p - s.center) / s.radius
    theta = math.acos(max(-1.0, min(1.0, -d[1])))
    phi = math.atan2(-d[2], d[0]) + math.pi
    u = phi / (2.0 * math.pi)
    v = theta / math.pi
    x = min(int(u * scene.sky_w), scene.sky_w - 1)
    y = min(int(v * scene.sky_h), scene.sky_h - 1)
    return scene.sky_rgb[y * scene.sky_w + x].copy()


def closest_hit(scene: OScene, ro, rd):
    """main.c:52-92: spheres first, strict < replacement, then triangles."""
    best = None  # (dst, point, normal, mat)
    for i, s in enumerate(scene.spheres):
        h = hit_sphere(s.center, s.radius, ro, rd)
        if h is not None and (best is None or h[0] < best[0]):
            mat = s.mat
            if scene.sky_rgb is not None and i == scene.sky_sphere_index:
                import dataclasses as _dc

                mat = _dc.replace(
                    mat, emission=sphere_uv_emission(scene, s, h[1])
                )
            best = (h[0], h[1], h[2], mat)
    for tri in scene.triangles:
        h = hit_triangle(tri, ro, rd)
        if h is not None and (best is None or h[0] < best[0]):
            mat = tri_material(scene, tri, h[1], h[2])
            best = (h[0], h[1], h[2], mat)
    return best


# --- the tracer (main.c:118-242) ----------------------------------------
def tracer(scene: OScene, ro, rd, cfg, draws_per_bounce):
    """draws_per_bounce: list of np f64 arrays, one per bounce, matching
    rng.ray_uniforms bounce slot order: [diffuse_u, diffuse_v, refr_rnd,
    ao_u0, ao_v0, ...]."""
    incoming = np.zeros(3)
    ray_color = np.ones(3)
    albedo = np.zeros(3)
    normal_aov = np.zeros(3)
    is_alpha = False
    alpha_depth = 0
    stack = [(1.0, 1.0)]  # empiler(1,1) (main.c:128-129); top = end

    for i in range(cfg.max_bounces):
        draws = draws_per_bounce[i]
        hit = closest_hit(scene, ro, rd)
        did_hit = hit is not None
        if did_hit:
            dst, point, nrm, mat = hit
        else:
            dst, point, nrm = math.inf, ro, np.zeros(3)
            mat = OMaterial(np.zeros(3), np.zeros(3), 0.0, 0.0, 0.0, 0.0)

        if i == 0:
            albedo = mat.diffuse.copy()
            normal_aov = nrm.copy()
        if i == alpha_depth and is_alpha:
            albedo = mat.diffuse.copy()
            if mat.emission_strength > 0:
                albedo = mat.emission.copy()
            normal_aov = nrm.copy()
            is_alpha = False

        if not did_hit:
            break

        if i == alpha_depth and mat.emission_strength > 0:
            # HSL boost (main.c:154-160; the CUDA fork uses L*=1.2,
            # main_cuda.cu:89-98) — factors from the config
            h, s_, l = rgb_to_hsl(mat.emission)
            new_col = hsl_to_rgb(
                np.array([
                    h,
                    s_ * getattr(cfg, "hsl_s_factor", 1.0),
                    l * getattr(cfg, "hsl_l_factor", 1.0),
                ])
            )
            return new_col, new_col, nrm

        ro = point
        diffuse_dir = norm(nrm + random_unit(draws[0], draws[1]))
        reflected_dir = reflect(rd, nrm)
        diff_ref = diffuse_dir + (reflected_dir - diffuse_dir) * mat.reflection

        skip = False
        if 1e-4 <= mat.alpha <= 0.99:
            normal_eff = nrm
            # index_suivant_pile (pile.h:64-69)
            a, b = stack[-1]
            stack.append((b, mat.ior))
            n1, n2 = stack[-1]
            if rd @ nrm > 0:  # exiting
                normal_eff = -nrm
                n1, n2 = stack[-1][1], stack[-1][0]
                stack.pop()
            refr_dir = refract(rd, normal_eff, n1, n2)
            if draws[2] > mat.alpha:
                rd = refr_dir
                continue
            rd = diff_ref

        if mat.alpha > 0.99:
            is_alpha = False
            rd = diff_ref

        if mat.alpha < 1e-4:
            ro = point
            is_alpha = True
            alpha_depth += 1
            continue

        if cfg.use_ao:
            emitted = mat.emission * (mat.emission_strength * 1.5 * cfg.ao_intensity)
            incoming = incoming + emitted * ray_color
            if (ray_color > 0.5).any():
                ray_color = mat.diffuse * (ray_color * 1.3)
            ray_color = mat.diffuse * ray_color
            occ = 0.0
            for s_i in range(cfg.ao_samples):
                ao_dir = norm(nrm + random_unit(draws[3 + 2 * s_i], draws[4 + 2 * s_i]))
                if closest_hit(scene, point, ao_dir) is not None:
                    occ += 1.0
            ray_color = ray_color * (occ / cfg.ao_samples / cfg.ao_intensity)
        else:
            emitted = mat.emission * mat.emission_strength
            incoming = incoming + emitted * ray_color
            if (ray_color > 0.5).any():
                ray_color = mat.diffuse * (ray_color * 1.3)
            ray_color = mat.diffuse * ray_color

    return incoming, albedo, normal_aov


def render_oracle(scene_jax, cam, cfg, key):
    """Render (H*W, 3) f64 sums of radiance/albedo/normal over cfg.spp
    samples, consuming the same RNG streams as raytpu.integrator.render."""
    import jax.numpy as jnp

    oscene = scene_from_jax(scene_jax)
    w, h = cfg.width, cfg.height

    origin = np.asarray(cam.origin.to_array(), np.float64)
    horizontal = np.asarray(cam.horizontal.to_array(), np.float64)
    vertical = np.asarray(cam.vertical.to_array(), np.float64)
    lower_left = np.asarray(cam.lower_left.to_array(), np.float64)

    n_draws = 3 + 2 * (cfg.ao_samples if cfg.use_ao else 0)

    rad = np.zeros((h * w, 3))
    alb = np.zeros((h * w, 3))
    nrm = np.zeros((h * w, 3))

    pixel_ids = jnp.arange(h * w, dtype=jnp.int32)
    pix_keys = rtrng.pixel_keys(key, pixel_ids)

    for s in range(cfg.spp):
        ray_keys = rtrng.sample_keys(pix_keys, s)
        cam_jax, bounce_jax = rtrng.ray_uniforms(
            ray_keys, 4, n_draws, cfg.max_bounces
        )
        cam_draws = np.asarray(cam_jax, np.float64)
        bounce_draws = [
            np.asarray(bounce_jax[i], np.float64)
            for i in range(cfg.max_bounces)
        ]
        for p in range(h * w):
            i = p % w
            j = p // w
            u = (i + (cam_draws[0, p] - 0.5)) / (w - 1)
            v = (j + (cam_draws[1, p] - 0.5)) / (h - 1)
            dx = (cam_draws[2, p] - 0.5) * cfg.aperture_x
            dy = (cam_draws[3, p] - 0.5) * cfg.aperture_y
            # camera.h:42-54
            direction = lower_left + u * horizontal + v * vertical - origin
            destination = origin + direction * cfg.focus_distance
            new_origin = origin + np.array([dx, dy, 0.0])
            rd = norm(destination - new_origin)
            draws_p = [bounce_draws[b][:, p] for b in range(cfg.max_bounces)]
            r_, a_, n_ = tracer(oscene, new_origin.copy(), rd, cfg, draws_p)
            rad[p] += r_
            alb[p] += a_
            nrm[p] += n_

    return rad, alb, nrm
