"""Pallas megakernel: the ENTIRE bounce loop for sphere + triangle scenes.

The triangle-scene counterpart of kernels/trace_spheres.py — the
reference's flagship workloads are textured OBJ meshes
(/root/reference/main.c:361-374, triangle.hu) and round 1 left them
13-86x below the sphere path, bounded by per-bounce HBM round-trips:
dense (B, T) distance matrices (+argmin), a 25-channel winner row-gather
and an atlas row-gather per bounce. Here everything happens in one
kernel launch per ray tile:

  * closest-hit: spheres (static unroll) then triangles in
    CULL_CHUNK-wide chunks behind a per-chunk AABB slab cull (hit_BBox,
    /root/reference/triangle.hu:42-59, generalized per chunk). The hot
    loop carries ONLY (best_t, best_idx); the winner's 19 data channels
    (vertices, normal, UVs, material) are recovered after the loop by a
    one-hot MXU contraction against a VMEM copy of the triangle table —
    the distance matrix and the winner row-gather never exist.
  * texturing: nearest-texel fetch (tri_uvmapping, texture.h:44-69)
    computed in-kernel over the texture-ROW space: rays relay to the
    lane dim (1, rows*128) and ONE unconditional MXU contraction
    out(4*atlas_w, rays) = A(4*atlas_w, texrows) @ onehot(texrows, rays)
    pulls every x-position of each ray's winner row
    (texrow = tex_y + atlas_h * mat); a sublane mask-reduce
    (iota % atlas_w == tex_x) then picks the texel. Measured
    (tools/probe_texrow.py, mcworld shape): 1.3 ns/ray vs 48 for the
    per-texel-chunk scheme this replaces — the fetch no longer
    dominates, so many-tile scenes (mcworld: 176 texture rows) run
    in-kernel instead of falling back to the scan path.
  * both one-hot contractions are exact and run as a SINGLE default-
    precision bf16 MXU pass: the A operands are pre-split into three
    stacked bf16 limbs (_limb3) and the three output slabs summed —
    the same decomposition XLA's HIGHEST f32 matmul uses, minus the
    six passes a one-hot B makes irrelevant. Texels and winner channels
    match jnp.take bit-for-bit (tests/test_mesh_megakernel.py).
  * the full bounce-state (origin, direction, throughput, radiance,
    AOVs, alive mask, medium IOR) stays in registers/VMEM across all
    bounces; a bounce whose tile has no live rays is skipped entirely
    (lax.cond) — fixed-depth semantics with early-out cost, something
    the XLA scan path cannot express.

Bit-exactness: every formula (Moller-Trumbore epsilons, area-ratio
barycentrics texture.h:16-27, fmod UV wrap, texel indexing, the x1.3
double-multiply quirk, reduced pile.h medium scalar, HSL boost) is
op-for-op the scan path's (integrator/path.py, integrator/hit.py,
materials/texture.py), applied to the same f32 values in the same
order, so outputs are bit-identical to the scan integrator whenever
both lower through one backend — which is what the interpret-mode
tests compare (tests/test_mesh_megakernel.py). On hardware, Mosaic
and XLA:TPU make different FMA-contraction choices for the SAME
chained arithmetic (tools/probe_bitexact.py), so compiled kernel and
scan renders agree to ulps — exactly on most pixels, with knife-edge
branch flips on a small fraction in deep-refraction scenes (measured
0.4-2.7% at 4-19 bounces, tools/probe_deep_bounce.py).

Scope: spheres <= 64, 1..2048 triangles, materials <= 64, optional
texture atlas, refraction/cutout/HSL/bright-boost, equirect sky (slot
scheme below), AO off (that falls back to the scan path; render()
dispatches automatically). Gradients run the backward megakernel
(kernels/trace_scene_bwd) to 16 bounces, the index-replay scan path
beyond.

Equirect sky: the kernel records one sky-hit slot per ray — throughput
scale + unit hit direction (Mosaic has no acos/atan2 lowering, so the
UV chain runs OUTSIDE in trace_spheres.compose_sky, op-for-op the scan
path's sky_emission) — exact under the black-diffuse pure-emitter
convention raytpu.config enforces.

Rectangle fast path: when the scene loader detected coplanar triangle
pairs (geometry/quads.py; cfg.quad_pairs, gated by cfg.merge_quads),
the per-triangle loop is replaced by one parallelogram test per pair
plus a leftover-triangle loop, both division-free (fraction-ranked
candidates, one divide per ray per bounce); axis-aligned rects/tris —
the overwhelming majority on block-world exports — take cheaper
per-(normal-axis, sign) grouped flat loops whose candidates share the
plane-normalized denominator (~26 VPU ops per ray-rect vs ~60).
Winner indices remain original triangle indices, so extraction/
shading/backward are untouched; validated by allclose +
winner-agreement (tests/test_quad_merge.py), not bit-identity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytpu.core.types import RenderConfig, Scene
from raytpu.core.vec3 import Vec3
from raytpu.geometry.triangle import TriangleGeom, precompute
from raytpu.kernels._common import BIG, LANE, pad_prims, pad_rows
from raytpu.kernels.trace_spheres import _sky_statics

import os as _os

# rays per grid step = rows*128. Measured on v5e at the BASELINE bench
# shapes (1000x750x64 / 1200x900x32), Grays/s by tile_rows:
#   pyramide (5 tris, untextured):   8->0.46  16->0.59  32->0.69  64->0.70
#   grass_block (12 tris, 48-wide):  8->0.33  16->0.40  32->0.44  64->0.40
#   mcworld (606 tris, 16-wide):              32->0.10  64->0.10  128->OOM
# Big tiles amortize the ~540ns taken-branch cost of the per-chunk cull
# conds over more rays; the exception is WIDE atlases (grass_block's
# collapsed 48x64), where the texture-row fetch materializes a
# (4*atlas_w, tile_rows*128) MXU output per bounce — at 64 rows that
# spills past what the compiler double-buffers, so 32 wins. 128 rows
# exceeds the 16MB scoped-VMEM stack for 606-tri scenes (measured OOM).
# The env var overrides for probes.
ROWS_BIG = 64
ROWS_WIDE_ATLAS = 32
WIDE_ATLAS_W4 = 128      # 4*atlas_w above this -> ROWS_WIDE_ATLAS


def _pick_rows(n_tris: int, atlas_w4: int = 0, index_bounces: int = 0) -> int:
    env = _os.environ.get("RAYTPU_MK_ROWS")
    if env:
        return int(env)
    rows = ROWS_WIDE_ATLAS if atlas_w4 > WIDE_ATLAS_W4 else ROWS_BIG
    # the with_indices forward adds a (bounces, rows, LANE) i32 VMEM
    # output (~0.5KB per bounce per row) that the measured tile policy
    # above did not include; shrink the tile until that buffer stays
    # under ~256KB so deep-bounce grad runs (19-bounce refraction) can't
    # overflow VMEM on real TPU (ADVICE r2 finding)
    while index_bounces * rows * LANE * 4 > 256 * 1024 and rows > 8:
        rows //= 2
    return rows


# timing-only ablation knobs (comma list: ext,tex,tri,shade) — output is
# WRONG with any set; used by tools/bench_mesh_kernel.py bisection
_ABLATE = set(
    s for s in _os.environ.get("RAYTPU_MK_ABLATE", "").split(",") if s
)
MAX_TRIS = 2048     # SMEM budget: 25 ch x 2048 x 4B = 200KB (v5e probe
                    # accepted >= 256KB; spheres/boxes/mats add ~10KB)
MAX_MATS = 64
_NO_CULL = bool(int(_os.environ.get("RAYTPU_MK_NO_CULL", "0")))  # probe knob
CULL_CHUNK = int(_os.environ.get("RAYTPU_MK_CULL_CHUNK", "32"))
                    # triangles per cull AABB: finer boxes exploit the
                    # Morton ordering (geometry/morton.py) — a skipped
                    # chunk saves ~40*CULL_CHUNK vector ops for ~25
EXT_CHUNK = 128     # winner-extraction one-hot tile (lane dim of the
                    # VMEM tri table consumed per MXU contraction step)
SMALL_EXT_TRIS = 16  # at or under this, winner extraction runs as an
                    # SMEM select-chain instead of the one-hot MXU dot:
                    # the (EXT_CHUNK, n) one-hot BUILD alone costs more
                    # per lane than 19*T wheres (measured r5: pyramide
                    # fwd 1.01 -> 1.11 Grays/s)
# winner-extraction channel layout (pack_scene): 19 rows per limb
#   0-2 a | 3-5 n | 6-8 b | 9-11 c | 12-17 ua va ub vb uc vc | 18 mat
EXT_NR = 19
# texture-row fetch bounds: the A operand is (4*atlas_w, texrows) f32 in
# VMEM and the per-bounce onehot materializes (texrows_pad, 1024) f32, so
# cap both dims (mcworld: 64 x 256 = 64KB; grass_block's 1440x1920 PNG
# would need 5760 sublanes -> scan path, whose XLA row-gather handles
# big atlases fine)
MAX_TEX_W4 = 256
MAX_TEX_ROWS = 512


def supported(scene: Scene, cfg: RenderConfig) -> bool:
    """Mesh-megakernel eligibility; render() falls back to the scan path
    (or the sphere megakernel) otherwise.

    Texture bound: the texture-row one-hot fetch (module docstring)
    needs 4*atlas_w MXU output rows and a (texrows, rays) onehot in
    VMEM; scenes over the caps (big single PNGs like grass_block) run
    the scan path. All-16x16-tile scenes (mcworld, caverne, pyramide)
    and untextured meshes stay in-kernel.
    """
    n_tex = scene.atlas.alpha.shape[0]
    w = max(scene.atlas.width, 1)
    return (
        scene.triangles.count > 0
        and scene.triangles.count <= MAX_TRIS
        and scene.spheres.count <= 64
        # equirect sky runs in-kernel via the slot scheme (unit hit
        # direction + throughput scale per ray, composed outside by a
        # row gather) — the index just has to name a real sphere
        and (scene.sky_sphere_index < 0
             or scene.sky_sphere_index < scene.spheres.count)
        # AO runs in-kernel since round 5 (hemisphere any-hit probes
        # against spheres + the per-triangle table; main.c:316's
        # mesh+AO is the reference's feature-complete CPU path)
        # the in-kernel fetch is nearest-texel (texture.h:61-69); the
        # bilinear differentiable-filtering mode takes the scan path
        and not (n_tex > 0 and cfg.bilinear_textures)
        and scene.mat_table.emission_strength.shape[0] <= MAX_MATS
        and 4 * w <= MAX_TEX_W4
        and -(-n_tex // w) <= MAX_TEX_ROWS
    )


def unsupported_reasons(scene: Scene, cfg: RenderConfig) -> list[str]:
    """Human-readable failed gates, kept in sync with supported() above —
    surfaced by render()'s fallback log (a silent drop to the scan path
    costs up to ~6x throughput; VERDICT r2 weak #7)."""
    n_tex = scene.atlas.alpha.shape[0]
    w = max(scene.atlas.width, 1)
    r = []
    if scene.triangles.count == 0:
        r.append("no triangles (sphere kernel territory)")
    if scene.triangles.count > MAX_TRIS:
        r.append(f"{scene.triangles.count} triangles > {MAX_TRIS}")
    if scene.spheres.count > 64:
        r.append(f"{scene.spheres.count} spheres > 64")
    if scene.sky_sphere_index >= scene.spheres.count:
        r.append("sky_sphere_index out of range")
    if n_tex > 0 and cfg.bilinear_textures:
        r.append("bilinear texture filtering")
    if scene.mat_table.emission_strength.shape[0] > MAX_MATS:
        r.append(f"{scene.mat_table.emission_strength.shape[0]} materials > {MAX_MATS}")
    if 4 * w > MAX_TEX_W4:
        r.append(f"atlas width {w} > {MAX_TEX_W4 // 4} (texture-row fetch bound)")
    if -(-n_tex // w) > MAX_TEX_ROWS:
        r.append(f"{-(-n_tex // w)} texture rows > {MAX_TEX_ROWS}")
    return r


def shade_bounce(
    i,
    carry,
    did_hit,
    px, py, pz,
    nX, nY, nZ,
    dfx, dfy, dfz,
    emx, emy, emz,
    estr, refl, alpha, ior,
    u_d, v_d, roulette,
    *,
    alpha_lo, alpha_hi, bright_boost, bright_threshold, hsl_l, hsl_s,
    with_masks=False, e_scale_mult=1.0, ao_factor=None,
):
    """One bounce's shading: everything AFTER the winner's (point, normal,
    material) is known — AOV base cases, emissive early return, scatter,
    refraction, cutout, accumulation (main.c:137-238). Bit-identical to
    kernels/trace_spheres.py / integrator/path.py (tests assert it).

    Shared by the forward megakernel (winner from the in-kernel search)
    and the backward replay kernel (trace_scene_bwd: winner extracted
    from the recorded index and recomputed differentiably), so the two
    apply op-for-op identical arithmetic — the property the grad-parity
    tests rely on.

    with_masks=True additionally returns the (emissive_ret, accum)
    branch masks — the equirect-sky slot bookkeeping in the forward
    kernel needs them (kernels/trace_spheres.py's take_e/take_a); the
    masks are locals either way, so the default call is unchanged.

    Ambient occlusion (main.c:94-116, 208-222): ``e_scale_mult`` is the
    static emission compensation ao_emission_factor * ao_intensity the
    AO mode applies to accumulated emission, and ``ao_factor`` is the
    per-ray occlusion plane hits/(samples*intensity) that multiplies the
    throughput update after the bright quirk (op-for-op the sphere
    megakernel / integrator.path ordering). The occlusion indicator sum
    is piecewise-constant in every scene parameter, so backward replays
    pass the RECORDED factor as a constant — gradient-exact vs the scan
    path, whose AD sees the same zero through the hit booleans.
    """
    (rox, roy, roz, rdx, rdy, rdz,
     rcx, rcy, rcz, ix, iy, iz,
     ax_, ay_, az_, nx_, ny_, nz_,
     active_f, is_alpha_f, alpha_depth, medium_n2) = carry
    f0 = jnp.zeros_like(rox)
    f1 = jnp.ones_like(rox)
    active = active_f > 0.0
    is_alpha = is_alpha_f > 0.0

    # ``i`` may be a static Python int (the forward kernel's unrolled
    # loop) or a traced scalar (the backward replay's lax.scan over
    # bounces) — the two produce bit-identical values: at bounce 0 every
    # lane is active, so where(active & (i==0), v, old) == v, and
    # aov_alpha is False at bounce 0 (is_alpha starts False), matching
    # the static skip. Mask application order follows integrator/path.py
    # (aov0 first, then aov_alpha).
    static_i = isinstance(i, int)
    if not static_i or i == 0:
        if static_i:
            ax_, ay_, az_ = dfx, dfy, dfz
            nx_, ny_, nz_ = nX, nY, nZ
        else:
            aov0 = active & (i == 0)
            ax_ = jnp.where(aov0, dfx, ax_)
            ay_ = jnp.where(aov0, dfy, ay_)
            az_ = jnp.where(aov0, dfz, az_)
            nx_ = jnp.where(aov0, nX, nx_)
            ny_ = jnp.where(aov0, nY, ny_)
            nz_ = jnp.where(aov0, nZ, nz_)
    if not static_i or i != 0:
        aov_alpha = active & (i == alpha_depth) & is_alpha
        em = estr > 0.0
        ax_ = jnp.where(aov_alpha, jnp.where(em, emx, dfx), ax_)
        ay_ = jnp.where(aov_alpha, jnp.where(em, emy, dfy), ay_)
        az_ = jnp.where(aov_alpha, jnp.where(em, emz, dfz), az_)
        nx_ = jnp.where(aov_alpha, nX, nx_)
        ny_ = jnp.where(aov_alpha, nY, ny_)
        nz_ = jnp.where(aov_alpha, nZ, nz_)
        is_alpha = is_alpha & ~aov_alpha
        is_alpha_f = jnp.where(is_alpha, f1, f0)

    emissive_ret = (
        active & did_hit & (i == alpha_depth) & (estr > 0.0)
    )
    if hsl_l == 1.0 and hsl_s == 1.0:
        bx, by, bz = emx, emy, emz
    else:
        from raytpu.core.color import hsl_boost
        from raytpu.core.vec3 import Vec3 as _V

        bb_ = hsl_boost(_V(emx, emy, emz), hsl_l, hsl_s)
        bx, by, bz = bb_.x, bb_.y, bb_.z
    ix = jnp.where(emissive_ret, bx, ix)
    iy = jnp.where(emissive_ret, by, iy)
    iz = jnp.where(emissive_ret, bz, iz)
    ax_ = jnp.where(emissive_ret, bx, ax_)
    ay_ = jnp.where(emissive_ret, by, ay_)
    az_ = jnp.where(emissive_ret, bz, az_)
    nx_ = jnp.where(emissive_ret, nX, nx_)
    ny_ = jnp.where(emissive_ret, nY, ny_)
    nz_ = jnp.where(emissive_ret, nZ, nz_)
    active = active & ~emissive_ret

    live = active & did_hit

    theta = (2.0 * jnp.float32(jnp.pi)) * u_d
    cph = jnp.clip(2.0 * v_d - 1.0, -1.0, 1.0)
    sph_ = jnp.sqrt(jnp.maximum(1.0 - cph * cph, 0.0))
    rux = jnp.cos(theta) * sph_
    ruy = jnp.sin(theta) * sph_
    ruz = cph
    ddx, ddy, ddz = nX + rux, nY + ruy, nZ + ruz
    dn2 = ddx * ddx + ddy * ddy + ddz * ddz
    dinv = jnp.where(dn2 > 0, 1.0 / jnp.sqrt(jnp.maximum(dn2, 1e-38)), 0.0)
    ddx, ddy, ddz = ddx * dinv, ddy * dinv, ddz * dinv
    vdn = rdx * nX + rdy * nY + rdz * nZ
    rfx = rdx - 2.0 * vdn * nX
    rfy = rdy - 2.0 * vdn * nY
    rfz = rdz - 2.0 * vdn * nZ
    drx = ddx + (rfx - ddx) * refl
    dry = ddy + (rfy - ddy) * refl
    drz = ddz + (rfz - ddz) * refl

    refr_case = live & (alpha <= alpha_hi) & (alpha >= alpha_lo)
    exiting = vdn > 0.0
    nex = jnp.where(exiting, -nX, nX)
    ney = jnp.where(exiting, -nY, nY)
    nez = jnp.where(exiting, -nZ, nZ)
    n1_ = jnp.where(exiting, ior, medium_n2)
    n2_ = jnp.where(exiting, medium_n2, ior)
    medium_n2 = jnp.where(refr_case & ~exiting, ior, medium_n2)
    n1s = n1_ * n1_
    n2s_ = n2_ * n2_
    # select-based floor, NOT jnp.maximum: non-refractive materials carry
    # ior == 0, so n2s_ == 0 exactly on their lanes, and the div VJP's
    # d_y = -g * x / y^2 computes x/y^2 = inf there; with the cotangent g
    # zeroed by the refr_case selects that discard ref* on those lanes,
    # Mosaic's op order materializes 0 * inf = NaN (XLA's happened not
    # to — compiled-TPU grads NaN'd while interpret passed). The select
    # cuts the chain with an exact 0. Guarded lanes' ratio value changes
    # (n1s instead of 1e6) but is discarded by the same selects;
    # refracting lanes (n2s_ > 1e-20) are bit-identical.
    n2s_safe = jnp.where(n2s_ > 1e-20, n2s_, 1.0)
    ratio = jnp.clip(n1s / n2s_safe, 0.0, 1e6)
    ndotv = nex * rdx + ney * rdy + nez * rdz
    radical = 1.0 - (ratio * ratio) * (1.0 - ndotv * ndotv)
    ct_scale = rdx * nex + rdy * ney + rdz * nez
    tanx = (rdx - nex * ct_scale) * ratio
    tany = (rdy - ney * ct_scale) * ratio
    tanz = (rdz - nez * ct_scale) * ratio
    sqr = jnp.sqrt(jnp.maximum(radical, 1e-20))
    refx = tanx - nex * sqr
    refy = tany - ney * sqr
    refz = tanz - nez * sqr
    vdne = rdx * nex + rdy * ney + rdz * nez
    mrx = rdx - 2.0 * vdne * nex
    mry = rdy - 2.0 * vdne * ney
    mrz = rdz - 2.0 * vdne * nez
    tir = radical <= 0.0
    refx = jnp.where(tir, mrx, refx)
    refy = jnp.where(tir, mry, refy)
    refz = jnp.where(tir, mrz, refz)
    do_refract = refr_case & (roulette > alpha)

    cutout = live & (alpha < alpha_lo)
    opaque = live & (alpha > alpha_hi)
    is_alpha_f = jnp.where(opaque, f0, is_alpha_f)
    is_alpha_f = jnp.where(cutout, f1, is_alpha_f)
    alpha_depth = jnp.where(cutout, alpha_depth + 1, alpha_depth)

    use_dr = live & ~do_refract & ~cutout
    rox = jnp.where(live, px, rox)
    roy = jnp.where(live, py, roy)
    roz = jnp.where(live, pz, roz)
    rdx = jnp.where(do_refract, refx, jnp.where(use_dr, drx, rdx))
    rdy = jnp.where(do_refract, refy, jnp.where(use_dr, dry, rdy))
    rdz = jnp.where(do_refract, refz, jnp.where(use_dr, drz, rdz))

    accum = live & ~do_refract & ~cutout
    e_scale = estr if e_scale_mult == 1.0 else estr * e_scale_mult
    ix = jnp.where(accum, ix + emx * e_scale * rcx, ix)
    iy = jnp.where(accum, iy + emy * e_scale * rcy, iy)
    iz = jnp.where(accum, iz + emz * e_scale * rcz, iz)
    bright = (
        (rcx > bright_threshold)
        | (rcy > bright_threshold)
        | (rcz > bright_threshold)
    )
    nbx = jnp.where(bright, dfx * (dfx * (rcx * bright_boost)), dfx * rcx)
    nby = jnp.where(bright, dfy * (dfy * (rcy * bright_boost)), dfy * rcy)
    nbz = jnp.where(bright, dfz * (dfz * (rcz * bright_boost)), dfz * rcz)
    if ao_factor is not None:
        nbx = nbx * ao_factor
        nby = nby * ao_factor
        nbz = nbz * ao_factor
    rcx = jnp.where(accum, nbx, rcx)
    rcy = jnp.where(accum, nby, rcy)
    rcz = jnp.where(accum, nbz, rcz)

    active_f = jnp.where(active & did_hit, f1, f0)

    out = (rox, roy, roz, rdx, rdy, rdz, rcx, rcy, rcz, ix, iy, iz,
           ax_, ay_, az_, nx_, ny_, nz_,
           active_f, is_alpha_f, alpha_depth, medium_n2)
    if with_masks:
        return out, emissive_ret, accum
    return out


def _kernel(
    sph_ref,      # SMEM (14, S_pad): cx cy cz r | dif3 emi3 estr refl alpha ior
    tri_ref,      # SMEM (25, T_pad): a3 ab3 ac3 n3 b3 c3 ua va ub vb uc vc mat
    trivm_ref,    # VMEM (32, T_pad): same rows (25..31 zero) for the
                  # winner-extraction MXU dot
    box_ref,      # SMEM (6, n_chunks): per-CULL_CHUNK AABB lo3 hi3
    mat_ref,      # SMEM (9, M_pad): em3 estr refl ior alpha_c use_c eft
    atlas_ref,    # VMEM (w4_pad, r_pad): A[ch*atlas_w + x, tex_y + h*mat]
    qtab_ref,     # SMEM (14, Q_pad): GENERAL rect a3 e1_3 e2_3 n3 i j
                  # (geometry/quads.py; i/j = the halves' tri indices, f32)
    qbox_ref,     # SMEM (6, q_chunks): per-chunk rect AABBs
    ltab_ref,     # SMEM (13, L_pad): general leftover tris
                  # a3 ab3 ac3 n3 origidx
    lbox_ref,     # SMEM (6, l_chunks)
    aatab_ref,    # SMEM (8, N): axis-aligned rects (pack_aa layout)
    aat3_ref,     # SMEM (9, L3): axis-aligned unpaired tris
    ox, oy, oz, dx, dy, dz,           # VMEM (ROWS, LANE) ray tiles
    draws_ref,                         # VMEM (BN*3, ROWS, LANE)
    inc_x, inc_y, inc_z, alb_x, alb_y, alb_z, nrm_x, nrm_y, nrm_z,
    *opt_refs,                         # sky on: 7 sky planes (skl3, unit
                                       # direction 3, early); then
                                       # with_indices: (BN, ROWS, LANE) i32
    n_spheres, n_tris, n_mats, has_atlas, atlas_w,
    atlas_h, bounces, sphere_eps, det_eps, tri_eps, alpha_lo, alpha_hi,
    bright_boost, bright_threshold, n_draws, hsl_l, hsl_s, tex_limbs,
    with_indices, n_quads, n_leftover, aa_layout, sky_idx, sky_w, sky_h,
    use_ao, ao_samples, ao_intensity, ao_emission_factor,
):
    f0 = jnp.zeros(ox.shape, jnp.float32)
    f1 = jnp.ones(ox.shape, jnp.float32)
    i0 = jnp.zeros(ox.shape, jnp.int32)
    n_chunks = box_ref.shape[1]
    # merged mode (aa_layout is a tuple, possibly all-zero counts):
    # candidates rank as fractions and the per-triangle loop is replaced
    # by aa-group + general-quad + general-leftover loops
    use_merged = aa_layout is not None
    e_scale_mult = ao_emission_factor * ao_intensity if use_ao else 1.0
    if sky_idx >= 0:
        sky_out, idx_ref_opt = opt_refs[:7], opt_refs[7:]
    else:
        sky_out, idx_ref_opt = (), opt_refs
    if with_indices and use_ao:
        idx_ref_opt, aof_ref_opt = idx_ref_opt[:1], idx_ref_opt[1:]

    # carry tuple: 22 base planes (see unpack in bounce_body) + 8 sky
    # planes when the scene has an equirect sky (same slot scheme as
    # kernels/trace_spheres._forward_body: throughput scale 3, unit hit
    # direction 3, early flag, slot-taken flag)
    carry = (
        ox[:], oy[:], oz[:], dx[:], dy[:], dz[:],   # ray
        f1, f1, f1,                                  # throughput
        f0, f0, f0,                                  # incoming radiance
        f0, f0, f0, f0, f0, f0,                      # albedo + normal AOVs
        f1, f0, i0, f1,                              # active, is_alpha, alpha_depth, medium_n2
    )
    if sky_idx >= 0:
        carry = carry + (f0, f0, f0, f0, f0, f0, f0, f0)

    def bounce_body(i, state):
        carry, sky_state = state[:22], state[22:]
        (rox, roy, roz, rdx, rdy, rdz,
         rcx, rcy, rcz, ix, iy, iz,
         ax_, ay_, az_, nx_, ny_, nz_,
         active_f, is_alpha_f, alpha_depth, medium_n2) = carry
        active = active_f > 0.0
        is_alpha = is_alpha_f > 0.0

        a_quad = rdx * rdx + rdy * rdy + rdz * rdz
        inv_2a = 0.5 / jnp.maximum(a_quad, 1e-20)
        best = jnp.full(ox.shape, BIG, jnp.float32)
        bidx = jnp.full(ox.shape, -1, jnp.int32)
        # quad mode ranks candidates as positive fractions t = num/den
        # (den = det > 0 for rects/tris, 1 for spheres): num_a*den_b <
        # num_b*den_a replaces the per-primitive division entirely — one
        # division per ray per bounce at the end instead of one per
        # (ray, primitive) pair
        best_den = f1

        # ---- spheres (main.c:52-92; scanned before triangles) --------
        for s in range(n_spheres):
            cx, cy, cz, r = (
                sph_ref[0, s], sph_ref[1, s], sph_ref[2, s], sph_ref[3, s]
            )
            ocx, ocy, ocz = rox - cx, roy - cy, roz - cz
            b_ = 2.0 * (ocx * rdx + ocy * rdy + ocz * rdz)
            c_ = ocx * ocx + ocy * ocy + ocz * ocz - r * r
            disc = b_ * b_ - 4.0 * a_quad * c_
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            t1 = (-b_ - sq) * inv_2a
            t2 = (-b_ + sq) * inv_2a
            hit_s = disc > 0.0
            t = jnp.where(
                hit_s & (t1 >= sphere_eps), t1,
                jnp.where(hit_s & (t2 >= sphere_eps), t2, BIG),
            )
            if use_merged:
                better = t * best_den < best
                best_den = jnp.where(better, f1, best_den)
            else:
                better = t < best
            best = jnp.where(better, t, best)
            bidx = jnp.where(better, s, bidx)

        # ---- triangles: chunked-AABB cull, (best, idx)-only carry ----
        # the hot loop carries ONLY the running winner (t, index); the
        # winner's 19 data channels are extracted after the loop by a
        # one-hot MXU contraction against the VMEM tri table (below) —
        # ~40 ops/triangle instead of ~60+19 selects

        def tri_body(t_i, win):
            best, bidx = win
            ax, ay, az = tri_ref[0, t_i], tri_ref[1, t_i], tri_ref[2, t_i]
            abx, aby, abz = tri_ref[3, t_i], tri_ref[4, t_i], tri_ref[5, t_i]
            acx, acy, acz = tri_ref[6, t_i], tri_ref[7, t_i], tri_ref[8, t_i]
            nx, ny, nz = tri_ref[9, t_i], tri_ref[10, t_i], tri_ref[11, t_i]

            aox, aoy, aoz = rox - ax, roy - ay, roz - az
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
                (det >= det_eps) & (dst >= tri_eps)
                & (u >= tri_eps) & (v >= tri_eps) & (w >= tri_eps)
            )
            t = jnp.where(valid, dst, BIG)
            better = t < best
            return (
                jnp.where(better, t, best),
                jnp.where(better, n_spheres + t_i, bidx),
            )

        inv_dx = 1.0 / rdx
        inv_dy = 1.0 / rdy
        inv_dz = 1.0 / rdz

        def slab(box_r, c):
            lo_x, lo_y, lo_z = box_r[0, c], box_r[1, c], box_r[2, c]
            hi_x, hi_y, hi_z = box_r[3, c], box_r[4, c], box_r[5, c]
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
            return tmin, tmax

        def chunk_body(c, win):
            tmin, tmax = slab(box_ref, c)
            # only live rays can keep a chunk's triangle loop alive, and
            # only if the chunk could still IMPROVE a winner: any hit in
            # the box has t >= tmin (the hit point lies inside the box),
            # and `better` needs t < best, so tmin >= best prunes safely
            best, _ = win
            enter = jnp.any(
                (tmax >= tmin) & (tmax >= 0.0) & active & (tmin < best)
            )
            if _NO_CULL:
                enter = jnp.any(active)

            def run(win):
                def body(j, win):
                    return tri_body(c * CULL_CHUNK + j, win)

                return jax.lax.fori_loop(0, CULL_CHUNK, body, win)

            return jax.lax.cond(enter, run, lambda w: w, win)

        # ---- rectangle fast path (geometry/quads.py) ------------------
        # block-world meshes triangulate every rectangular face into two
        # coplanar halves sharing a diagonal (the reference's flagship
        # mcworld scene, /root/reference/model3D/RTX_MAP); one
        # parallelogram test replaces both triangle tests. Candidates
        # rank DIVISION-FREE as positive fractions t = num/den (den =
        # det > 0 for rects/leftovers, 1 for spheres): validity compares
        # scaled barycentrics against tri_eps*det, the running winner
        # compares num_a*den_b < num_b*den_a, and ONE division per ray
        # per bounce recovers t at the end. Rounding therefore differs
        # from the per-triangle loop in the last ulp — the quad path is
        # allclose + winner-agreement tested (tests/test_quad_merge.py),
        # never bit-identity (merge_quads=False restores that).

        def quad_body(q_i, win):
            best, bden, bidx = win
            ax, ay, az = qtab_ref[0, q_i], qtab_ref[1, q_i], qtab_ref[2, q_i]
            e1x, e1y, e1z = qtab_ref[3, q_i], qtab_ref[4, q_i], qtab_ref[5, q_i]
            e2x, e2y, e2z = qtab_ref[6, q_i], qtab_ref[7, q_i], qtab_ref[8, q_i]
            nx, ny, nz = qtab_ref[9, q_i], qtab_ref[10, q_i], qtab_ref[11, q_i]
            aox, aoy, aoz = rox - ax, roy - ay, roz - az
            daox = aoy * rdz - aoz * rdy
            daoy = aoz * rdx - aox * rdz
            daoz = aox * rdy - aoy * rdx
            det = -(rdx * nx + rdy * ny + rdz * nz)
            num = aox * nx + aoy * ny + aoz * nz          # t * det
            pu = e2x * daox + e2y * daoy + e2z * daoz           # alpha * det
            pv = -(e1x * daox + e1y * daoy + e1z * daoz)        # beta * det
            lo = tri_eps * det
            hi = (1.0 - tri_eps) * det
            # validity = the unit square in parallelogram coords: the
            # union of the two halves' barycentric tests plus the
            # ~tri_eps-wide crack the reference leaves along the shared
            # diagonal (each half demands its own w >= tri_eps)
            valid = (
                (det >= det_eps) & (num >= lo)
                & (pu >= lo) & (pv >= lo) & (pu <= hi) & (pv <= hi)
            )
            num_c = jnp.where(valid, num, BIG)
            den_c = jnp.where(valid, det, 1.0)
            # winning half: triangle i spans alpha + beta <= 1
            win_i = jnp.where(
                pu + pv <= det, qtab_ref[12, q_i], qtab_ref[13, q_i]
            ).astype(jnp.int32)
            better = num_c * bden < best * den_c
            return (
                jnp.where(better, num_c, best),
                jnp.where(better, den_c, bden),
                jnp.where(better, n_spheres + win_i, bidx),
            )

        def left_body(l_i, win):
            best, bden, bidx = win
            ax, ay, az = ltab_ref[0, l_i], ltab_ref[1, l_i], ltab_ref[2, l_i]
            abx, aby, abz = ltab_ref[3, l_i], ltab_ref[4, l_i], ltab_ref[5, l_i]
            acx, acy, acz = ltab_ref[6, l_i], ltab_ref[7, l_i], ltab_ref[8, l_i]
            nx, ny, nz = ltab_ref[9, l_i], ltab_ref[10, l_i], ltab_ref[11, l_i]
            aox, aoy, aoz = rox - ax, roy - ay, roz - az
            daox = aoy * rdz - aoz * rdy
            daoy = aoz * rdx - aox * rdz
            daoz = aox * rdy - aoy * rdx
            det = -(rdx * nx + rdy * ny + rdz * nz)
            num = aox * nx + aoy * ny + aoz * nz
            pu = acx * daox + acy * daoy + acz * daoz
            pv = -(abx * daox + aby * daoy + abz * daoz)
            lo = tri_eps * det
            valid = (
                (det >= det_eps) & (num >= lo) & (pu >= lo) & (pv >= lo)
                & (pu + pv <= (1.0 - tri_eps) * det)      # w >= tri_eps
            )
            num_c = jnp.where(valid, num, BIG)
            den_c = jnp.where(valid, det, 1.0)
            oidx = ltab_ref[12, l_i].astype(jnp.int32)
            better = num_c * bden < best * den_c
            return (
                jnp.where(better, num_c, best),
                jnp.where(better, den_c, bden),
                jnp.where(better, n_spheres + oidx, bidx),
            )

        def frac_cull_loop(box_r, body, win):
            def ch(c, win):
                tmin, tmax = slab(box_r, c)
                best, bden, _ = win
                # fraction-ranked prune: tmin >= best/bden (bden > 0)
                enter = jnp.any(
                    (tmax >= tmin) & (tmax >= 0.0) & active
                    & (tmin * bden < best)
                )
                if _NO_CULL:
                    enter = jnp.any(active)

                def run(w):
                    return jax.lax.fori_loop(
                        0, CULL_CHUNK,
                        lambda j, w2: body(c * CULL_CHUNK + j, w2), w,
                    )

                return jax.lax.cond(enter, run, lambda w: w, win)

            return jax.lax.fori_loop(0, box_r.shape[1], ch, win)

        if use_merged:
            if "tri" not in _ABLATE:
                # ---- axis-aligned groups (flat loops, no culls — the
                # measured chunk-cull benefit on block worlds is ~0 while
                # its cond overhead is real). All candidates in a (k, s)
                # group share denominator detg = -s*d_k, so within-group
                # ranking compares numerators directly and one fraction
                # merge per group joins the global winner.
                ro3 = (rox, roy, roz)
                rd3 = (rdx, rdy, rdz)
                r_off = t_off = 0
                for (kx, sgn, cnt_a, cnt_b, cnt_t) in aa_layout:
                    if cnt_a + cnt_b + cnt_t == 0:
                        continue
                    i1, i2 = [a_ for a_ in range(3) if a_ != kx]
                    detg = -rd3[kx] if sgn > 0 else rd3[kx]
                    so_k = ro3[kx] if sgn > 0 else -ro3[kx]
                    epsd = tri_eps * detg
                    hid = (1.0 - tri_eps) * detg
                    X1 = ro3[i1] * detg
                    X2 = ro3[i2] * detg
                    d1, d2 = rd3[i1], rd3[i2]

                    def rect_aa(Xm, dm, Xo, do_):
                        def body(q, wing):
                            bg, gi = wing
                            numr = so_k - aatab_ref[0, q]
                            pug = (
                                Xm - aatab_ref[2, q] * detg + numr * dm
                            ) * aatab_ref[3, q]
                            pvg = (
                                Xo - aatab_ref[4, q] * detg + numr * do_
                            ) * aatab_ref[5, q]
                            valid = (
                                (detg >= aatab_ref[1, q])
                                & (jnp.minimum(
                                    numr, jnp.minimum(pug, pvg)) >= epsd)
                                & (jnp.maximum(pug, pvg) <= hid)
                            )
                            num_c = jnp.where(valid, numr, BIG)
                            # winning half: triangle i spans alpha+beta<=1
                            win = jnp.where(
                                pug + pvg <= detg,
                                aatab_ref[6, q], aatab_ref[7, q],
                            ).astype(jnp.int32)
                            better = num_c < bg
                            return (
                                jnp.where(better, num_c, bg),
                                jnp.where(better, win, gi),
                            )
                        return body

                    def tri_aa(q, wing):
                        bg, gi = wing
                        numr = so_k - aat3_ref[0, q]
                        P1 = X1 - aat3_ref[2, q] * detg + numr * d1
                        P2 = X2 - aat3_ref[3, q] * detg + numr * d2
                        ug = P1 * aat3_ref[4, q] + P2 * aat3_ref[5, q]
                        vg = P1 * aat3_ref[6, q] + P2 * aat3_ref[7, q]
                        valid = (
                            (detg >= aat3_ref[1, q])
                            & (jnp.minimum(numr, jnp.minimum(ug, vg)) >= epsd)
                            & (ug + vg <= hid)       # w >= tri_eps
                        )
                        num_c = jnp.where(valid, numr, BIG)
                        win = aat3_ref[8, q].astype(jnp.int32)
                        better = num_c < bg
                        return (
                            jnp.where(better, num_c, bg),
                            jnp.where(better, win, gi),
                        )

                    wing = (
                        jnp.full(ox.shape, BIG, jnp.float32),
                        jnp.full(ox.shape, -1, jnp.int32),
                    )
                    if cnt_a:
                        wing = jax.lax.fori_loop(
                            r_off, r_off + cnt_a,
                            rect_aa(X1, d1, X2, d2), wing,
                        )
                    if cnt_b:
                        wing = jax.lax.fori_loop(
                            r_off + cnt_a, r_off + cnt_a + cnt_b,
                            rect_aa(X2, d2, X1, d1), wing,
                        )
                    if cnt_t:
                        wing = jax.lax.fori_loop(
                            t_off, t_off + cnt_t, tri_aa, wing,
                        )
                    r_off += cnt_a + cnt_b
                    t_off += cnt_t
                    bg, gi = wing
                    deng = jnp.where(detg > 0.0, detg, f1)
                    # the (bg < BIG) gate keeps the miss sentinel out of
                    # the fraction compare: with deng > 1 (non-unit ray
                    # directions make |d_k| > 1) BIG*best_den < BIG*deng
                    # would otherwise "win" with gi = -1 and fabricate a
                    # hit on sphere n_spheres-1
                    better = (bg < BIG) & (bg * best_den < best * deng)
                    best = jnp.where(better, bg, best)
                    best_den = jnp.where(better, deng, best_den)
                    bidx = jnp.where(better, n_spheres + gi, bidx)

                # general (non-aa) remainder: on the shipped block
                # worlds it is a handful of primitives (mcworld: 10
                # rects + 31 plant tris), so a flat loop beats paying a
                # ~540ns taken-cond per chunk per bounce; big general
                # sets keep the chunked culls
                win = (best, best_den, bidx)
                if n_quads > 0:
                    if n_quads <= 2 * CULL_CHUNK:
                        win = jax.lax.fori_loop(0, n_quads, quad_body, win)
                    else:
                        win = frac_cull_loop(qbox_ref, quad_body, win)
                if n_leftover > 0:
                    if n_leftover <= 2 * CULL_CHUNK:
                        win = jax.lax.fori_loop(
                            0, n_leftover, left_body, win
                        )
                    else:
                        win = frac_cull_loop(lbox_ref, left_body, win)
                best, best_den, bidx = win
            # the deferred division: one per (ray, bounce) instead of one
            # per (ray, primitive); misses keep BIG (den 1)
            best = best / best_den
        elif "tri" not in _ABLATE:
            best, bidx = jax.lax.fori_loop(
                0, n_chunks, chunk_body, (best, bidx)
            )

        if with_indices:
            # winner indices for the backward replay: live lanes record
            # their winner (-1 = miss); lanes whose bounce is over are
            # masked to -1 (miss), which the replay's active-mask gating
            # makes equivalent — an inactive lane never uses its index
            idx_ref_opt[0][i] = jnp.where(active, bidx, -1)

        # ---- winner extraction: one-hot MXU dot on the VMEM tri table.
        # Exact: single nonzero term per output, accumulated against
        # exact zeros (same argument as the texture fetch). The table is
        # pre-split into 3 bf16 limbs (pack_scene) so ONE default-
        # precision bf16 matmul per chunk replaces HIGHEST's 9 passes;
        # with a one-hot B only the A limbs contribute, so summing the
        # three limb slabs reconstructs the f32 winner bit-for-bit —
        # the same arithmetic HIGHEST performs, at a third the MACs.
        # Lanes whose winner is a sphere (or a miss) extract all-zero
        # channels; every downstream use is gated on tri_wins.
        n = ox.shape[0] * LANE
        t_pad = trivm_ref.shape[1]
        sel_flat = jnp.where(
            bidx >= n_spheres, bidx - n_spheres, -1
        ).reshape(1, n)

        # unconditional: a taken Mosaic cond costs ~540 ns (pipeline
        # refill, tools/probe_cond.py) and mesh tiles almost always have
        # a triangle winner, so a "skip if no winner" branch would cost
        # more than the dot it guards
        acc0 = jnp.zeros((trivm_ref.shape[0], n), jnp.float32)
        ext_iota = jax.lax.broadcasted_iota(jnp.int32, (EXT_CHUNK, n), 0)

        # NOTE two variants of a cheaper onehot were measured and
        # rejected on v5e (r4): a shared low-part onehot with per-chunk
        # high masks OOMs scoped VMEM at ROWS_BIG (+1.8MB past 16MB),
        # and running it at ROWS=32 loses more to the smaller tile than
        # the halved compares save (0.208 vs 0.222 Grays/s on mcworld).
        # The per-chunk transient below is the best VMEM-feasible form.
        def ext_chunk(c, acc):
            onehot = (ext_iota == sel_flat - c * EXT_CHUNK).astype(
                jnp.bfloat16
            )
            return acc + jnp.dot(
                trivm_ref[:, pl.ds(c * EXT_CHUNK, EXT_CHUNK)], onehot,
                preferred_element_type=jnp.float32,
            )

        if n_tris <= SMALL_EXT_TRIS and "ext" not in _ABLATE:
            # tiny meshes (pyramide: 5 tris): an SMEM select-chain over
            # the 19 consumed channels costs ~19*T wheres per lane —
            # less than the (EXT_CHUNK, n) one-hot BUILD alone (~2.5 ops
            # x 128 rows/lane), which the MXU dot needs regardless of
            # how few triangles exist. Values are the exact table rows
            # either way (the one-hot contraction is exact), so the two
            # forms are bit-identical. tri_ref row map: a 0-2, n 9-11,
            # b 12-14, c 15-17, uv 18-23, mat 24.
            _ROWS19 = (0, 1, 2, 9, 10, 11, 12, 13, 14, 15, 16, 17,
                       18, 19, 20, 21, 22, 23, 24)
            ch19 = [f0] * 19
            for t_i in range(n_tris):
                m = bidx == n_spheres + t_i
                for k, r_ in enumerate(_ROWS19):
                    ch19[k] = jnp.where(m, tri_ref[r_, t_i], ch19[k])
            (wax, way, waz, wnx, wny, wnz, wbx, wby, wbz,
             wcx, wcy, wcz, wua, wva, wub, wvb, wuc, wvc, wmat) = ch19
        else:
            if "ext" in _ABLATE:
                wout = acc0
            else:
                wout = jax.lax.fori_loop(
                    0, t_pad // EXT_CHUNK, ext_chunk, acc0
                )
            row = lambda j: (
                (wout[j : j + 1] + wout[EXT_NR + j : EXT_NR + j + 1])
                + wout[2 * EXT_NR + j : 2 * EXT_NR + j + 1]
            ).reshape(ox.shape)
            wax, way, waz = row(0), row(1), row(2)
            wnx, wny, wnz = row(3), row(4), row(5)
            wbx, wby, wbz = row(6), row(7), row(8)
            wcx, wcy, wcz = row(9), row(10), row(11)
            wua, wva, wub = row(12), row(13), row(14)
            wvb, wuc, wvc = row(15), row(16), row(17)
            wmat = row(18)

        did_hit = bidx >= 0
        tri_wins = bidx >= n_spheres
        safe_t = jnp.where(did_hit, best, 0.0)
        px = rox + rdx * safe_t
        py = roy + rdy * safe_t
        pz = roz + rdz * safe_t

        # ---- sphere winner channels (select-chain) --------------------
        ch = [f0] * 14
        for s in range(n_spheres):
            m = bidx == s
            for k in range(14):
                ch[k] = jnp.where(m, sph_ref[k, s], ch[k])
        (scx, scy, scz, sr, sdfx, sdfy, sdfz, semx, semy, semz,
         sestr, srefl, salpha, sior) = ch

        n2s = (px - scx) ** 2 + (py - scy) ** 2 + (pz - scz) ** 2
        s_inv = jnp.where(
            (n2s > 0) & did_hit & ~tri_wins,
            1.0 / jnp.sqrt(jnp.maximum(n2s, 1e-38)), 0.0,
        )
        snX = (px - scx) * s_inv
        snY = (py - scy) * s_inv
        snZ = (pz - scz) * s_inv

        # ---- triangle normal + barycentric UVs (texture.h:16-63) -----
        tn2 = wnx * wnx + wny * wny + wnz * wnz
        t_inv = jnp.where(tn2 > 0, 1.0 / jnp.sqrt(jnp.maximum(tn2, 1e-38)), 0.0)
        tnX, tnY, tnZ = wnx * t_inv, wny * t_inv, wnz * t_inv

        def area(px1, py1, pz1, qx, qy, qz):
            # normal . cross(p, q), matching geometry.triangle.barycentric
            cxx = py1 * qz - pz1 * qy
            cyy = pz1 * qx - px1 * qz
            czz = px1 * qy - py1 * qx
            return tnX * cxx + tnY * cyy + tnZ * czz

        area_abc = area(wbx - wax, wby - way, wbz - waz,
                        wcx - wax, wcy - way, wcz - waz)
        area_pbc = area(wbx - px, wby - py, wbz - pz,
                        wcx - px, wcy - py, wcz - pz)
        area_pca = area(wcx - px, wcy - py, wcz - pz,
                        wax - px, way - py, waz - pz)
        inv_area = 1.0 / jnp.where(jnp.abs(area_abc) > 1e-20, area_abc, 1.0)
        w_a = area_pbc * inv_area
        w_b = area_pca * inv_area
        w_c = 1.0 - w_a - w_b

        def wrap(u):
            u = u - jnp.trunc(u)          # == fmod(u, 1.0), exactly
            return jnp.where(u < 0.0, u + 1.0, u)

        uu = wrap(w_a * wua + w_b * wub + w_c * wuc)
        vv = wrap(w_a * wva + w_b * wvb + w_c * wvc)

        if has_atlas:
            # nearest-texel index (texture.h:61-69); texture-row one-hot
            # MXU fetch over the whole tile at once (module docstring;
            # measured in tools/probe_texrow.py). Lanes with no live
            # triangle hit get texrow -1: they match no row, so their
            # rgba comes out exactly 0.
            tex_x = jnp.clip(
                jnp.floor(uu * atlas_w).astype(jnp.int32), 0, atlas_w - 1
            )
            tex_y = jnp.clip(
                jnp.floor(vv * atlas_h).astype(jnp.int32), 0, atlas_h - 1
            )
            mat_i = wmat.astype(jnp.int32)
            n = ox.shape[0] * LANE
            texrow = jnp.where(
                active & tri_wins, tex_y + atlas_h * mat_i, -1
            ).reshape(1, n)
            flat_x = tex_x.reshape(1, n)
            r_pad = atlas_ref.shape[1]
            w4p = atlas_ref.shape[0] // tex_limbs       # rows per limb

            def tex_fetch(_):
                sub = jax.lax.broadcasted_iota(jnp.int32, (r_pad, n), 0)
                onehot = (sub == texrow).astype(jnp.bfloat16)
                # u8-exact atlases (tex_limbs == 1) carry integer texel
                # codes 0..255, exactly representable in bf16, so ONE
                # default-precision matmul selects them exactly and the
                # codes are rescaled by f32(1/255) after extraction —
                # the identical op the loader applied, hence bit-exact
                # (io/image.py quantization convention). General f32
                # atlases use 3 stacked bf16 limbs (pack_scene); the
                # matmul + 3-slab sum is exact for a one-hot contraction
                # (same argument as the winner extraction above).
                out3 = jnp.dot(
                    atlas_ref[:, :], onehot,
                    preferred_element_type=jnp.float32,
                )                                       # (limbs*w4p, n)
                if tex_limbs == 1:
                    out = out3
                else:
                    out = (out3[:w4p] + out3[w4p : 2 * w4p]) + out3[2 * w4p :]
                xsub = jax.lax.broadcasted_iota(jnp.int32, (w4p, n), 0)
                mask = (xsub % atlas_w == flat_x).astype(jnp.float32)
                prod = out * mask
                # per-channel x-reduce as ONE tiny MXU contraction
                # against a constant (8, w4p) channel selector — the
                # unrolled alternative (4*atlas_w single-sublane
                # slice-adds) halves grass_block's whole-kernel
                # throughput at atlas_w=48
                crow = jax.lax.broadcasted_iota(jnp.int32, (8, w4p), 0)
                cidx = jax.lax.broadcasted_iota(jnp.int32, (8, w4p), 1)
                sel = (
                    (cidx // atlas_w == crow) & (cidx < 4 * atlas_w)
                ).astype(jnp.float32)
                chan4 = jnp.dot(
                    sel, prod, preferred_element_type=jnp.float32
                )                                        # (8, n)
                if tex_limbs == 1:
                    chan4 = chan4 * jnp.float32(1.0 / 255.0)
                return tuple(
                    chan4[c : c + 1].reshape(ox.shape) for c in range(4)
                )

            # unconditional for the same reason as the winner extraction:
            # the skip branch would cost more than the fetch
            if "tex" in _ABLATE:
                trgb_x, trgb_y, trgb_z, t_alpha_tex = f0, f0, f0, f1
            else:
                trgb_x, trgb_y, trgb_z, t_alpha_tex = tex_fetch(0)
        else:
            # untextured mesh: constant default material (mesh.h:207)
            trgb_x = jnp.full(ox.shape, 0.784, jnp.float32)
            trgb_y = jnp.full(ox.shape, 0.965, jnp.float32)
            trgb_z = f1
            t_alpha_tex = f1

        # ---- material table (texture.h:71-88 as data) -----------------
        mt = [f0] * 9
        for mslot in range(n_mats):
            m = tri_wins & (wmat == jnp.float32(mslot))
            for k in range(9):
                mt[k] = jnp.where(m, mat_ref[k, mslot], mt[k])
        (temx, temy, temz, testr, trefl, tior, t_ac, t_uc, t_eft) = mt
        # texture-modulated emission (MatTable.emission_from_texture)
        temx = jnp.where(t_eft > 0.0, temx * trgb_x, temx)
        temy = jnp.where(t_eft > 0.0, temy * trgb_y, temy)
        temz = jnp.where(t_eft > 0.0, temz * trgb_z, temz)
        t_alpha = jnp.where(t_uc > 0.0, t_ac, t_alpha_tex)

        # ---- merge winner material + normal ---------------------------
        tsel = lambda t, s: jnp.where(tri_wins, t, s)
        dfx, dfy, dfz = tsel(trgb_x, sdfx), tsel(trgb_y, sdfy), tsel(trgb_z, sdfz)
        emx, emy, emz = tsel(temx, semx), tsel(temy, semy), tsel(temz, semz)
        estr = tsel(testr, sestr)
        refl = tsel(trefl, srefl)
        alpha = tsel(t_alpha, salpha)
        ior = tsel(tior, sior)
        nX, nY, nZ = tsel(tnX, snX), tsel(tnY, snY), tsel(tnZ, snZ)

        # ---- ambient occlusion probes (main.c:94-116, 316) ------------
        # hemisphere any-hit rays from the hit point against spheres AND
        # the per-triangle table (the same per-triangle validity rules
        # as integrator.hit.any_hit — NOT the merged-quad loops, whose
        # knife-edge rounding is only allclose; AO booleans must match
        # the scan path's). occlusion = hits/(samples*intensity)
        # multiplies the throughput after the bright quirk and the
        # emission compensation rides e_scale_mult (shade_bounce).
        ao_factor = None
        if use_ao:
            occ = f0
            for s_i in range(ao_samples):
                au = draws_ref[n_draws * i + 3 + 2 * s_i]
                av = draws_ref[n_draws * i + 4 + 2 * s_i]
                ath = (2.0 * jnp.float32(jnp.pi)) * au
                acp = jnp.clip(2.0 * av - 1.0, -1.0, 1.0)
                asp = jnp.sqrt(jnp.maximum(1.0 - acp * acp, 0.0))
                aox_ = nX + jnp.cos(ath) * asp
                aoy_ = nY + jnp.sin(ath) * asp
                aoz_ = nZ + acp
                an2 = aox_ * aox_ + aoy_ * aoy_ + aoz_ * aoz_
                ainv = jnp.where(
                    an2 > 0, 1.0 / jnp.sqrt(jnp.maximum(an2, 1e-38)), 0.0
                )
                aox_, aoy_, aoz_ = aox_ * ainv, aoy_ * ainv, aoz_ * ainv
                aq = aox_ * aox_ + aoy_ * aoy_ + aoz_ * aoz_
                ai2a = 0.5 / jnp.maximum(aq, 1e-20)
                # Mosaic cannot carry i1 vectors through cond/fori — the
                # occlusion flag rides as f32 0/1 (same workaround as
                # the bounce carry's active_f)
                occ_f = f0
                for s2 in range(n_spheres):
                    scx2, scy2, scz2, sr2 = (
                        sph_ref[0, s2], sph_ref[1, s2],
                        sph_ref[2, s2], sph_ref[3, s2],
                    )
                    ocx2, ocy2, ocz2 = px - scx2, py - scy2, pz - scz2
                    b2 = 2.0 * (ocx2 * aox_ + ocy2 * aoy_ + ocz2 * aoz_)
                    c2 = ocx2 * ocx2 + ocy2 * ocy2 + ocz2 * ocz2 - sr2 * sr2
                    d2 = b2 * b2 - 4.0 * aq * c2
                    sq2 = jnp.sqrt(jnp.maximum(d2, 0.0))
                    tt1 = (-b2 - sq2) * ai2a
                    tt2 = (-b2 + sq2) * ai2a
                    h2 = d2 > 0.0
                    hit2 = h2 & ((tt1 >= sphere_eps) | (tt2 >= sphere_eps))
                    occ_f = jnp.where(hit2, f1, occ_f)

                if n_tris > 0:
                    ainv_dx = 1.0 / aox_
                    ainv_dy = 1.0 / aoy_
                    ainv_dz = 1.0 / aoz_

                    def ao_tri(t_i, of):
                        ax2 = tri_ref[0, t_i]
                        ay2 = tri_ref[1, t_i]
                        az2 = tri_ref[2, t_i]
                        abx2, aby2, abz2 = (
                            tri_ref[3, t_i], tri_ref[4, t_i], tri_ref[5, t_i]
                        )
                        acx2, acy2, acz2 = (
                            tri_ref[6, t_i], tri_ref[7, t_i], tri_ref[8, t_i]
                        )
                        nx2, ny2, nz2 = (
                            tri_ref[9, t_i], tri_ref[10, t_i],
                            tri_ref[11, t_i],
                        )
                        aox2, aoy2, aoz2 = px - ax2, py - ay2, pz - az2
                        dax = aoy2 * aoz_ - aoz2 * aoy_
                        day = aoz2 * aox_ - aox2 * aoz_
                        daz = aox2 * aoy_ - aoy2 * aox_
                        det2 = -(aox_ * nx2 + aoy_ * ny2 + aoz_ * nz2)
                        inv_d2 = 1.0 / jnp.where(det2 >= det_eps, det2, 1.0)
                        dst2 = (
                            aox2 * nx2 + aoy2 * ny2 + aoz2 * nz2
                        ) * inv_d2
                        u2 = (
                            acx2 * dax + acy2 * day + acz2 * daz
                        ) * inv_d2
                        v2 = -(
                            abx2 * dax + aby2 * day + abz2 * daz
                        ) * inv_d2
                        w2 = 1.0 - u2 - v2
                        valid2 = (
                            (det2 >= det_eps) & (dst2 >= tri_eps)
                            & (u2 >= tri_eps) & (v2 >= tri_eps)
                            & (w2 >= tri_eps)
                        )
                        return jnp.where(valid2, f1, of)

                    def ao_chunk(c, of):
                        lo_x, lo_y, lo_z = (
                            box_ref[0, c], box_ref[1, c], box_ref[2, c]
                        )
                        hi_x, hi_y, hi_z = (
                            box_ref[3, c], box_ref[4, c], box_ref[5, c]
                        )
                        t0x = (lo_x - px) * ainv_dx
                        t1x = (hi_x - px) * ainv_dx
                        t0y = (lo_y - py) * ainv_dy
                        t1y = (hi_y - py) * ainv_dy
                        t0z = (lo_z - pz) * ainv_dz
                        t1z = (hi_z - pz) * ainv_dz
                        tmin = jnp.maximum(
                            jnp.maximum(
                                jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)
                            ),
                            jnp.minimum(t0z, t1z),
                        )
                        tmax = jnp.minimum(
                            jnp.minimum(
                                jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)
                            ),
                            jnp.maximum(t0z, t1z),
                        )
                        enter = jnp.any(
                            (tmax >= tmin) & (tmax >= 0.0) & active
                            & (of == 0.0)
                        )

                        def run(of):
                            return jax.lax.fori_loop(
                                0, CULL_CHUNK,
                                lambda j, o: ao_tri(c * CULL_CHUNK + j, o),
                                of,
                            )

                        return jax.lax.cond(enter, run, lambda o: o, of)

                    occ_f = jax.lax.fori_loop(
                        0, n_chunks, ao_chunk, occ_f
                    )
                occ = occ + occ_f
            ao_factor = occ * (1.0 / (ao_samples * ao_intensity))
            if with_indices:
                aof_ref_opt[0][i] = ao_factor

        # ---- equirect sky slot (texture.h:92-112) ---------------------
        # same scheme as kernels/trace_spheres._forward_body: the 4096x
        # 2048 sky textures are far beyond VMEM, so the kernel records
        # ONE unit hit direction + throughput scale per ray and the
        # wrapper composes radiance outside (compose_sky: the acos/atan2
        # UV chain Mosaic cannot lower + one XLA row-gather, op-for-op
        # the scan path's sky_emission). Exact under the pure-emitter
        # black-diffuse sky convention that raytpu.config enforces.
        if sky_idx >= 0:
            (sklx, skly, sklz, skdx, skdy, skdz,
             early_f, slot_f) = sky_state
            sky_win = did_hit & (bidx == sky_idx)
            emx = jnp.where(sky_win, f0, emx)
            emy = jnp.where(sky_win, f0, emy)
            emz = jnp.where(sky_win, f0, emz)
            r_safe = jnp.where(sr > 0.0, sr, 1.0)   # miss lanes only
            sdx = (px - scx) / r_safe
            sdy = (py - scy) / r_safe
            sdz = (pz - scz) / r_safe

        # ================================================================
        # shading (shade_bounce): identical to kernels/trace_spheres.py
        # (which is bit-identical to integrator/path.py) from here down;
        # shared with the backward replay kernel (trace_scene_bwd)
        # ================================================================
        shade_args = (
            i,
            (rox, roy, roz, rdx, rdy, rdz, rcx, rcy, rcz, ix, iy, iz,
             ax_, ay_, az_, nx_, ny_, nz_,
             active_f, is_alpha_f, alpha_depth, medium_n2),
            did_hit, px, py, pz, nX, nY, nZ,
            dfx, dfy, dfz, emx, emy, emz, estr, refl, alpha, ior,
            draws_ref[n_draws * i + 0],
            draws_ref[n_draws * i + 1],
            draws_ref[n_draws * i + 2],
        )
        shade_kw = dict(
            alpha_lo=alpha_lo, alpha_hi=alpha_hi,
            bright_boost=bright_boost, bright_threshold=bright_threshold,
            hsl_l=hsl_l, hsl_s=hsl_s,
            e_scale_mult=e_scale_mult, ao_factor=ao_factor,
        )
        if sky_idx < 0:
            return shade_bounce(*shade_args, **shade_kw)
        new_carry, emissive_ret, accum = shade_bounce(
            *shade_args, with_masks=True, **shade_kw
        )
        # slot bookkeeping (trace_spheres take_e/take_a): the first sky
        # interaction is either an emissive early return (scale 1,
        # hsl-boost applied outside) or a regular accumulation (scale =
        # e_scale * pre-update throughput); later sky events contribute
        # exactly zero under the black-diffuse convention
        take_e = emissive_ret & sky_win & (slot_f == 0.0)
        take_a = accum & sky_win & (slot_f == 0.0)
        take = take_e | take_a
        e_sc = estr if e_scale_mult == 1.0 else estr * e_scale_mult
        sklx = jnp.where(take_e, f1, jnp.where(take_a, e_sc * rcx, sklx))
        skly = jnp.where(take_e, f1, jnp.where(take_a, e_sc * rcy, skly))
        sklz = jnp.where(take_e, f1, jnp.where(take_a, e_sc * rcz, sklz))
        skdx = jnp.where(take, sdx, skdx)
        skdy = jnp.where(take, sdy, skdy)
        skdz = jnp.where(take, sdz, skdz)
        early_f = jnp.where(take_e, f1, early_f)
        slot_f = jnp.where(take, f1, slot_f)
        return new_carry + (sklx, skly, sklz, skdx, skdy, skdz,
                            early_f, slot_f)

    def skip_body(i, carry):
        if with_indices:
            idx_ref_opt[0][i] = jnp.full(ox.shape, -1, jnp.int32)
            if use_ao:
                aof_ref_opt[0][i] = f0
        return carry

    for i in range(bounces):              # static unroll
        if i == 0:
            carry = bounce_body(0, carry)
        else:
            # whole-bounce skip: once every ray in the tile has returned
            # (sky/emissive/miss), the remaining fixed-depth bounces cost
            # one vector any-reduce each
            carry = jax.lax.cond(
                jnp.any(carry[18] > 0.0),
                functools.partial(bounce_body, i),
                functools.partial(skip_body, i),
                carry,
            )

    ix, iy, iz = carry[9:12]
    ax_, ay_, az_, nx_, ny_, nz_ = carry[12:18]
    inc_x[:] = ix
    inc_y[:] = iy
    inc_z[:] = iz
    alb_x[:] = ax_
    alb_y[:] = ay_
    alb_z[:] = az_
    nrm_x[:] = nx_
    nrm_y[:] = ny_
    nrm_z[:] = nz_
    if sky_idx >= 0:
        # skl3, unit direction 3, early flag (slot_f is bookkeeping only)
        for ref, val in zip(sky_out, carry[22:29]):
            ref[:] = val


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_spheres", "n_tris", "n_mats", "has_atlas",
        "atlas_w", "atlas_h", "bounces", "sphere_eps", "det_eps",
        "tri_eps", "alpha_lo", "alpha_hi", "bright_boost",
        "bright_threshold", "n_draws", "hsl_l", "hsl_s", "tile_rows",
        "tex_limbs", "with_indices", "n_quads", "n_leftover", "aa_layout",
        "sky_idx", "sky_w", "sky_h", "use_ao", "ao_samples",
        "ao_intensity", "ao_emission_factor", "interpret",
    ),
)
def _trace_call(
    sph, tri, trivm, boxes, mats, atlas, qtab, qbox, ltab, lbox,
    aatab, aat3,
    ox, oy, oz, dx, dy, dz, draws,
    *, n_spheres, n_tris, n_mats, has_atlas, atlas_w,
    atlas_h, bounces, sphere_eps, det_eps, tri_eps, alpha_lo, alpha_hi,
    bright_boost, bright_threshold, n_draws, hsl_l, hsl_s, tile_rows,
    tex_limbs, with_indices, n_quads, n_leftover, aa_layout,
    sky_idx, sky_w, sky_h, use_ao, ao_samples, ao_intensity,
    ao_emission_factor, interpret,
):
    rows = ox.shape[0]
    grid = (rows // tile_rows,)
    ray_spec = pl.BlockSpec(
        (tile_rows, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    draws_spec = pl.BlockSpec(
        (draws.shape[0], tile_rows, LANE), lambda i: (0, i, 0),
        memory_space=pltpu.VMEM,
    )
    atlas_spec = pl.BlockSpec(
        atlas.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    trivm_spec = pl.BlockSpec(
        trivm.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    kernel = functools.partial(
        _kernel,
        n_spheres=n_spheres, n_tris=n_tris, n_mats=n_mats,
        has_atlas=has_atlas,
        atlas_w=atlas_w, atlas_h=atlas_h, bounces=bounces,
        sphere_eps=sphere_eps, det_eps=det_eps, tri_eps=tri_eps,
        alpha_lo=alpha_lo, alpha_hi=alpha_hi, bright_boost=bright_boost,
        bright_threshold=bright_threshold, n_draws=n_draws,
        hsl_l=hsl_l, hsl_s=hsl_s, tex_limbs=tex_limbs,
        with_indices=with_indices, n_quads=n_quads, n_leftover=n_leftover,
        aa_layout=aa_layout, sky_idx=sky_idx, sky_w=sky_w, sky_h=sky_h,
        use_ao=use_ao, ao_samples=ao_samples, ao_intensity=ao_intensity,
        ao_emission_factor=ao_emission_factor,
    )
    n_base = 16 if sky_idx >= 0 else 9
    out_specs = [ray_spec] * n_base
    out_shape = [jax.ShapeDtypeStruct((rows, LANE), jnp.float32)] * n_base
    if with_indices:
        bn_spec = pl.BlockSpec(
            (bounces, tile_rows, LANE), lambda i: (0, i, 0),
            memory_space=pltpu.VMEM,
        )
        out_specs.append(bn_spec)
        out_shape.append(
            jax.ShapeDtypeStruct((bounces, rows, LANE), jnp.int32)
        )
        if use_ao:
            # recorded AO occlusion factors for the backward replay
            out_specs.append(bn_spec)
            out_shape.append(
                jax.ShapeDtypeStruct((bounces, rows, LANE), jnp.float32)
            )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[smem, smem, trivm_spec, smem, smem, atlas_spec]
        + [smem] * 6
        + [ray_spec] * 6
        + [draws_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(sph, tri, trivm, boxes, mats, atlas, qtab, qbox, ltab, lbox,
      aatab, aat3, ox, oy, oz, dx, dy, dz, draws)


def _limb3(a: Array, pad_to: int) -> Array:
    """Exact 3-limb bf16 decomposition of f32 ``a``, stacked on axis 0.

    bf16 carries 8 mantissa bits, so three round-to-nearest limbs cover
    f32's 24: a == (a0 + a1) + a2 exactly (the kernel reconstructs in
    that order). This is the same decomposition XLA's HIGHEST-precision
    f32 matmul applies to its operands; against a one-hot B only the A
    limbs contribute, so a single default bf16 MXU pass over the stacked
    limbs reproduces HIGHEST bit-for-bit at a third of the MACs
    (verified by the kernel-vs-scan bit-identity tests).
    """
    a0 = a.astype(jnp.bfloat16)
    r1 = a - a0.astype(jnp.float32)
    a1 = r1.astype(jnp.bfloat16)
    r2 = r1 - a1.astype(jnp.float32)
    a2 = r2.astype(jnp.bfloat16)
    out = jnp.concatenate([a0, a1, a2])
    return jnp.pad(out, ((0, pad_to - out.shape[0]), (0, 0)))


def pack_sph(scene: Scene) -> Array:
    """(14, S_pad) sphere table: cx cy cz r | dif3 emi3 estr refl alpha ior."""
    n_s = scene.spheres.count
    s_pad = max(-(-n_s // 8) * 8, 8)
    m = scene.spheres.mat
    return pad_prims(
        [
            scene.spheres.center.x, scene.spheres.center.y,
            scene.spheres.center.z, scene.spheres.radius,
            m.diffuse.x, m.diffuse.y, m.diffuse.z,
            m.emission.x, m.emission.y, m.emission.z,
            m.emission_strength, m.reflection, m.alpha, m.ior,
        ],
        s_pad,
    )


def pack_tri25(scene: Scene, geom: TriangleGeom) -> Array:
    """(25, T_pad) triangle table: a3 ab3 ac3 n3 b3 c3 ua va ub vb uc vc mat."""
    n_t = scene.triangles.count
    t_pad = max(-(-n_t // EXT_CHUNK) * EXT_CHUNK, EXT_CHUNK)
    tris = scene.triangles
    return pad_prims(
        [
            geom.a.x, geom.a.y, geom.a.z,
            geom.edge_ab.x, geom.edge_ab.y, geom.edge_ab.z,
            geom.edge_ac.x, geom.edge_ac.y, geom.edge_ac.z,
            geom.normal_raw.x, geom.normal_raw.y, geom.normal_raw.z,
            tris.b.x, tris.b.y, tris.b.z,
            tris.c.x, tris.c.y, tris.c.z,
            tris.ua, tris.va, tris.ub, tris.vb, tris.uc, tris.vc,
            tris.mat_id.astype(jnp.float32),
        ],
        t_pad,
    )


def pack_atlas_f32(scene: Scene) -> Array:
    """f32 texture-row fetch operand A[ch*atlas_w + x, tex_y + h*mat] —
    the pre-quantization/pre-limb layout (pack_scene derives the forward
    kernel's bf16 operand from it). The backward replay kernel consumes
    it directly: in-Pallas f32 matmuls are exact, and the host-side vjp
    of this packing maps atlas cotangents back to scene.atlas.{rgb,alpha}."""
    n_tex = scene.atlas.alpha.shape[0]
    if n_tex == 0:
        return jnp.zeros((8, LANE), jnp.float32)
    w = scene.atlas.width
    n_rows = n_tex // w
    r_pad = max(-(-n_rows // LANE) * LANE, LANE)
    w4_pad = -(-4 * w // 8) * 8
    a = jnp.zeros((w4_pad, r_pad), jnp.float32)
    for ch, chan in enumerate((scene.atlas.rgb.x, scene.atlas.rgb.y,
                               scene.atlas.rgb.z, scene.atlas.alpha)):
        a = a.at[ch * w : (ch + 1) * w, :n_rows].set(
            chan.reshape(n_rows, w).T
        )
    return a


def _chunk_boxes(xs, ys, zs, n: int) -> Array:
    """(6, n_chunks) per-CULL_CHUNK AABBs over per-primitive corner
    coordinate lists (each entry a (n,) array; rows = one corner per
    primitive), inflated by the same 1e-5 relative margin pack_scene has
    always applied for f32-recomputed corners. Only chunks containing
    real primitives get a box — the ±inf padding keeps pad slots from
    inflating the last chunk."""
    n_chunks = -(-n // CULL_CHUNK)
    pad = n_chunks * CULL_CHUNK - n
    lo, hi = [], []
    for parts in (xs, ys, zs):
        stack = jnp.stack(parts)                       # (corners, n)
        lo.append(jnp.min(
            jnp.pad(stack, ((0, 0), (0, pad)), constant_values=jnp.inf)
            .reshape(len(parts), n_chunks, CULL_CHUNK), axis=(0, 2),
        ))
        hi.append(jnp.max(
            jnp.pad(stack, ((0, 0), (0, pad)), constant_values=-jnp.inf)
            .reshape(len(parts), n_chunks, CULL_CHUNK), axis=(0, 2),
        ))
    boxes = jnp.stack(lo + hi)
    eps = 1e-5 * (jnp.abs(boxes) + 1.0)
    return boxes + jnp.concatenate([-eps[:3], eps[3:]], axis=0)


def _aa_partition(rect_classes, tri_classes):
    """Static group-major ordering for the axis-aligned fast loops.

    Returns ``(layout, rect_sel, tri_sel)``:
      layout:   6 tuples (k, s, cnt_rect_m0, cnt_rect_m1, cnt_tri) —
                one per (normal axis, sign) group in fixed order
      rect_sel: [(pair_index, k, s, m), ...] in aatab column order
      tri_sel:  [(tri_index, k, s), ...] in aat3 column order
    """
    layout, rect_sel, tri_sel = [], [], []
    for k in range(3):
        for s in (1, -1):
            ra = [p for p, c in enumerate(rect_classes) if c == (k, s, 0)]
            rb = [p for p, c in enumerate(rect_classes) if c == (k, s, 1)]
            tt = [t for (t, kk, ss) in tri_classes if (kk, ss) == (k, s)]
            layout.append((k, s, len(ra), len(rb), len(tt)))
            rect_sel += [(p, k, s, 0) for p in ra] + [(p, k, s, 1) for p in rb]
            tri_sel += [(t, k, s) for t in tt]
    return tuple(layout), rect_sel, tri_sel


def pack_aa(scene: Scene, geom: TriangleGeom, pairs, rect_sel, tri_sel,
            det_eps: float):
    """Tables for the axis-aligned fast loops (geometry/quads.py
    classify_axis_aligned). All quantities are normalized by the plane-
    normal magnitude u = |n_k| so the per-ray group scalar
    detg = -s*d_k IS the candidate's denominator (t = numr/detg) and
    validity thresholds are shared per group.

      aatab (8, N)  per aa rect:  ck=s*a_k | du=det_eps/u | a_m | 1/e1_m
                    | a_o | 1/e2_o | i | j   (m = e1's in-plane axis,
                    o = e2's; pug = alpha*detg, pvg = beta*detg)
      aat3  (9, L)  per aa unpaired tri: ck | du | a_i1 | a_i2
                    | ac_i2/D | -ac_i1/D | -ab_i2/D | ab_i1/D | idx
                    (D = the in-plane 2x2 determinant, |D| = u)
    """
    import numpy as np
    from itertools import groupby

    tris = scene.triangles
    V = (
        jnp.stack([tris.a.x, tris.b.x, tris.c.x]),
        jnp.stack([tris.a.y, tris.b.y, tris.c.y]),
        jnp.stack([tris.a.z, tris.b.z, tris.c.z]),
    )
    blocks = []
    for (k, s, m), grp in groupby(rect_sel, key=lambda r: r[1:]):
        ps = [g[0] for g in grp]
        i_idx = np.array([pairs[p][0] for p in ps], np.int32)
        j_idx = np.array([pairs[p][1] for p in ps], np.int32)
        oi = np.array([pairs[p][2] for p in ps], np.int32)
        s1s, s2s = (oi + 1) % 3, (oi + 2) % 3
        i1, i2 = [a_ for a_ in range(3) if a_ != k]
        m_axis = i1 if m == 0 else i2
        o_axis = i2 if m == 0 else i1
        a_k = V[k][oi, i_idx]
        a_m = V[m_axis][oi, i_idx]
        a_o = V[o_axis][oi, i_idx]
        e1m = V[m_axis][s1s, i_idx] - a_m
        e2o = V[o_axis][s2s, i_idx] - a_o
        u = jnp.abs(e1m * e2o)
        blocks.append(jnp.stack([
            s * a_k, det_eps / u, a_m, 1.0 / e1m, a_o, 1.0 / e2o,
            jnp.asarray(i_idx, jnp.float32), jnp.asarray(j_idx, jnp.float32),
        ]))
    aatab = (
        jnp.concatenate(blocks, axis=1)
        if blocks else jnp.zeros((8, 8), jnp.float32)
    )

    A = (geom.a.x, geom.a.y, geom.a.z)
    AB = (geom.edge_ab.x, geom.edge_ab.y, geom.edge_ab.z)
    AC = (geom.edge_ac.x, geom.edge_ac.y, geom.edge_ac.z)
    blocks3 = []
    for (k, s), grp in groupby(tri_sel, key=lambda r: r[1:]):
        ts = np.array([g[0] for g in grp], np.int32)
        i1, i2 = [a_ for a_ in range(3) if a_ != k]
        ab1, ab2 = AB[i1][ts], AB[i2][ts]
        ac1, ac2 = AC[i1][ts], AC[i2][ts]
        D = ab1 * ac2 - ab2 * ac1
        blocks3.append(jnp.stack([
            s * A[k][ts], det_eps / jnp.abs(D), A[i1][ts], A[i2][ts],
            ac2 / D, -ac1 / D, -ab2 / D, ab1 / D,
            jnp.asarray(ts, jnp.float32),
        ]))
    aat3 = (
        jnp.concatenate(blocks3, axis=1)
        if blocks3 else jnp.zeros((9, 8), jnp.float32)
    )
    return aatab, aat3


def pack_quads(scene: Scene, geom: TriangleGeom, gen_pairs,
               all_pairs=None, exclude_tris=frozenset()):
    """Host-side packing for the GENERAL (non-axis-aligned) rectangle
    path (geometry/quads.py):

      qtab   (14, Q_pad)  a3 e1_3 e2_3 n3 i j — parallelogram corner =
                          triangle i's vertex opposite the shared edge,
                          e1/e2 the diagonal endpoints minus the corner
                          (cyclic order, so n = cross(e1, e2) equals
                          triangle i's raw normal and the det_eps
                          backface cull matches the per-triangle loop)
      qboxes (6, q_chunks) per-CULL_CHUNK AABBs over all four corners
      ltab   (13, L_pad)  unpaired general triangles a3 ab3 ac3 n3 idx
      lboxes (6, l_chunks)

    ``gen_pairs`` are the pairs NOT served by the axis-aligned loops;
    leftovers are computed against ``all_pairs`` (every detected pair)
    minus ``exclude_tris`` (unpaired tris the aa loops serve). Indices
    are original triangle indices, so the winner the kernel records
    feeds the SAME extraction/shading/backward-replay machinery as the
    per-triangle loop.
    """
    import numpy as np

    from raytpu.geometry.quads import leftover_indices

    n_t = scene.triangles.count
    zq = (
        jnp.zeros((14, CULL_CHUNK), jnp.float32),
        jnp.zeros((6, 1), jnp.float32),
    )
    zl = (
        jnp.zeros((13, CULL_CHUNK), jnp.float32),
        jnp.zeros((6, 1), jnp.float32),
    )
    if all_pairs is None:
        all_pairs = gen_pairs
    if not all_pairs:
        return zq + zl

    if gen_pairs:
        i_idx = np.array([p[0] for p in gen_pairs], np.int32)
        j_idx = np.array([p[1] for p in gen_pairs], np.int32)
        oi = np.array([p[2] for p in gen_pairs], np.int32)
        s1s, s2s = (oi + 1) % 3, (oi + 2) % 3
        tris = scene.triangles
        n_q = len(gen_pairs)
        q_pad = max(-(-n_q // CULL_CHUNK) * CULL_CHUNK, CULL_CHUNK)

        per_axis = []
        for coord in "xyz":
            V = jnp.stack([
                getattr(tris.a, coord), getattr(tris.b, coord),
                getattr(tris.c, coord),
            ])                                          # (3 slots, T)
            a_ = V[oi, i_idx]
            s1, s2 = V[s1s, i_idx], V[s2s, i_idx]
            per_axis.append((a_, s1 - a_, s2 - a_, s1 + s2 - a_, s1, s2))
        ((ax_, e1x, e2x, d4x, s1x, s2x),
         (ay_, e1y, e2y, d4y, s1y, s2y),
         (az_, e1z, e2z, d4z, s1z, s2z)) = per_axis
        nx = e1y * e2z - e1z * e2y
        ny = e1z * e2x - e1x * e2z
        nz = e1x * e2y - e1y * e2x
        qtab = pad_prims(
            [ax_, ay_, az_, e1x, e1y, e1z, e2x, e2y, e2z, nx, ny, nz,
             jnp.asarray(i_idx, jnp.float32),
             jnp.asarray(j_idx, jnp.float32)],
            q_pad,
        )
        qboxes = _chunk_boxes(
            [ax_, s1x, s2x, d4x], [ay_, s1y, s2y, d4y],
            [az_, s1z, s2z, d4z], n_q,
        )
        zq = (qtab, qboxes)

    lidx = np.array(
        [t for t in leftover_indices(n_t, all_pairs)
         if t not in exclude_tris],
        np.int32,
    )
    n_l = lidx.shape[0]
    if n_l == 0:
        return zq + zl
    l_pad = max(-(-n_l // CULL_CHUNK) * CULL_CHUNK, CULL_CHUNK)
    g = lambda v: v[lidx]
    ltab = pad_prims(
        [g(geom.a.x), g(geom.a.y), g(geom.a.z),
         g(geom.edge_ab.x), g(geom.edge_ab.y), g(geom.edge_ab.z),
         g(geom.edge_ac.x), g(geom.edge_ac.y), g(geom.edge_ac.z),
         g(geom.normal_raw.x), g(geom.normal_raw.y), g(geom.normal_raw.z),
         jnp.asarray(lidx, jnp.float32)],
        l_pad,
    )
    lb = [g(geom.a.x) + g(geom.edge_ab.x),
          g(geom.a.y) + g(geom.edge_ab.y),
          g(geom.a.z) + g(geom.edge_ab.z)]
    lc = [g(geom.a.x) + g(geom.edge_ac.x),
          g(geom.a.y) + g(geom.edge_ac.y),
          g(geom.a.z) + g(geom.edge_ac.z)]
    lboxes = _chunk_boxes(
        [g(geom.a.x), lb[0], lc[0]],
        [g(geom.a.y), lb[1], lc[1]],
        [g(geom.a.z), lb[2], lc[2]],
        n_l,
    )
    return zq + (ltab, lboxes)


def pack_mats(scene: Scene) -> Array:
    """(9, M_pad) material table: em3 estr refl ior alpha_c use_c eft."""
    tbl = scene.mat_table
    n_m = tbl.emission_strength.shape[0]
    m_pad = max(-(-n_m // 8) * 8, 8)
    eft = (
        tbl.emission_from_texture
        if tbl.emission_from_texture is not None
        else jnp.zeros((n_m,), bool)
    )
    return pad_prims(
        [
            tbl.emission.x, tbl.emission.y, tbl.emission.z,
            tbl.emission_strength, tbl.reflection, tbl.ior,
            tbl.alpha_const, tbl.use_alpha_const.astype(jnp.float32),
            eft.astype(jnp.float32),
        ],
        m_pad,
    )


def pack_scene(scene: Scene, geom: TriangleGeom):
    """Host-side SoA packing: SMEM tables + the VMEM atlas chunks."""
    n_t = scene.triangles.count
    sph = pack_sph(scene)
    tri = pack_tri25(scene, geom)
    # winner-extraction operand: only the 19 channels the kernel reads
    # after the loop (EXT_NR layout: a3 n3 b3 c3 uv6 mat), pre-split
    # into 3 stacked bf16 limbs (57 rows -> 64 sublanes) so extraction
    # is one default-precision MXU pass instead of HIGHEST's nine
    ext_rows = jnp.concatenate(
        [tri[0:3], tri[9:12], tri[12:18], tri[18:24], tri[24:25]]
    )
    trivm = _limb3(ext_rows, pad_to=64)

    # per-CULL_CHUNK AABBs (as kernels/intersect.py, incl. the 1-ulp
    # conservative inflation for the recomputed b/c vertices); only
    # chunks containing real triangles get a box — the kernel's chunk
    # loop is bounded by the box count, so pad slots are never scanned
    vb = geom.a + geom.edge_ab
    vc = geom.a + geom.edge_ac
    boxes = _chunk_boxes(
        [geom.a.x, vb.x, vc.x], [geom.a.y, vb.y, vc.y],
        [geom.a.z, vb.z, vc.z], n_t,
    )

    mats = pack_mats(scene)

    # texture-row fetch operand: A[ch*atlas_w + x, texrow] = texel value,
    # texrow = tex_y + atlas_h*mat (so texel = texrow*atlas_w + tex_x)
    n_tex = scene.atlas.alpha.shape[0]
    if n_tex > 0:
        w = scene.atlas.width
        w4_pad = -(-4 * w // 8) * 8
        a = pack_atlas_f32(scene)
        if scene.atlas.packed is not None:
            # u8-exact atlas (TextureAtlas.packed): ship integer texel
            # codes 0..255 — exactly representable in a SINGLE bf16
            # limb (8 mantissa bits); the kernel rescales by f32(1/255)
            # after extraction. A third of the fetch MACs + VMEM.
            atlas = jnp.round(a * 255.0).astype(jnp.bfloat16)
        else:
            atlas = _limb3(a, pad_to=3 * w4_pad)
    else:
        atlas = jnp.zeros((24, LANE), jnp.bfloat16)

    return sph, tri, trivm, boxes, mats, atlas


def trace_mesh_megakernel(
    scene: Scene,
    cfg: RenderConfig,
    origin: Vec3,
    direction: Vec3,
    bounce_draws: Array,
    interpret: bool = False,
) -> tuple[Vec3, Vec3, Vec3]:
    """Drop-in for integrator.path.trace on supported mesh scenes.

    Differentiable: under ``jax.grad`` the forward kernel additionally
    records each bounce's winner index, and the backward pass replays the
    trace through the scan integrator with those indices injected
    (integrator.path.trace(bounce_idx=...)) — the stop_gradient'd
    SELECTION (distance matrices / argmin / Pallas selector, the
    backward long pole at mesh scales) never runs again, while the
    differentiable winner-recompute + gather + shading chain is
    op-for-op the scan path's, so gradients are identical to
    use_megakernel=False.

    Equirect sky scenes (the reference's canonical mesh render,
    main.c:361 + 374): the kernel records one sky-hit slot per ray and
    the radiance is composed HERE with one row-gather over the
    full-resolution sky texture (kernels/trace_spheres does the same).
    Gradients run the backward megakernel with the sky-slot replay
    (trace_scene_bwd) up to its depth ceiling; deeper configs (or
    RAYTPU_MESH_BWD=replay) take the index-replay scan backward, whose
    closest_hit handles the sky texel natively.
    """
    if _sky_statics(scene)["sky_idx"] < 0:
        return _mkm_vjp(scene, cfg, origin, direction, bounce_draws, interpret)
    use_bwd_kernel = (
        _os.environ.get("RAYTPU_MESH_BWD", "kernel") == "kernel"
        and cfg.max_bounces <= BWD_KERNEL_MAX_BOUNCES
    )
    if use_bwd_kernel:
        from raytpu.kernels.trace_spheres import compose_sky

        out6 = _mkm_sky_slot(
            scene, cfg, origin, direction, bounce_draws, interpret
        )
        return compose_sky(scene, cfg, out6)
    return _mkm_sky(scene, cfg, origin, direction, bounce_draws, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 5))
def _mkm_sky_slot(scene, cfg, origin, direction, bounce_draws, interpret):
    """Slot-level VJP boundary for sky scenes (mirrors trace_spheres'
    _mk_vjp): the composition lives OUTSIDE, so its cotangents arrive
    here as (d_inc, d_alb, d_nrm, d_skl, d_sdir, d_early) and the
    backward megakernel replays the trace with the sky-slot planes —
    d_sdir/d_early are identically zero through the floor-quantized UV
    chain and are dropped."""
    out6, _, _ = _mkm_forward(
        scene, cfg, origin, direction, bounce_draws, interpret,
        with_indices=False,
    )
    return out6


def _mkm_sky_slot_fwd(scene, cfg, origin, direction, bounce_draws, interpret):
    out6, idx, aof = _mkm_forward(
        scene, cfg, origin, direction, bounce_draws, interpret,
        with_indices=True,
    )
    return out6, (scene, origin, direction, bounce_draws, idx, aof)


def _mkm_sky_slot_bwd(cfg, interpret, res, g):
    scene, origin, direction, bounce_draws, idx, aof = res
    g_inc, g_alb, g_nrm, g_skl, _g_sdir, _g_early = g
    from raytpu.kernels.trace_scene_bwd import mesh_backward

    return mesh_backward(
        scene, cfg, origin, direction, bounce_draws, idx,
        (g_inc, g_alb, g_nrm, g_skl), interpret, aof=aof,
    )


_mkm_sky_slot.defvjp(_mkm_sky_slot_fwd, _mkm_sky_slot_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 5))
def _mkm_sky(scene, cfg, origin, direction, bounce_draws, interpret):
    from raytpu.kernels.trace_spheres import compose_sky

    out6, _, _ = _mkm_forward(
        scene, cfg, origin, direction, bounce_draws, interpret,
        with_indices=False,
    )
    return compose_sky(scene, cfg, out6)


def _mkm_sky_fwd(scene, cfg, origin, direction, bounce_draws, interpret):
    from raytpu.kernels.trace_spheres import compose_sky

    out6, idx, _aof = _mkm_forward(
        scene, cfg, origin, direction, bounce_draws, interpret,
        with_indices=True,
    )
    out = compose_sky(scene, cfg, out6)
    return out, (scene, origin, direction, bounce_draws, idx)


def _mkm_sky_bwd(cfg, interpret, res, g):
    # sky scenes replay through the scan integrator with the recorded
    # winner indices: its closest_hit swaps the sky texel into the
    # winner's emission differentiably (integrator/hit.py), so sky-
    # texture gradients ride the replay like every other scene leaf
    scene, origin, direction, bounce_draws, idx = res
    from raytpu.integrator.path import trace as scan_trace

    def replay(scene, origin, direction, draws):
        return scan_trace(
            scene, cfg, origin, direction, draws, bounce_idx=idx
        )

    _, pull = jax.vjp(replay, scene, origin, direction, bounce_draws)
    return pull(g)


_mkm_sky.defvjp(_mkm_sky_fwd, _mkm_sky_bwd)


# the mesh megakernel carries an index-replay backward; render() may
# differentiate straight through it (no full scan recompute)
HAS_VJP = True


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 5))
def _mkm_vjp(scene, cfg, origin, direction, bounce_draws, interpret):
    out, _, _ = _mkm_forward(
        scene, cfg, origin, direction, bounce_draws, interpret,
        with_indices=False,
    )
    return out


def _mkm_fwd(scene, cfg, origin, direction, bounce_draws, interpret):
    out, idx, aof = _mkm_forward(
        scene, cfg, origin, direction, bounce_draws, interpret,
        with_indices=True,
    )
    return out, (scene, origin, direction, bounce_draws, idx, aof)


# deepest bounce count the backward megakernel serves. Round 4's single
# jax.vjp over the whole replay kept ~1MB/bounce of AD residuals
# resident and hit the 16MB scoped-VMEM limit at 18 bounces on mcworld;
# the round-5 windowed reverse sweep (trace_scene_bwd._bwd_kernel:
# checkpoint the carry every WINDOW bounces, differentiate per window)
# bounds residuals by one window, so depth now costs only checkpointed
# carries (~100KB each at BWD_ROWS) — 20-bounce mcworld grads verified
# in-kernel on v5e (tools/deep_bounce_smoke.py, the preflight gate).
# The cap is a guard against unbounded checkpoint growth, not a VMEM
# wall; deeper traces than this take the always-correct scan replay.
BWD_KERNEL_MAX_BOUNCES = 48


def _mkm_bwd(cfg, interpret, res, g):
    scene, origin, direction, bounce_draws, idx, aof = res
    if (
        _os.environ.get("RAYTPU_MESH_BWD", "kernel") == "kernel"
        and cfg.max_bounces <= BWD_KERNEL_MAX_BOUNCES
    ):
        # in-kernel VJP: the whole index replay (extraction + recompute +
        # shade + reverse sweep) fused in one Pallas kernel — see
        # kernels/trace_scene_bwd. The scan replay below remains the
        # always-correct reference path (RAYTPU_MESH_BWD=replay).
        from raytpu.kernels.trace_scene_bwd import mesh_backward

        return mesh_backward(
            scene, cfg, origin, direction, bounce_draws, idx, g, interpret,
            aof=aof,
        )
    from raytpu.integrator.path import trace as scan_trace

    def replay(scene, origin, direction, draws):
        return scan_trace(
            scene, cfg, origin, direction, draws, bounce_idx=idx
        )

    _, pull = jax.vjp(replay, scene, origin, direction, bounce_draws)
    return pull(g)


_mkm_vjp.defvjp(_mkm_fwd, _mkm_bwd)


def _mkm_forward(
    scene: Scene,
    cfg: RenderConfig,
    origin: Vec3,
    direction: Vec3,
    bounce_draws: Array,
    interpret: bool,
    with_indices: bool,
):
    b = origin.x.shape[0]
    has_tex = scene.atlas.alpha.shape[0] > 0
    tile_rows = _pick_rows(
        scene.triangles.count, 4 * scene.atlas.width if has_tex else 0,
        index_bounces=cfg.max_bounces if with_indices else 0,
    )
    rows = max(-(-b // LANE), tile_rows)
    rows = -(-rows // tile_rows) * tile_rows

    geom = precompute(scene.triangles)
    sph, tri, trivm, boxes, mats, atlas = pack_scene(scene, geom)
    # rectangle fast path: active only when the scene loader detected
    # coplanar pairs AND merge_quads is on (both live on the static cfg).
    # Axis-aligned rects/tris (quad_aa_* classifications) go to the
    # cheap per-(axis, sign) grouped loops; everything else to the
    # general fraction-ranked loops.
    pairs = cfg.quad_pairs if cfg.merge_quads else ()
    if pairs:
        rect_classes = (
            cfg.quad_aa_rects
            if len(cfg.quad_aa_rects) == len(pairs)
            else tuple(() for _ in pairs)
        )
        tri_classes = cfg.quad_aa_tris
        aa_layout, rect_sel, tri_sel = _aa_partition(
            rect_classes, tri_classes
        )
        gen_pairs = tuple(
            p for p, c in zip(pairs, rect_classes) if c == ()
        )
        aatab, aat3 = pack_aa(
            scene, geom, pairs, rect_sel, tri_sel, cfg.tri_det_eps
        )
        qtab, qbox, ltab, lbox = pack_quads(
            scene, geom, gen_pairs, all_pairs=pairs,
            exclude_tris=frozenset(t for (t, _, _) in tri_classes),
        )
        n_quads = len(gen_pairs)
        n_leftover = (
            scene.triangles.count - 2 * len(pairs) - len(tri_sel)
        )
    else:
        aa_layout, n_quads, n_leftover = None, 0, 0
        aatab = jnp.zeros((8, 8), jnp.float32)
        aat3 = jnp.zeros((9, 8), jnp.float32)
        qtab, qbox, ltab, lbox = pack_quads(scene, geom, ())

    ox, oy, oz = (pad_rows(c, rows) for c in origin)
    dx, dy, dz = (pad_rows(c, rows) for c in direction)

    bn, nd = bounce_draws.shape[0], bounce_draws.shape[1]
    draws = bounce_draws.reshape(bn * nd, b)
    draws = jnp.pad(draws, ((0, 0), (0, rows * LANE - b))).reshape(
        bn * nd, rows, LANE
    )

    has_atlas = scene.atlas.alpha.shape[0] > 0
    sky = _sky_statics(scene)
    out = _trace_call(
        sph, tri, trivm, boxes, mats, atlas, qtab, qbox, ltab, lbox,
        aatab, aat3, ox, oy, oz, dx, dy, dz, draws,
        n_spheres=scene.spheres.count, n_tris=scene.triangles.count,
        n_mats=scene.mat_table.emission_strength.shape[0],
        has_atlas=has_atlas,
        atlas_w=scene.atlas.width, atlas_h=scene.atlas.height,
        bounces=cfg.max_bounces, sphere_eps=cfg.sphere_eps,
        det_eps=cfg.tri_det_eps, tri_eps=cfg.tri_eps,
        alpha_lo=cfg.refr_alpha_lo, alpha_hi=cfg.refr_alpha_hi,
        bright_boost=cfg.bright_boost,
        bright_threshold=cfg.bright_threshold,
        n_draws=nd, hsl_l=cfg.hsl_l_factor, hsl_s=cfg.hsl_s_factor,
        tile_rows=tile_rows,
        tex_limbs=1 if scene.atlas.packed is not None else 3,
        with_indices=with_indices, n_quads=n_quads,
        n_leftover=n_leftover, aa_layout=aa_layout,
        use_ao=cfg.use_ao, ao_samples=cfg.ao_samples,
        ao_intensity=cfg.ao_intensity,
        ao_emission_factor=cfg.ao_emission_factor,
        **sky, interpret=interpret,
    )
    n_base = 16 if sky["sky_idx"] >= 0 else 9
    flat = [o.reshape(-1)[:b] for o in out[:n_base]]
    idx = aof = None
    if with_indices:
        idx = out[n_base].reshape(bn, -1)[:, :b]
        if cfg.use_ao:
            aof = out[n_base + 1].reshape(bn, -1)[:, :b]
    base = (
        Vec3(flat[0], flat[1], flat[2]),
        Vec3(flat[3], flat[4], flat[5]),
        Vec3(flat[6], flat[7], flat[8]),
    )
    if n_base == 16:
        base = base + (
            Vec3(flat[9], flat[10], flat[11]),   # sky scale
            Vec3(flat[12], flat[13], flat[14]),  # sky unit hit direction
            flat[15],                            # early-return flag
        )
    return base, idx, aof
