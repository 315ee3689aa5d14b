"""Backward megakernel for mesh AND sphere scenes: in-kernel VJP of an
index replay, windowed.

Round 2 made mesh gradients *correct* by replaying the trace through the
XLA scan path with the forward kernel's recorded winner indices — but the
replay ran outside the kernel, re-gathering and re-shading through HBM at
every bounce: pyramide fwd+bwd measured 9.2 Mrays/s against 766 M forward
(an 83x gap; VERDICT r2 missing #1). This module moves the ENTIRE replay
*inside* one Pallas kernel: the differentiable replay body runs under
``jax.vjp`` *inside* the kernel, so the reverse sweep is machine-derived
from the same code that defines the replay and the whole
fwd-residual-bwd round trip stays in VMEM.

What makes the replay cheap: the expensive part of the forward — the
chunk-culled search over all primitives (~40 VPU ops/triangle/bounce,
plus the AO probe loops) — is SELECTION, which is stop_gradient'd in the
scan path too. The replay never searches: each bounce's winner is
reconstructed from the recorded index by ONE exact one-hot MXU
contraction against the f32 primitive table (f32 ``jnp.dot`` inside
Pallas lowers to full-precision MXU passes, so extraction equals the
scan path's row-gather bit-for-bit) — triangles against the 25-channel
triangle table, spheres against a 14-channel sphere table — its distance
is recomputed elementwise (triangle_distance_one / sphere_distance_one,
op-for-op), and shading is the SAME ``shade_bounce`` the forward kernel
runs — so gradients match use_megakernel=False
(tests/test_mesh_megakernel.py, tests/test_megakernel.py grad tests).
Round 5 extends the same structure to SPHERE scenes (n_tris == 0
statically compiles the triangle machinery away), replacing the old
AD-of-the-search sphere backward: the flagship backward no longer pays
the 10-sphere quadratic-solve AD chains or the AO probe loops at all —
AO occlusion factors are recorded by the forward (piecewise-constant in
every parameter, so a recorded constant is gradient-exact; see
shade_bounce's docstring).

Windowed reverse sweep (round 5, VERDICT r4 next #1): instead of one
``jax.vjp`` over all bounces — which makes AD hold every bounce's
residuals live at once and capped the kernel at 16 bounces of scoped
VMEM — the kernel checkpoints the ~22-plane carry at window boundaries
during a cheap forward sweep, then runs ``jax.vjp`` per W-bounce window
in reverse, threading the carry cotangent between windows. Live
residuals are bounded by W bounces + the checkpoints (a few KB/plane),
so 19-20-bounce refraction-stack gradients now run in-kernel
(tools/deep_bounce_smoke.py). Shallow traces (bounces <= window) take
the single-window form, which is exactly the round-4 structure.

Memory discipline: the large transients — the (EXT_CHUNK, rays)
extraction one-hots and the (texrows, rays) fetch one-hot/mask — are
kept out of AD's residual set by custom VJPs that recompute them from
the saved integer planes during the reverse sweep
(_extract_channels/_fetch_texels). Parameter cotangents are accumulated
across windows and sequential grid steps: material tables as SMEM
scalars, the sphere table, triangle table and atlas as revisited VMEM
blocks whose scatter IS the transposed one-hot contraction — an MXU
matmul, not a serialized scatter-add.

DRAW cotangents are not computed: with nearest-texel fetch (the only
in-kernel mode) radiance/albedo are piecewise constant in every scattered
direction, and the normal AOV records only at bounces where
``i == alpha_depth`` — i.e. after i cutout pass-throughs, which never
change the ray direction — so the camera ray is the only direction any
AOV ever differentiates. d(bounce_draws) is therefore identically zero
(verified numerically on diffuse/AO/refraction/cutout scenes).

Measured dead end (r5, kept for the record): limbing the extraction /
fetch tables into 3 bf16 MXU passes (the forward kernel's trick) made
every fwd+bwd config 10-13% SLOWER here — the backward is not
MXU-pass-bound, and the per-bounce limb splits plus three half-size
dots cost more than the saved passes. The exact f32 dots stay.

Reference anchor: the loop being differentiated is ``tracer``
(/root/reference/main.c:118-242) over OBJ meshes (main.c:361-374) and
sphere scenes (main.c:330-347); the reference has no gradients at all —
this is the north-star capability.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytpu.core.types import RenderConfig, Scene
from raytpu.core.vec3 import Vec3
from raytpu.geometry.triangle import precompute
from raytpu.kernels._common import BIG, LANE, pad_rows
from raytpu.kernels.trace_scene import (
    EXT_CHUNK,
    pack_atlas_f32,
    pack_mats,
    pack_tri25,
    shade_bounce,
)

# single-window depth bound: traces at or under this many bounces take
# one jax.vjp over the whole replay (no extra forward sweep — the
# round-4 structure) at the WIDE tile; deeper traces pay the windowed
# sweep at the NARROW tile. Every BASELINE config (<= 6 bounces) stays
# in the fast shallow regime.
SINGLE_WINDOW_MAX = 8


def _bwd_tile(bounces: int) -> tuple[int, int]:
    """(rows per grid step, bounces per reverse window) by trace depth.

    AD keeps one window's replay intermediates live (~1MB per bounce per
    8 rows on mesh scenes), so rows x window is the scoped-VMEM knob.
    Measured on v5e (r5):
      * shallow (<= 8 bounces), single window: 16 rows beats 8 —
        flagship spheres 557 vs 469 Mrays/s fwd+bwd, pyramide 304 vs
        297; 32 rows loses again (545 flagship). 6-bounce mcworld at
        16 rows compiles inside the limit.
      * deep (19-20 bounces): (8 rows, window 4) fits with ~1MB spare
        (tools/deep_bounce_smoke.py); (16, 8) overflows by 14.4MB and
        (8, 8) by 5MB. The serialization fence in _bwd_kernel is what
        makes the window bound REAL — without it Mosaic overlaps every
        window's residual lifetime and W has no effect on allocation.
    Env overrides are probe knobs.
    """
    rows_env = _os.environ.get("RAYTPU_BWD_ROWS")
    win_env = _os.environ.get("RAYTPU_BWD_WINDOW")
    if bounces <= SINGLE_WINDOW_MAX:
        rows, window = 16, bounces
    else:
        rows, window = 8, 4
    if rows_env:
        rows = int(rows_env)
    if win_env:
        window = int(win_env)
    return rows, window


# compatibility export: the widest tile the module uses (shape helpers)
BWD_ROWS = 16

# sphere-table extraction chunk: spheres cap at 64, so a 16-lane one-hot
# covers typical scenes at an eighth of the triangle chunk's build cost
# (_ext_onehot); scenes with more spheres pad to the next multiple.
SPH_CHUNK = 16


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _extract_channels(tri_t: Array, sel_f: Array,
                      chunk: int = EXT_CHUNK) -> Array:
    """Winner-channel extraction: (R, T_pad) f32 table x one-hot -> (R, n).

    Exact: f32 ``jnp.dot`` inside Pallas lowers to full-precision MXU
    passes (the forward kernel's bf16-limb tricks exist to BUY BACK those
    passes; the backward runs once per tile, so it takes the exact dot
    directly — limbing HERE was measured 10-13% slower, module
    docstring), and a one-hot contraction has a single nonzero term per
    output — so this equals the scan path's row-gather bit-for-bit.
    Statically chunked so the transient one-hot stays (EXT_CHUNK, n).
    Used for both the triangle table and (round 5) the sphere table.

    custom_vjp: the hand-written pullback recomputes the one-hot from
    ``sel_f`` (an f32-carried lane index; zero cotangent) and scatters
    d_table = g @ onehot^T — one MXU matmul per chunk. Without it, AD
    would SAVE every (EXT_CHUNK, n) one-hot as a residual per bounce
    (512KB each), which both overflows VMEM at depth and — on the
    unrolled Mosaic path, where jax.checkpoint cannot lower (remat2 has
    no Mosaic rule) — could not be rematerialized away.
    """
    return _extract_fwd(tri_t, sel_f, chunk)[0]


def _ext_onehot(sel_f: Array, c: int, n: int, chunk: int) -> Array:
    # the one-hot BUILD (iota compare + cast over (chunk, n)) is the
    # extraction's real VPU cost — ~2 ops x chunk per lane per call —
    # so the chunk is a parameter: the sphere table runs at 16 (8x
    # cheaper than the triangle table's 128; tools/roofline.py counts
    # this, and the flagship backward moved ~0.57 -> 0.66 Grays/s
    # fwd+bwd when the sphere one-hot shrank)
    ext_iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, n), 0)
    sel = sel_f.astype(jnp.int32)
    return (ext_iota == sel - c * chunk).astype(jnp.float32)


def _extract_fwd(tri_t: Array, sel_f: Array, chunk: int = EXT_CHUNK):
    n = sel_f.shape[1]
    t_pad = tri_t.shape[1]
    acc = jnp.zeros((tri_t.shape[0], n), jnp.float32)
    for c in range(t_pad // chunk):
        acc = acc + jnp.dot(
            tri_t[:, c * chunk : (c + 1) * chunk],
            _ext_onehot(sel_f, c, n, chunk),
            preferred_element_type=jnp.float32,
        )
    return acc, (sel_f, t_pad)


def _extract_bwd(chunk, res, g):
    sel_f, t_pad = res
    n = sel_f.shape[1]
    chunks = [
        jnp.dot(g, _ext_onehot(sel_f, c, n, chunk).T,
                preferred_element_type=jnp.float32)
        for c in range(t_pad // chunk)
    ]
    return jnp.concatenate(chunks, axis=1), jnp.zeros_like(sel_f)


_extract_channels.defvjp(_extract_fwd, _extract_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fetch_texels(atlas_a: Array, texrow_f: Array, flat_x_f: Array,
                  atlas_w: int) -> Array:
    """Nearest-texel one-hot fetch over the f32 atlas operand: (8, n)
    rgba channels (rows 4..7 zero). Exact for the same one-hot reason as
    _extract_channels, and custom-vjp'd for the same two reasons: the
    (r_pad, n) one-hot / (w4p, n) mask transients must not become
    per-bounce residuals, and the unrolled Mosaic path has no remat.
    The pullback is the transposed chain: d_atlas = (out-cotangent *
    mask) @ onehot^T — one MXU matmul."""
    return _fetch_fwd(atlas_a, texrow_f, flat_x_f, atlas_w)[0]


def _fetch_parts(w4p, r_pad, texrow_f, flat_x_f, atlas_w):
    n = texrow_f.shape[1]
    sub = jax.lax.broadcasted_iota(jnp.int32, (r_pad, n), 0)
    onehot = (sub == texrow_f.astype(jnp.int32)).astype(jnp.float32)
    xsub = jax.lax.broadcasted_iota(jnp.int32, (w4p, n), 0)
    mask = (xsub % atlas_w == flat_x_f.astype(jnp.int32)).astype(
        jnp.float32
    )
    crow = jax.lax.broadcasted_iota(jnp.int32, (8, w4p), 0)
    cidx = jax.lax.broadcasted_iota(jnp.int32, (8, w4p), 1)
    sel = (
        (cidx // atlas_w == crow) & (cidx < 4 * atlas_w)
    ).astype(jnp.float32)
    return onehot, mask, sel


def _fetch_fwd(atlas_a, texrow_f, flat_x_f, atlas_w):
    w4p, r_pad = atlas_a.shape
    onehot, mask, sel = _fetch_parts(w4p, r_pad, texrow_f, flat_x_f, atlas_w)
    out = jnp.dot(atlas_a, onehot, preferred_element_type=jnp.float32)
    chan4 = jnp.dot(sel, out * mask, preferred_element_type=jnp.float32)
    return chan4, (texrow_f, flat_x_f, w4p, r_pad)


def _fetch_bwd(atlas_w, res, g):
    # the chain is linear in atlas_a, so its values never enter the
    # pullback — rebuild only the index-derived operands and transpose:
    #   d_prod  = sel^T @ g
    #   d_out   = d_prod * mask
    #   d_atlas = d_out @ onehot^T
    texrow_f, flat_x_f, w4p, r_pad = res
    onehot, mask, sel = _fetch_parts(w4p, r_pad, texrow_f, flat_x_f, atlas_w)
    d_prod = jnp.dot(sel.T, g, preferred_element_type=jnp.float32)
    d_atlas = jnp.dot(
        d_prod * mask, onehot.T, preferred_element_type=jnp.float32
    )
    return d_atlas, jnp.zeros_like(texrow_f), jnp.zeros_like(flat_x_f)


_fetch_texels.defvjp(_fetch_fwd, _fetch_bwd)


def _replay_bounce(
    sphvm, mv, tri_t, atlas_a, carry, i, bidx, u_d, v_d, roulette, aof,
    *,
    n_spheres, n_tris, n_mats, has_atlas, atlas_w, atlas_h,
    sphere_eps, det_eps, tri_eps, alpha_lo, alpha_hi,
    bright_boost, bright_threshold, hsl_l, hsl_s, sky_idx=-1,
    use_ao=False, e_scale_mult=1.0, pre_tri=None, pre_sph=None,
):
    """One differentiable replay bounce: recorded winner -> extraction ->
    distance recompute -> texture/material resolve -> shade_bounce.
    Every formula is op-for-op the scan replay's
    (integrator.hit.closest_hit(best_idx=...) + integrator.path.bounce),
    which is the gradient-parity contract.

    ``sphvm`` is the (16, S_pad) f32 sphere table (pack_sph_vm); winner
    channels come from the same one-hot MXU extraction as triangles —
    round 5 replaced the 14 x n_spheres select-chain, which dominated
    sphere-scene replays. ``n_tris == 0`` statically compiles away the
    whole triangle path (extraction, distance, barycentrics, texturing),
    which is the sphere-megakernel backward's fast shape; likewise
    ``n_spheres == 0`` drops the sphere machinery.

    Ambient occlusion (use_ao): ``aof`` is the forward-recorded
    occlusion factor plane, constant by construction (see module
    docstring); ``e_scale_mult`` is the static emission compensation.

    Equirect sky (sky_idx >= 0): the carry grows 4 planes (sky-scale 3 +
    slot-taken flag) and the bounce replays the forward kernel's slot
    bookkeeping — the scale skl = e_scale * pre-update-throughput is the
    only sky quantity with a live cotangent (the unit-direction and
    early-flag outputs end in floor/compares outside), so the replay
    never recomputes the hit direction at all.
    """
    (rox, roy, roz, rdx, rdy, rdz) = carry[:6]
    active_f = carry[18]
    active = active_f > 0.0
    f0 = jnp.zeros_like(rox)
    f1 = jnp.ones_like(rox)

    did_hit = bidx >= 0
    tri_wins = (bidx >= n_spheres) if n_tris > 0 else (f0 > 1.0)
    n = rox.shape[0] * LANE

    if n_tris > 0:
        # ---- triangle winner extraction (one-hot MXU; exact) -----------
        # the lane index rides as f32 (values < 2^24, exact) so the custom
        # pullback can hand back a plain zero cotangent for it.
        # ``pre_tri``: the windowed kernel batches every bounce's
        # extraction into ONE dot per window (sel vectors are recorded
        # constants) and hands this bounce its slice — the per-bounce
        # dot only runs on the scan/interpret path.
        if pre_tri is not None:
            wout = pre_tri
        else:
            sel_f = jnp.where(
                tri_wins, bidx - n_spheres, -1
            ).reshape(1, n).astype(jnp.float32)
            wout = _extract_channels(tri_t, sel_f, EXT_CHUNK)
        row = lambda j: wout[j : j + 1].reshape(rox.shape)
        wax, way, waz = row(0), row(1), row(2)
        wabx, waby, wabz = row(3), row(4), row(5)
        wacx, wacy, wacz = row(6), row(7), row(8)
        wnx, wny, wnz = row(9), row(10), row(11)
        wbx, wby, wbz = row(12), row(13), row(14)
        wcx, wcy, wcz = row(15), row(16), row(17)
        wua, wva, wub = row(18), row(19), row(20)
        wvb, wuc, wvc = row(21), row(22), row(23)
        wmat = row(24)

        # ---- triangle winner distance, recomputed differentiably
        # (triangle_distance_one, geometry/triangle.py:94-116 op-for-op)
        aox, aoy, aoz = rox - wax, roy - way, roz - waz
        daox = aoy * rdz - aoz * rdy        # dao = cross(ao, direction)
        daoy = aoz * rdx - aox * rdz
        daoz = aox * rdy - aoy * rdx
        det = -(rdx * wnx + rdy * wny + rdz * wnz)
        inv_det = 1.0 / jnp.where(det >= det_eps, det, 1.0)
        t_dst = (aox * wnx + aoy * wny + aoz * wnz) * inv_det
        t_u = (wacx * daox + wacy * daoy + wacz * daoz) * inv_det
        t_v = -(wabx * daox + waby * daoy + wabz * daoz) * inv_det
        t_w = 1.0 - t_u - t_v
        t_valid = (
            (det >= det_eps) & (t_dst >= tri_eps)
            & (t_u >= tri_eps) & (t_v >= tri_eps) & (t_w >= tri_eps)
        )
        t_t = jnp.where(t_valid, t_dst, BIG)

    if n_spheres > 0:
        # ---- sphere winner extraction (one-hot MXU, 16-lane chunk) ----
        # an SMEM-scalar select-chain variant (the r4 structure) was
        # measured SLOWER at the 16-row tile (544 vs 582 Mrays/s
        # flagship fwd+bwd) — the 14 x S where-chains cost more than the
        # small dots; documented as a rejected ablation.
        if pre_sph is not None:
            sout = pre_sph
        else:
            ssel_f = jnp.where(
                did_hit & ~tri_wins, bidx, -1
            ).reshape(1, n).astype(jnp.float32)
            sout = _extract_channels(sphvm, ssel_f, SPH_CHUNK)
        srow = lambda j: sout[j : j + 1].reshape(rox.shape)
        (scx, scy, scz, sr, sdfx, sdfy, sdfz, semx, semy, semz,
         sestr, srefl, salpha, sior) = (srow(k) for k in range(14))

        # sphere_distance_one (geometry/sphere.py:60-81) op-for-op: the
        # scan replay's grad-safe floors (1e-30 / 1e-20), NOT the forward
        # search's 0.0 floor — the scan path is the parity target
        ocx, ocy, ocz = rox - scx, roy - scy, roz - scz
        a_q = rdx * rdx + rdy * rdy + rdz * rdz
        b_q = 2.0 * (ocx * rdx + ocy * rdy + ocz * rdz)
        c_q = ocx * ocx + ocy * ocy + ocz * ocz - sr * sr
        disc = b_q * b_q - 4.0 * a_q * c_q
        sq = jnp.sqrt(jnp.maximum(disc, 1e-30))
        # select-based floor, NOT jnp.maximum: padded lanes have d == 0 so
        # a_q == 0 exactly, and maximum's VJP computes g * d(0.5/m)/dm =
        # 0 * -inf = NaN there; where's VJP is a select, which cuts the
        # chain with an exact 0. Forward value and winner-lane gradients
        # identical.
        inv_2a = 0.5 / jnp.where(a_q > 1e-20, a_q, 1e-20)
        st1 = (-b_q - sq) * inv_2a
        st2 = (-b_q + sq) * inv_2a
        s_hit = disc > 0.0
        s_t = jnp.where(
            s_hit & (st1 >= sphere_eps), st1,
            jnp.where(s_hit & (st2 >= sphere_eps), st2, BIG),
        )
    else:
        (scx, scy, scz, sr, sdfx, sdfy, sdfz, semx, semy, semz,
         sestr, srefl, salpha, sior) = (f0,) * 14
        s_t = jnp.full(rox.shape, BIG, jnp.float32)

    # Knife-edge consistency guard: the recorded winner came from the
    # FORWARD kernel — a different compiled program whose FMA contraction
    # differs by ulps (tools/probe_bitexact.py) — so a hit recorded at
    # t within ulps of an epsilon gate can recompute here as INVALID
    # (measured: a self-intersection recorded at t ~ tri_eps recomputes
    # as t_dst = -7e-8 < tri_eps). Without the (dst_lane < BIG) term,
    # such a lane takes safe_t = BIG = 3e38, the hit point overflows,
    # |p-c|^2 = inf, and the inf derivatives turn the whole tile's
    # parameter cotangents into NaN under the zero cotangents that
    # masked lanes carry. Treating the disagreement as a miss matches
    # the scan replay, whose inf-dst + isfinite() gate self-protects.
    dst_lane = jnp.where(tri_wins, t_t, s_t) if n_tris > 0 else s_t
    did_hit = did_hit & (dst_lane < BIG)
    safe_t = jnp.where(did_hit, dst_lane, 0.0)
    px = rox + rdx * safe_t
    py = roy + rdy * safe_t
    pz = roz + rdz * safe_t

    # ---- normals (forward kernel op-for-op) ----------------------------
    if n_spheres > 0:
        n2s = (px - scx) ** 2 + (py - scy) ** 2 + (pz - scz) ** 2
        # padded lanes (o = d = 0, winner channels = 0) make n2s == 0
        # exactly; see inv_2a for why the floor must be a select
        s_inv = jnp.where(
            (n2s > 0) & did_hit & ~tri_wins,
            1.0 / jnp.sqrt(jnp.where(n2s > 0, n2s, 1.0)), 0.0,
        )
        snX = (px - scx) * s_inv
        snY = (py - scy) * s_inv
        snZ = (pz - scz) * s_inv
    else:
        snX = snY = snZ = f0

    if n_tris > 0:
        # non-winner lanes extract an exact-zero normal (the one-hot is
        # all zeros), so tn2 == 0 EXACTLY — unlike the scan path, whose
        # gather always lands on a real triangle row. jnp.maximum(tn2,
        # 1e-38) would NaN the whole d_tri normal rows here: its VJP
        # multiplies the untaken branch's -inf derivative (d(1/sqrt)/dx
        # at 1e-38 overflows f32) by the 0 mask, and the extraction
        # transpose's matmul then smears that NaN across every triangle.
        # The select-based floor cuts the chain with an exact 0; winner
        # lanes (tn2 >> 1e-38) are bit-identical in value and gradient.
        tn2 = wnx * wnx + wny * wny + wnz * wnz
        t_inv = jnp.where(
            tn2 > 0, 1.0 / jnp.sqrt(jnp.where(tn2 > 0, tn2, 1.0)), 0.0
        )
        tnX, tnY, tnZ = wnx * t_inv, wny * t_inv, wnz * t_inv

        # ---- barycentric UVs (texture.h:16-63 / forward kernel) --------
        def area(px1, py1, pz1, qx, qy, qz):
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
            u = u - jnp.trunc(u)
            return jnp.where(u < 0.0, u + 1.0, u)

        uu = wrap(w_a * wua + w_b * wub + w_c * wuc)
        vv = wrap(w_a * wva + w_b * wvb + w_c * wvc)

        if has_atlas:
            # nearest-texel one-hot fetch over the f32 atlas operand
            # (exact; see _extract_channels); custom-vjp'd so the
            # one-hot/mask transients are never residuals
            tex_x = jnp.clip(
                jnp.floor(uu * atlas_w).astype(jnp.int32), 0, atlas_w - 1
            )
            tex_y = jnp.clip(
                jnp.floor(vv * atlas_h).astype(jnp.int32), 0, atlas_h - 1
            )
            mat_i = wmat.astype(jnp.int32)
            texrow_f = jnp.where(
                active & tri_wins, tex_y + atlas_h * mat_i, -1
            ).reshape(1, n).astype(jnp.float32)
            flat_x_f = tex_x.reshape(1, n).astype(jnp.float32)
            chan4 = _fetch_texels(atlas_a, texrow_f, flat_x_f, atlas_w)
            trgb_x, trgb_y, trgb_z, t_alpha_tex = (
                chan4[c : c + 1].reshape(rox.shape) for c in range(4)
            )
        else:
            trgb_x = jnp.full(rox.shape, 0.784, jnp.float32)
            trgb_y = jnp.full(rox.shape, 0.965, jnp.float32)
            trgb_z = f1
            t_alpha_tex = f1

        # ---- material table (texture.h:71-88 as data) ------------------
        mt = [f0] * 9
        for mslot in range(n_mats):
            m = tri_wins & (wmat == jnp.float32(mslot))
            for k in range(9):
                mt[k] = jnp.where(m, mv[k][mslot], mt[k])
        (temx, temy, temz, testr, trefl, tior, t_ac, t_uc, t_eft) = mt
        temx = jnp.where(t_eft > 0.0, temx * trgb_x, temx)
        temy = jnp.where(t_eft > 0.0, temy * trgb_y, temy)
        temz = jnp.where(t_eft > 0.0, temz * trgb_z, temz)
        t_alpha = jnp.where(t_uc > 0.0, t_ac, t_alpha_tex)

        # ---- merge winner material + normal ----------------------------
        tsel = lambda t, s: jnp.where(tri_wins, t, s)
        dfx, dfy, dfz = (
            tsel(trgb_x, sdfx), tsel(trgb_y, sdfy), tsel(trgb_z, sdfz)
        )
        emx, emy, emz = tsel(temx, semx), tsel(temy, semy), tsel(temz, semz)
        estr = tsel(testr, sestr)
        refl = tsel(trefl, srefl)
        alpha = tsel(t_alpha, salpha)
        ior = tsel(tior, sior)
        nX, nY, nZ = tsel(tnX, snX), tsel(tnY, snY), tsel(tnZ, snZ)
    else:
        dfx, dfy, dfz = sdfx, sdfy, sdfz
        emx, emy, emz = semx, semy, semz
        estr, refl, alpha, ior = sestr, srefl, salpha, sior
        nX, nY, nZ = snX, snY, snZ

    shade_kw = dict(
        alpha_lo=alpha_lo, alpha_hi=alpha_hi,
        bright_boost=bright_boost, bright_threshold=bright_threshold,
        hsl_l=hsl_l, hsl_s=hsl_s,
        e_scale_mult=e_scale_mult, ao_factor=aof if use_ao else None,
    )
    if sky_idx < 0:
        return shade_bounce(
            i, carry, did_hit, px, py, pz, nX, nY, nZ,
            dfx, dfy, dfz, emx, emy, emz, estr, refl, alpha, ior,
            u_d, v_d, roulette, **shade_kw,
        )

    # ---- sky slot replay (forward kernel's bookkeeping, minus the
    # direction recompute — zero cotangent) ------------------------------
    sklx, skly, sklz, slot_f = carry[22:26]
    sky_win = did_hit & (bidx == sky_idx)
    emx = jnp.where(sky_win, f0, emx)
    emy = jnp.where(sky_win, f0, emy)
    emz = jnp.where(sky_win, f0, emz)
    rcx, rcy, rcz = carry[6], carry[7], carry[8]   # pre-update throughput
    new_carry, emissive_ret, accum = shade_bounce(
        i, carry[:22], did_hit, px, py, pz, nX, nY, nZ,
        dfx, dfy, dfz, emx, emy, emz, estr, refl, alpha, ior,
        u_d, v_d, roulette, with_masks=True, **shade_kw,
    )
    take_e = emissive_ret & sky_win & (slot_f == 0.0)
    take_a = accum & sky_win & (slot_f == 0.0)
    e_scale = estr if e_scale_mult == 1.0 else estr * e_scale_mult
    sklx = jnp.where(take_e, f1, jnp.where(take_a, e_scale * rcx, sklx))
    skly = jnp.where(take_e, f1, jnp.where(take_a, e_scale * rcy, skly))
    sklz = jnp.where(take_e, f1, jnp.where(take_a, e_scale * rcz, sklz))
    slot_f = jnp.where(take_e | take_a, f1, slot_f)
    return new_carry + (sklx, skly, sklz, slot_f)


def _carry0(rox, roy, roz, rdx, rdy, rdz, sky_on: bool):
    f0 = jnp.zeros_like(rox)
    f1 = jnp.ones_like(rox)
    i0 = jnp.zeros(rox.shape, jnp.int32)
    carry = (
        rox, roy, roz, rdx, rdy, rdz,
        f1, f1, f1,
        f0, f0, f0,
        f0, f0, f0, f0, f0, f0,
        f1, f0, i0, f1,
    )
    if sky_on:
        carry = carry + (f0, f0, f0, f0)   # skl3, slot flag
    return carry


def _outs(carry, sky_on: bool):
    # (incoming, albedo AOV, normal AOV) x 3 (+ sky scale x 3)
    return carry[9:18] + carry[22:25] if sky_on else carry[9:18]


def _replay_all(
    sphvm, mv, tri_t, atlas_a,
    rox, roy, roz, rdx, rdy, rdz,
    draws, idxs, aofs,
    *, bounces, n_draws, **statics,
):
    """The full replayed bounce loop as a PURE function of traced values —
    the single-``jax.vjp`` form, structured as a ``lax.scan`` over
    bounces with a ``jax.checkpoint``'d body. Used in INTERPRET mode
    (the CPU test harness), where the kernel body is traced as XLA ops:
    the scan keeps ONE bounce body in the jaxpr, which matters because
    XLA:CPU's compile time on an unrolled vjp jaxpr is superlinear (tens
    of minutes at 5 bounces under the 8-virtual-device harness). The
    hardware path takes the windowed unrolled sweep in ``_bwd_kernel``
    instead: reverse-mode AD of a ``lax.scan`` stacks per-iteration
    residuals as extensive scan outputs, and Mosaic's scan lowering
    rejects extensive operands — a scan-under-vjp can NEVER lower
    in-kernel. Both structures apply bit-identical per-bounce ops.
    """
    sky_on = statics.get("sky_idx", -1) >= 0
    carry0 = _carry0(rox, roy, roz, rdx, rdy, rdz, sky_on)
    bounce_fn = jax.checkpoint(functools.partial(_replay_bounce, **statics))

    idx_arr = jnp.stack(idxs)                                 # (BN, R, L)
    u_arr = jnp.stack([draws[n_draws * i + 0] for i in range(bounces)])
    v_arr = jnp.stack([draws[n_draws * i + 1] for i in range(bounces)])
    r_arr = jnp.stack([draws[n_draws * i + 2] for i in range(bounces)])
    aof_arr = (
        jnp.stack(aofs) if aofs is not None
        else jnp.zeros((bounces,) + rox.shape, jnp.float32)
    )
    steps = jnp.arange(bounces, dtype=jnp.int32)

    def body(carry, xs):
        i, bidx, u_d, v_d, roulette, aof = xs
        return (
            bounce_fn(sphvm, mv, tri_t, atlas_a, carry, i, bidx, u_d, v_d,
                      roulette, aof),
            None,
        )

    final, _ = jax.lax.scan(
        body, carry0, (steps, idx_arr, u_arr, v_arr, r_arr, aof_arr)
    )
    return _outs(final, sky_on)


def _zero_carry_cotangent(carry):
    """A cotangent pytree for a replay carry: f32 zeros for float planes,
    float0 zeros for the i32 alpha_depth plane (what jax.vjp hands back
    and expects for integer residue)."""
    return tuple(
        np.zeros(jnp.shape(c), jax.dtypes.float0)
        if not jnp.issubdtype(jnp.result_type(c), jnp.inexact)
        else jnp.zeros_like(c)
        for c in carry
    )


def _bwd_kernel(
    sph_ref,      # VMEM (16, S_pad) f32: pack_sph_vm rows (14..15 zero)
    mat_ref,      # SMEM (9, M_pad)
    tri_ref,      # VMEM (32, T_pad) f32: pack_tri25 rows (25..31 zero)
    atlas_ref,    # VMEM (w4_pad, r_pad) f32: pack_atlas_f32
    ox, oy, oz, dx, dy, dz,            # VMEM (bwd_rows, LANE) ray tiles
    draws_ref,                          # VMEM (BN*3, bwd_rows, LANE)
    idx_ref,                            # VMEM (BN, bwd_rows, LANE) i32
    *rest,        # when use_ao: aof_ref (BN, bwd_rows, LANE) f32; then g
                  # cotangent tiles (9 base, +3 sky-scale when the scene
                  # has a sky), then the outputs: d_sph VMEM accumulator,
                  # d_mat SMEM, d_tri, d_atlas, 6 ray cotangents
    n_spheres, n_tris, n_mats, bounces, n_draws, unroll, use_ao,
    window, **statics,
):
    """Windowed in-kernel reverse sweep (module docstring): a cheap
    forward checkpoint sweep saves the carry at window-bounce
    boundaries, then each window is differentiated independently in
    reverse order with the carry cotangent threaded between windows.
    AD's live residual set is bounded by one window regardless of trace
    depth — the structure that removed the round-4 16-bounce scoped-VMEM
    ceiling. One window (bounces <= window) skips the forward sweep
    entirely and is exactly the round-4 single-vjp form.

    In interpret mode (unroll=False) the single-vjp lax.scan form runs
    instead (_replay_all — see its docstring for why the structures must
    differ per backend; values are bit-identical either way).
    """
    if use_ao:
        aof_ref, rest = rest[0], rest[1:]
    n_g = 12 if statics.get("sky_idx", -1) >= 0 else 9
    g_refs = rest[:n_g]
    (d_sph, d_mat, d_tri, d_atlas,
     d_ox, d_oy, d_oz, d_dx, d_dy, d_dz) = rest[n_g:]
    sphvm = sph_ref[:]
    mv = tuple(
        tuple(mat_ref[k, m] for m in range(n_mats)) for k in range(9)
    )
    draws = [draws_ref[j] for j in range(bounces * n_draws)]
    idxs = [idx_ref[j] for j in range(bounces)]
    aofs = [aof_ref[j] for j in range(bounces)] if use_ao else None
    tri_t = tri_ref[:]
    atlas_a = atlas_ref[:]
    sky_on = statics.get("sky_idx", -1) >= 0
    bounce_kw = dict(
        n_spheres=n_spheres, n_tris=n_tris, n_mats=n_mats,
        use_ao=use_ao, **statics,
    )

    if not unroll:
        def f(sphvm, mv, tri_t, atlas_a, rox, roy, roz, rdx, rdy, rdz):
            return _replay_all(
                sphvm, mv, tri_t, atlas_a, rox, roy, roz, rdx, rdy, rdz,
                draws, idxs, aofs, bounces=bounces, n_draws=n_draws,
                **bounce_kw,
            )

        _, vjp_fn = jax.vjp(
            f, sphvm, mv, tri_t, atlas_a,
            ox[:], oy[:], oz[:], dx[:], dy[:], dz[:],
        )
        g = tuple(r[:] for r in g_refs)
        (dsph, dmv, dtri, datlas,
         gox, goy, goz, gdx, gdy, gdz) = vjp_fn(g)
    else:
        # ---- windowed unrolled sweep (the hardware path) ---------------
        rows_t = ox.shape[0]
        n_lane = rows_t * LANE

        def win_fn(lo, hi):
            def f(sphvm, mv, tri_t, atlas_a, carry):
                # ONE batched extraction dot per table per window: the
                # sel vectors are recorded constants, so every bounce's
                # winner channels are available upfront — 2 dots replace
                # 2*W, removing the per-bounce MXU pipeline latency the
                # backward roofline showed serializing against the VPU
                w_b = hi - lo
                pre_tri_w = pre_sph_w = None
                # batch only in the single-window (shallow) regime: the
                # (R, W*n) extraction buffers pushed the 20-bounce deep
                # path 12KB past the scoped-VMEM limit (preflight r5),
                # and batching measured neutral (±1%) anyway — deep
                # windows keep the per-bounce dots
                batch = w_b == bounces
                if n_tris > 0 and batch:
                    sel_cat = jnp.concatenate([
                        jnp.where(
                            idxs[i] >= n_spheres, idxs[i] - n_spheres, -1
                        ).reshape(1, n_lane).astype(jnp.float32)
                        for i in range(lo, hi)
                    ], axis=1)
                    ext = _extract_channels(tri_t, sel_cat, EXT_CHUNK)
                    pre_tri_w = [
                        ext[:, k * n_lane : (k + 1) * n_lane]
                        for k in range(w_b)
                    ]
                if n_spheres > 0 and batch:
                    ssel_cat = jnp.concatenate([
                        jnp.where(
                            (idxs[i] >= 0)
                            & (idxs[i] < n_spheres if n_tris > 0
                               else idxs[i] >= 0),
                            idxs[i], -1,
                        ).reshape(1, n_lane).astype(jnp.float32)
                        for i in range(lo, hi)
                    ], axis=1)
                    sext = _extract_channels(sphvm, ssel_cat, SPH_CHUNK)
                    pre_sph_w = [
                        sext[:, k * n_lane : (k + 1) * n_lane]
                        for k in range(w_b)
                    ]
                for i in range(lo, hi):
                    carry = _replay_bounce(
                        sphvm, mv, tri_t, atlas_a, carry, i, idxs[i],
                        draws[n_draws * i + 0], draws[n_draws * i + 1],
                        draws[n_draws * i + 2],
                        aofs[i] if use_ao else None,
                        pre_tri=(
                            pre_tri_w[i - lo] if pre_tri_w is not None
                            else None
                        ),
                        pre_sph=(
                            pre_sph_w[i - lo] if pre_sph_w is not None
                            else None
                        ),
                        **bounce_kw,
                    )
                return carry
            return f

        window = min(window, bounces)
        bounds = list(range(0, bounces, window)) + [bounces]
        n_w = len(bounds) - 1
        carry = _carry0(ox[:], oy[:], oz[:], dx[:], dy[:], dz[:], sky_on)
        ckpts = [carry]
        for w in range(n_w - 1):   # the last window's end state is unused
            carry = win_fn(bounds[w], bounds[w + 1])(
                sphvm, mv, tri_t, atlas_a, carry
            )
            ckpts.append(carry)

        # inject the output cotangents into the final carry cotangent:
        # _outs is a pure projection (planes 9..17, + 22..24 with sky)
        d_carry = list(_zero_carry_cotangent(ckpts[0]))
        g = [r[:] for r in g_refs]
        for j in range(9):
            d_carry[9 + j] = g[j]
        if sky_on:
            for j in range(3):
                d_carry[22 + j] = g[9 + j]

        dsph = jnp.zeros_like(sphvm)
        dmv = tuple(tuple(0.0 for _ in range(n_mats)) for _ in range(9))
        dtri = jnp.zeros_like(tri_t)
        datlas = jnp.zeros_like(atlas_a)
        for w in reversed(range(n_w)):
            if w < n_w - 1:
                # serialization fence: window w's forward replay must be
                # SCHEDULED after window w+1's reverse sweep, or Mosaic
                # overlaps every window's residual lifetime and the
                # scoped-VMEM bound windowing exists for evaporates
                # (measured: W=4 and W=8 allocate identically without
                # this). ``dep`` is exactly +0.0 for any finite or
                # infinite cotangent (min(|x|, 0)), and ``c - dep``
                # preserves every f32 value INCLUDING -0.0 (IEEE:
                # x - (+0.0) == x), so the fence is value-free — it only
                # makes the checkpoint data-depend on the later window's
                # backward output.
                dep = jnp.minimum(jnp.abs(d_carry[9]), 0.0)
                ck = tuple(
                    c if not jnp.issubdtype(
                        jnp.result_type(c), jnp.inexact
                    ) else c - dep
                    for c in ckpts[w]
                )
            else:
                ck = ckpts[w]
            _, vjp_fn = jax.vjp(
                win_fn(bounds[w], bounds[w + 1]),
                sphvm, mv, tri_t, atlas_a, ck,
            )
            dsph_w, dmv_w, dtri_w, datlas_w, d_carry_in = vjp_fn(
                tuple(d_carry)
            )
            dsph = dsph + dsph_w
            dtri = dtri + dtri_w
            datlas = datlas + datlas_w
            dmv = tuple(
                tuple(dmv[k][m] + dmv_w[k][m] for m in range(n_mats))
                for k in range(9)
            )
            d_carry = list(d_carry_in)
        gox, goy, goz, gdx, gdy, gdz = d_carry[:6]

    d_ox[:] = gox
    d_oy[:] = goy
    d_oz[:] = goz
    d_dx[:] = gdx
    d_dy[:] = gdy
    d_dz[:] = gdz

    # sequential TPU grid steps make every += below race-free; pad slots
    # of d_mat are never written (the host-side packing vjp slices them
    # off before they could be read)
    first = pl.program_id(0) == 0
    d_sph[:] = jnp.where(first, jnp.zeros_like(dsph), d_sph[:]) + dsph
    for k in range(9):
        for mi in range(n_mats):
            prev = jnp.where(first, 0.0, d_mat[k, mi])
            d_mat[k, mi] = prev + dmv[k][mi]
    d_tri[:] = jnp.where(first, jnp.zeros_like(dtri), d_tri[:]) + dtri
    d_atlas[:] = (
        jnp.where(first, jnp.zeros_like(datlas), d_atlas[:]) + datlas
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_spheres", "n_tris", "n_mats", "has_atlas", "atlas_w", "atlas_h",
        "bounces", "sphere_eps", "det_eps", "tri_eps", "alpha_lo",
        "alpha_hi", "bright_boost", "bright_threshold", "n_draws",
        "hsl_l", "hsl_s", "sky_idx", "use_ao", "e_scale_mult",
        "bwd_rows", "window", "interpret",
    ),
)
def _bwd_call(
    sph, mats, tri32, atlas_a, ox, oy, oz, dx, dy, dz, draws, idx, aof, g9,
    *, n_spheres, n_tris, n_mats, has_atlas, atlas_w, atlas_h, bounces,
    sphere_eps, det_eps, tri_eps, alpha_lo, alpha_hi, bright_boost,
    bright_threshold, n_draws, hsl_l, hsl_s, sky_idx, use_ao,
    e_scale_mult, bwd_rows, window, interpret,
):
    # Mosaic cannot lower scan-under-vjp (extensive residual outputs);
    # XLA backends (interpret mode) cannot afford the unrolled vjp jaxpr.
    # _replay_all / _bwd_kernel docstrings have the full story. The env
    # var forces one structure for debugging.
    force = _os.environ.get("RAYTPU_MESH_BWD_UNROLL")
    unroll = (force == "1") if force else not interpret
    rows = ox.shape[0]
    grid = (rows // bwd_rows,)
    ray_spec = pl.BlockSpec(
        (bwd_rows, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    draws_spec = pl.BlockSpec(
        (draws.shape[0], bwd_rows, LANE), lambda i: (0, i, 0),
        memory_space=pltpu.VMEM,
    )
    idx_spec = pl.BlockSpec(
        (bounces, bwd_rows, LANE), lambda i: (0, i, 0),
        memory_space=pltpu.VMEM,
    )
    whole = lambda a: pl.BlockSpec(
        a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    smem_whole = lambda a: pl.BlockSpec(
        a.shape, lambda i: (0, 0), memory_space=pltpu.SMEM
    )
    kernel = functools.partial(
        _bwd_kernel,
        n_spheres=n_spheres, n_tris=n_tris, n_mats=n_mats,
        has_atlas=has_atlas,
        atlas_w=atlas_w, atlas_h=atlas_h, bounces=bounces,
        sphere_eps=sphere_eps, det_eps=det_eps, tri_eps=tri_eps,
        alpha_lo=alpha_lo, alpha_hi=alpha_hi, bright_boost=bright_boost,
        bright_threshold=bright_threshold, n_draws=n_draws,
        hsl_l=hsl_l, hsl_s=hsl_s, sky_idx=sky_idx, unroll=unroll,
        use_ao=use_ao, e_scale_mult=e_scale_mult, window=window,
    )
    aof_ops = [aof] if use_ao else []
    aof_specs = [idx_spec] if use_ao else []
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            whole(sph),                              # sphere table (VMEM)
            pl.BlockSpec(memory_space=pltpu.SMEM),   # mats
            whole(tri32),
            whole(atlas_a),
        ]
        + [ray_spec] * 6
        + [draws_spec, idx_spec]
        + aof_specs
        + [ray_spec] * len(g9),
        out_specs=[
            whole(sph), smem_whole(mats), whole(tri32), whole(atlas_a),
        ]
        + [ray_spec] * 6,
        out_shape=[
            jax.ShapeDtypeStruct(sph.shape, jnp.float32),
            jax.ShapeDtypeStruct(mats.shape, jnp.float32),
            jax.ShapeDtypeStruct(tri32.shape, jnp.float32),
            jax.ShapeDtypeStruct(atlas_a.shape, jnp.float32),
        ]
        + [jax.ShapeDtypeStruct((rows, LANE), jnp.float32)] * 6,
        interpret=interpret,
    )(sph, mats, tri32, atlas_a, ox, oy, oz, dx, dy, dz, draws, idx,
      *aof_ops, *g9)
    return out


def pack_sph_vm(scene: Scene) -> Array:
    """(16, S_pad) f32 sphere table for the one-hot MXU winner
    extraction: rows cx cy cz r | dif3 emi3 estr refl alpha ior (14 used,
    2 zero); lanes padded to a multiple of EXT_CHUNK. The VMEM twin of
    trace_scene.pack_sph's SMEM layout."""
    from raytpu.kernels.trace_scene import pack_sph

    sph14 = pack_sph(scene)                     # (14, s_pad8)
    n_s = sph14.shape[1]
    s_pad = max(-(-n_s // SPH_CHUNK) * SPH_CHUNK, SPH_CHUNK)
    return jnp.pad(sph14, ((0, 2), (0, s_pad - n_s)))


def _pack_diff(scene: Scene):
    """Every differentiable operand the backward kernel consumes, as a
    pure function of the scene — mesh_backward takes ``jax.vjp`` of this
    to map the kernel's table cotangents back onto the scene pytree
    (including the precompute() chain: d(edge/normal_raw) -> d(a,b,c))."""
    geom = precompute(scene.triangles)
    tri25 = pack_tri25(scene, geom)
    tri32 = jnp.pad(tri25, ((0, 32 - tri25.shape[0]), (0, 0)))
    return pack_sph_vm(scene), tri32, pack_mats(scene), pack_atlas_f32(scene)


def mesh_backward(
    scene: Scene,
    cfg: RenderConfig,
    origin: Vec3,
    direction: Vec3,
    bounce_draws: Array,
    idx: Array,
    g,
    interpret: bool,
    aof: Array | None = None,
):
    """Host wrapper: pack, run the backward kernel, and pull the table
    cotangents back through the packing onto the scene pytree. Returns
    the custom-VJP tuple (d_scene, d_origin, d_direction, d_draws).
    Serves mesh scenes AND (round 5) sphere scenes — n_tris == 0
    statically compiles the triangle machinery out of the kernel.

    ``g`` is (d_inc, d_alb, d_nrm) Vec3s, plus the sky-scale cotangent
    Vec3 for equirect-sky scenes (the slot-level custom VJP in
    trace_scene drops the unit-direction/early-flag cotangents, which
    are identically zero through the floor-quantized composition).
    ``aof`` is the forward-recorded (bounces, B) occlusion-factor array
    for AO configs (required when cfg.use_ao)."""
    b = origin.x.shape[0]
    bwd_rows, window = _bwd_tile(cfg.max_bounces)
    rows = max(-(-b // LANE), bwd_rows)
    rows = -(-rows // bwd_rows) * bwd_rows

    (sph, tri32, mats, atlas_a), pull = jax.vjp(
        lambda sc: _pack_diff(sc), scene
    )

    ox, oy, oz = (pad_rows(c, rows) for c in origin)
    dx, dy, dz = (pad_rows(c, rows) for c in direction)

    # the replay consumes only the scatter/roulette draws (u, v, r);
    # AO probe draws are not replayed (the occlusion factor is recorded)
    bn = bounce_draws.shape[0]
    draws3 = bounce_draws[:, :3, :]
    draws = draws3.reshape(bn * 3, b)
    draws = jnp.pad(draws, ((0, 0), (0, rows * LANE - b))).reshape(
        bn * 3, rows, LANE
    )
    idxp = jnp.pad(
        idx, ((0, 0), (0, rows * LANE - b)), constant_values=-1
    ).reshape(bn, rows, LANE)
    if cfg.use_ao:
        assert aof is not None, "AO backward replay needs recorded factors"
        aofp = jnp.pad(aof, ((0, 0), (0, rows * LANE - b))).reshape(
            bn, rows, LANE
        )
    else:
        aofp = jnp.zeros((bn, bwd_rows, LANE), jnp.float32)
    g9 = [pad_rows(c, rows) for vec in g for c in (vec.x, vec.y, vec.z)]

    n_tex = scene.atlas.alpha.shape[0]
    out = _bwd_call(
        sph, mats, tri32, atlas_a, ox, oy, oz, dx, dy, dz, draws, idxp,
        aofp, g9,
        n_spheres=scene.spheres.count,
        n_tris=scene.triangles.count,
        n_mats=scene.mat_table.emission_strength.shape[0],
        has_atlas=n_tex > 0,
        atlas_w=scene.atlas.width, atlas_h=scene.atlas.height,
        bounces=cfg.max_bounces, sphere_eps=cfg.sphere_eps,
        det_eps=cfg.tri_det_eps, tri_eps=cfg.tri_eps,
        alpha_lo=cfg.refr_alpha_lo, alpha_hi=cfg.refr_alpha_hi,
        bright_boost=cfg.bright_boost,
        bright_threshold=cfg.bright_threshold,
        n_draws=3, hsl_l=cfg.hsl_l_factor, hsl_s=cfg.hsl_s_factor,
        sky_idx=(
            scene.sky_sphere_index
            if scene.sky_sphere_index >= 0 and scene.sky.rgb.x.shape[0] > 0
            and len(g) > 3 else -1
        ),
        use_ao=cfg.use_ao,
        e_scale_mult=(
            cfg.ao_emission_factor * cfg.ao_intensity if cfg.use_ao else 1.0
        ),
        bwd_rows=bwd_rows, window=window,
        interpret=interpret,
    )
    d_sph, d_mat, d_tri, d_atlas = out[0], out[1], out[2], out[3]
    d_rays = [o.reshape(-1)[:b] for o in out[4:10]]

    (d_scene,) = pull((d_sph, d_tri, d_mat, d_atlas))
    # draw cotangents are structurally zero (module docstring)
    d_draws = jnp.zeros_like(bounce_draws)
    return (
        d_scene,
        Vec3(d_rays[0], d_rays[1], d_rays[2]),
        Vec3(d_rays[3], d_rays[4], d_rays[5]),
        d_draws,
    )
