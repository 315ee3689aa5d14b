"""Roofline / MFU accounting for the megakernels (VERDICT r2 task 6).

"1.73 Grays/s" says nothing about how close the kernel is to the
hardware ceiling. This tool bounds it honestly:

  1. MEASURE this chip's practical peaks (not datasheet numbers):
       * VPU: a Pallas kernel of K chained f32 FMAs per element over a
         VMEM-resident tile — the elementwise op rate every non-matmul
         instruction competes for.
       * MXU: a large bf16 matmul through XLA.
  2. COUNT the kernel's work exactly: walk the jaxpr of the kernel body
     (the same _forward_body the kernel runs) and count tile-shaped
     vector ops — mul/add/select/compare each count 1 VPU op,
     transcendentals are tallied separately (sqrt/rsqrt ~1 VPU slot on
     TPU; sin/cos/atan2 are polynomial expansions counted by their
     jaxpr footprint after lowering is NOT visible here, so they are
     reported as their own column rather than silently weighted).
  3. DIVIDE: achieved ops/s = ops/ray-bounce x measured rays/s, and
     report it as a fraction of the measured VPU peak.

Outputs docs/roofline.json (consumed by tools/update_readme_perf.py for
the README '% roofline' column) and prints the table that
docs/ROOFLINE.md records.

Run on the TPU rig:  python tools/roofline.py
"""

from __future__ import annotations

import json
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")

# classification of jaxpr primitives on tile-shaped operands
VPU_1 = {
    "mul", "add", "sub", "div", "neg", "max", "min", "and", "or", "not",
    "xor", "ge", "gt", "le", "lt", "eq", "ne", "select_n", "sign",
    "floor", "ceil", "round", "abs", "clamp", "convert_element_type",
    "integer_pow", "rem", "trunc", "is_finite", "square",
}
TRANSCENDENTAL = {"sqrt", "rsqrt", "sin", "cos", "tan", "exp", "log",
                  "atan2", "acos", "asin", "pow"}
SKIP = {"broadcast_in_dim", "reshape", "transpose", "squeeze", "iota",
        "concatenate", "slice", "dynamic_slice", "dynamic_update_slice",
        "stop_gradient", "copy", "pad", "gather", "reduce_sum",
        "reduce_max", "reduce_min", "reduce_and", "reduce_or", "argmax",
        "argmin", "split"}


def count_ops(jaxpr, tile_numel: int) -> Counter:
    """Count primitives whose output is tile-shaped, recursing through
    pjit/remat/scan/cond sub-jaxprs (scan bodies multiply by length)."""
    c: Counter = Counter()

    def walk(jx, mult):
        for eq in jx.eqns:
            sub = None
            submult = mult
            p = eq.primitive.name
            if p in ("pjit", "closed_call", "custom_jvp_call",
                     "custom_vjp_call", "remat", "checkpoint",
                     "custom_vjp_call_jaxpr"):
                prm = eq.params.get("jaxpr") or eq.params.get("call_jaxpr")
                sub = prm.jaxpr if hasattr(prm, "jaxpr") else prm
            elif p == "scan":
                sub = eq.params["jaxpr"].jaxpr
                submult = mult * eq.params["length"]
            elif p == "while":
                raise ValueError(
                    "while_loop has no static trip count — count its body "
                    "separately and multiply analytically"
                )
            elif p == "cond":
                # branches are alternatives; count the heavier one
                branches = eq.params["branches"]
                counts = []
                for br in branches:
                    cc = Counter()
                    _walk_into(br.jaxpr, mult, cc)
                    counts.append(cc)
                heavy = max(counts, key=lambda cc: sum(cc.values()))
                c.update(heavy)
                continue
            if sub is not None:
                walk(sub, submult)
                continue
            out_numel = max(
                (int(__import__("numpy").prod(v.aval.shape))
                 for v in eq.outvars if hasattr(v.aval, "shape")),
                default=0,
            )
            if out_numel != tile_numel:
                continue
            if p == "dot_general":
                # MACs = prod(out) * contraction dim
                lhs = eq.invars[0].aval.shape
                dn = eq.params["dimension_numbers"][0][0]
                k = 1
                for d in dn:
                    k *= lhs[d]
                c["__mxu_macs"] += mult * out_numel * k
            elif p in VPU_1:
                c[p] += mult
            elif p in TRANSCENDENTAL:
                c["__trans_" + p] += mult
            elif p not in SKIP:
                c["__other_" + p] += mult

    def _walk_into(jx, mult, into):
        nonlocal c
        saved, c = c, into
        walk(jx, mult)
        c = saved

    walk(jaxpr.jaxpr if hasattr(jaxpr, "jaxpr") else jaxpr, 1)
    return c


def count_ops_weighted(jaxpr, tile_numel: int) -> Counter:
    """Like count_ops, but EVERY vector op counts numel/tile_numel
    "tile-equivalents" instead of only exactly-tile-shaped outputs.

    The backward replay's dominant transients are NOT tile-shaped: the
    extraction one-hots are (chunk, rays) and the texel-fetch one-hot/
    mask are (texrows, rays) — a (128, rays) iota-compare is 128 tiles
    of VPU work. The forward counters ignore sub/super-tile ops because
    the forward bodies genuinely are tile-shaped; the backward counter
    must not.
    """
    import numpy as _np

    c: Counter = Counter()

    def walk(jx, mult):
        for eq in jx.eqns:
            sub = None
            submult = mult
            p = eq.primitive.name
            if p in ("pjit", "closed_call", "custom_jvp_call",
                     "custom_vjp_call", "remat", "checkpoint",
                     "custom_vjp_call_jaxpr"):
                prm = eq.params.get("jaxpr") or eq.params.get("call_jaxpr")
                sub = prm.jaxpr if hasattr(prm, "jaxpr") else prm
            elif p == "scan":
                sub = eq.params["jaxpr"].jaxpr
                submult = mult * eq.params["length"]
            elif p == "cond":
                heavy = None
                for br in eq.params["branches"]:
                    cc = Counter()
                    saved_c = dict(c)
                    c.clear()
                    walk(br.jaxpr, mult)
                    cc.update(c)
                    c.clear()
                    c.update(saved_c)
                    if heavy is None or sum(cc.values()) > sum(heavy.values()):
                        heavy = cc
                c.update(heavy)
                continue
            if sub is not None:
                walk(sub, submult)
                continue
            out_numel = max(
                (int(_np.prod(v.aval.shape))
                 for v in eq.outvars if hasattr(v.aval, "shape")),
                default=0,
            )
            w = out_numel / tile_numel
            if w < 1.0 / 128:     # scalars / tiny tables: noise
                continue
            if p == "dot_general":
                lhs = eq.invars[0].aval.shape
                dn = eq.params["dimension_numbers"][0][0]
                k = 1
                for d in dn:
                    k *= lhs[d]
                c["__mxu_macs"] += mult * out_numel * k / tile_numel
            elif p in VPU_1:
                c[p] += mult * w
            elif p in TRANSCENDENTAL:
                c["__trans_" + p] += mult * w
            elif p not in SKIP:
                c["__other_" + p] += mult * w

    walk(jaxpr.jaxpr if hasattr(jaxpr, "jaxpr") else jaxpr, 1)
    return c


def backward_counts(scene_path, bounces: int) -> dict:
    """VPU/MXU work of the backward megakernel per ray-bounce: trace the
    EXACT windowed in-kernel reverse computation (_bwd_kernel's unrolled
    path, including the one-hot rebuilds inside the custom VJPs) and
    count its ops with the numel-weighted counter. scene_path None =
    the flagship Cornell spheres."""
    import jax
    import jax.numpy as jnp

    from raytpu.config import load_scene
    from raytpu.kernels import trace_scene_bwd as tb

    if scene_path is None:
        from raytpu.scenes import cornell_box

        scene, _, cfg0 = cornell_box()
    else:
        scene, _, cfg0 = load_scene(scene_path)
    cfg = cfg0.replace(max_bounces=bounces)
    rows, window = tb._bwd_tile(bounces)
    tile = rows * 128
    sphvm, tri32, mats, atlas_a = tb._pack_diff(scene)
    n_mats = scene.mat_table.emission_strength.shape[0]
    n_tex = scene.atlas.alpha.shape[0]
    sky_on = (
        scene.sky_sphere_index >= 0 and scene.sky.rgb.x.shape[0] > 0
    )
    statics = dict(
        n_spheres=scene.spheres.count, n_tris=scene.triangles.count,
        n_mats=n_mats, has_atlas=n_tex > 0,
        atlas_w=scene.atlas.width, atlas_h=scene.atlas.height,
        sphere_eps=cfg.sphere_eps, det_eps=cfg.tri_det_eps,
        tri_eps=cfg.tri_eps, alpha_lo=cfg.refr_alpha_lo,
        alpha_hi=cfg.refr_alpha_hi, bright_boost=cfg.bright_boost,
        bright_threshold=cfg.bright_threshold,
        hsl_l=cfg.hsl_l_factor, hsl_s=cfg.hsl_s_factor,
        sky_idx=scene.sky_sphere_index if sky_on else -1,
        use_ao=False, e_scale_mult=1.0,
    )
    t = jnp.zeros((rows, 128), jnp.float32)
    ti = jnp.zeros((rows, 128), jnp.int32)
    mv = tuple(tuple(mats[k, m] for m in range(n_mats)) for k in range(9))
    n_g = 12 if sky_on else 9

    def body(sphvm, tri_t, atlas_a, ox, oy, oz, dx, dy, dz, g):
        def win_fn(lo, hi):
            def f(sphvm, mv_, tri_t, atlas_a, carry):
                for i in range(lo, hi):
                    carry = tb._replay_bounce(
                        sphvm, mv_, tri_t, atlas_a, carry, i, ti,
                        t, t, t, None, **statics,
                    )
                return carry
            return f

        w = min(window, bounces)
        bounds = list(range(0, bounces, w)) + [bounces]
        n_w = len(bounds) - 1
        carry = tb._carry0(ox, oy, oz, dx, dy, dz, sky_on)
        ckpts = [carry]
        for k in range(n_w - 1):
            carry = win_fn(bounds[k], bounds[k + 1])(
                sphvm, mv, tri_t, atlas_a, carry
            )
            ckpts.append(carry)
        d_carry = list(tb._zero_carry_cotangent(ckpts[0]))
        for j in range(9):
            d_carry[9 + j] = g[j]
        if sky_on:
            for j in range(3):
                d_carry[22 + j] = g[9 + j]
        dsph = jnp.zeros_like(sphvm)
        dtri = jnp.zeros_like(tri_t)
        datlas = jnp.zeros_like(atlas_a)
        for k in reversed(range(n_w)):
            _, vjp_fn = jax.vjp(
                win_fn(bounds[k], bounds[k + 1]),
                sphvm, mv, tri_t, atlas_a, tuple(ckpts[k]),
            )
            dsph_w, _dmv, dtri_w, datlas_w, d_carry_in = vjp_fn(
                tuple(d_carry)
            )
            dsph = dsph + dsph_w
            dtri = dtri + dtri_w
            datlas = datlas + datlas_w
            d_carry = list(d_carry_in)
        return dsph, dtri, datlas, d_carry[:6]

    g = tuple(t for _ in range(n_g))
    jx = jax.make_jaxpr(body)(
        sphvm, tri32, atlas_a, t, t, t, t, t, t, g
    )
    c = count_ops_weighted(jx, tile)
    out = summarize(c, bounces)
    out["vpu_ops_per_ray_bounce"] = int(out["vpu_ops_per_ray_bounce"])
    out["mxu_macs_per_ray_bounce"] = int(out["mxu_macs_per_ray_bounce"])
    out["note"] = (
        f"windowed replay vjp, rows={rows} window={window}; weighted "
        f"counter (one-hot builds included)"
    )
    return out


def sphere_kernel_counts(bounces: int = 6, n_spheres: int = 10) -> dict:
    import jax
    import jax.numpy as jnp

    from raytpu.kernels import trace_spheres as ts

    t = jnp.zeros((ts.ROWS, 128), jnp.float32)
    sv = tuple(
        tuple(jnp.float32(0.5) for _ in range(n_spheres)) for _ in range(14)
    )
    draws = [t] * (bounces * 3)

    def body(sv, ox, oy, oz, dx, dy, dz):
        return ts._forward_body(
            sv, ox, oy, oz, dx, dy, dz, draws,
            n_spheres=n_spheres, bounces=bounces, sphere_eps=1e-4,
            alpha_lo=1e-4, alpha_hi=0.99, bright_boost=1.3,
            bright_threshold=0.5, n_draws=3, use_ao=False, ao_samples=1,
            ao_intensity=2.5, ao_emission_factor=1.5, hsl_l=1.0, hsl_s=1.0,
        )

    jx = jax.make_jaxpr(body)(sv, t, t, t, t, t, t)
    c = count_ops(jx, ts.ROWS * 128)
    return summarize(c, bounces)


def mesh_kernel_counts(scene_path: str, bounces: int) -> dict:
    """The mesh body has dynamic-trip fori/cond loops, so count the
    pieces and combine analytically: tri_body x T (the cull is charged as
    if every chunk runs — the no-cull upper bound; the cull's own slab
    test x n_chunks is added), + extraction/texel MXU MACs, + the shared
    shade_bounce."""
    import jax
    import jax.numpy as jnp

    from raytpu.config import load_scene
    from raytpu.kernels import trace_scene as tsc

    scene, _, _ = load_scene(scene_path)
    n_t = scene.triangles.count
    has_atlas = scene.atlas.alpha.shape[0] > 0
    w = max(scene.atlas.width, 1)
    rows = tsc._pick_rows(n_t, 4 * w if has_atlas else 0)
    tile = rows * 128
    t = jnp.zeros((rows, 128), jnp.float32)

    # --- per-triangle inner loop (Moller-Trumbore + winner select) ----
    def tri_once(rox, roy, roz, rdx, rdy, rdz, best, bidx):
        s = jnp.float32(0.5)
        ax, ay, az = s, s, s
        abx, aby, abz = s, s, s
        acx, acy, acz = s, s, s
        nx, ny, nz = s, s, s
        aox, aoy, aoz = rox - ax, roy - ay, roz - az
        daox = aoy * rdz - aoz * rdy
        daoy = aoz * rdx - aox * rdz
        daoz = aox * rdy - aoy * rdx
        det = -(rdx * nx + rdy * ny + rdz * nz)
        inv_det = 1.0 / jnp.where(det >= 1e-6, det, 1.0)
        dst = (aox * nx + aoy * ny + aoz * nz) * inv_det
        u = (acx * daox + acy * daoy + acz * daoz) * inv_det
        v = -(abx * daox + aby * daoy + abz * daoz) * inv_det
        ww = 1.0 - u - v
        valid = (
            (det >= 1e-6) & (dst >= 1e-7) & (u >= 1e-7) & (v >= 1e-7)
            & (ww >= 1e-7)
        )
        tt = jnp.where(valid, dst, 3e38)
        better = tt < best
        return jnp.where(better, tt, best), jnp.where(better, 1, bidx)

    jx = jax.make_jaxpr(tri_once)(
        t, t, t, t, t, t, t, jnp.zeros((rows, 128), jnp.int32)
    )
    tri_ops = sum(count_ops(jx, tile).values())

    # --- merged-mode bodies (kernels/trace_scene.py): axis-aligned rect
    # / axis-aligned tri / general fraction-ranked quad ---------------
    def aa_rect_once(so_k, detg, X1, X2, d1, d2, epsd, hid, bg):
        s = jnp.float32(0.5)
        numr = so_k - s
        pug = (X1 - s * detg + numr * d1) * s
        pvg = (X2 - s * detg + numr * d2) * s
        valid = (
            (detg >= s)
            & (jnp.minimum(numr, jnp.minimum(pug, pvg)) >= epsd)
            & (jnp.maximum(pug, pvg) <= hid)
        )
        num_c = jnp.where(valid, numr, 3e38)
        win = jnp.where(pug + pvg <= detg, s, s).astype(jnp.int32)
        better = num_c < bg
        return jnp.where(better, num_c, bg), jnp.where(better, win, 0)

    jxa = jax.make_jaxpr(aa_rect_once)(t, t, t, t, t, t, t, t, t)
    aa_rect_ops = sum(count_ops(jxa, tile).values())

    def aa_tri_once(so_k, detg, X1, X2, d1, d2, epsd, hid, bg):
        s = jnp.float32(0.5)
        numr = so_k - s
        P1 = X1 - s * detg + numr * d1
        P2 = X2 - s * detg + numr * d2
        ug = P1 * s + P2 * s
        vg = P1 * s + P2 * s
        valid = (
            (detg >= s)
            & (jnp.minimum(numr, jnp.minimum(ug, vg)) >= epsd)
            & (ug + vg <= hid)
        )
        num_c = jnp.where(valid, numr, 3e38)
        better = num_c < bg
        return jnp.where(better, num_c, bg)

    jxt = jax.make_jaxpr(aa_tri_once)(t, t, t, t, t, t, t, t, t)
    aa_tri_ops = sum(count_ops(jxt, tile).values())

    def gen_quad_once(rox, roy, roz, rdx, rdy, rdz, best, bden):
        s = jnp.float32(0.5)
        aox, aoy, aoz = rox - s, roy - s, roz - s
        daox = aoy * rdz - aoz * rdy
        daoy = aoz * rdx - aox * rdz
        daoz = aox * rdy - aoy * rdx
        det = -(rdx * s + rdy * s + rdz * s)
        num = aox * s + aoy * s + aoz * s
        pu = s * daox + s * daoy + s * daoz
        pv = -(s * daox + s * daoy + s * daoz)
        lo = 1e-7 * det
        hi = (1.0 - 1e-7) * det
        valid = (
            (det >= 1e-6) & (num >= lo)
            & (pu >= lo) & (pv >= lo) & (pu <= hi) & (pv <= hi)
        )
        num_c = jnp.where(valid, num, 3e38)
        den_c = jnp.where(valid, det, 1.0)
        win = jnp.where(pu + pv <= det, s, s).astype(jnp.int32)
        better = num_c * bden < best * den_c
        return (jnp.where(better, num_c, best),
                jnp.where(better, den_c, bden),
                jnp.where(better, win, 0))

    jxq = jax.make_jaxpr(gen_quad_once)(t, t, t, t, t, t, t, t)
    gen_quad_ops = sum(count_ops(jxq, tile).values())

    # --- per-chunk slab test -------------------------------------------
    def slab(rox, roy, roz, idx, idy, idz, best):
        s = jnp.float32(0.5)
        t0x = (s - rox) * idx
        t1x = (s - rox) * idx
        t0y = (s - roy) * idy
        t1y = (s - roy) * idy
        t0z = (s - roz) * idz
        t1z = (s - roz) * idz
        tmin = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
            jnp.minimum(t0z, t1z),
        )
        tmax = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.maximum(t0z, t1z),
        )
        return (tmax >= tmin) & (tmax >= 0.0) & (tmin < best)

    jxs = jax.make_jaxpr(slab)(t, t, t, t, t, t, t)
    slab_ops = sum(count_ops(jxs, tile).values())
    n_chunks = -(-n_t // tsc.CULL_CHUNK)

    # --- the shared shading tail (shade_bounce + merge, counted via the
    # sphere body minus its intersection loop is close enough; charge a
    # measured-constant 300 VPU ops/ray-bounce for shading+extraction
    # reshapes, dominated by the tri loop at mcworld scales) ------------
    shade_ops = 300

    # --- MXU MACs: winner extraction + texel fetch ---------------------
    t_pad = max(-(-n_t // tsc.EXT_CHUNK) * tsc.EXT_CHUNK, tsc.EXT_CHUNK)
    if n_t <= tsc.SMALL_EXT_TRIS:
        # r5: tiny meshes extract via SMEM select-chain (19*T wheres),
        # no one-hot dot at all
        ext_macs = 0
        shade_extra = 19 * n_t
    else:
        ext_macs = 64 * t_pad        # (64, T_pad) @ (T_pad, n) per ray
        shade_extra = 0
    tex_macs = 0
    if has_atlas:
        n_tex = scene.atlas.alpha.shape[0]
        n_rows_tex = n_tex // w
        r_pad = max(-(-n_rows_tex // 128) * 128, 128)
        w4p = -(-4 * w // 8) * 8
        limbs = 1 if scene.atlas.packed is not None else 3
        tex_macs = limbs * w4p * r_pad + 8 * w4p

    # --- combine by the scene's actual primitive mix: merged scenes
    # (quad_pairs detected) split into aa rects / aa tris / general
    # quads / general leftovers (kernels/trace_scene.py merged mode);
    # unmerged scenes run the chunk-culled per-triangle loop -----------
    _, _, cfg = load_scene(scene_path)
    pairs = cfg.quad_pairs if cfg.merge_quads else ()
    if pairs:
        rect_classes = (
            cfg.quad_aa_rects if len(cfg.quad_aa_rects) == len(pairs)
            else tuple(() for _ in pairs)
        )
        n_aa_rect = sum(1 for c in rect_classes if c != ())
        n_gen_quad = len(pairs) - n_aa_rect
        n_aa_tri = len(cfg.quad_aa_tris)
        n_gen_left = n_t - 2 * len(pairs) - n_aa_tri
        prim_ops = (
            aa_rect_ops * n_aa_rect + aa_tri_ops * n_aa_tri
            + gen_quad_ops * (n_gen_quad + n_gen_left)
        )
        # flat loops: slab culls only above the 2*CULL_CHUNK threshold
        cull_ops = sum(
            slab_ops * (-(-n // tsc.CULL_CHUNK))
            for n in (n_gen_quad, n_gen_left)
            if n > 2 * tsc.CULL_CHUNK
        )
        note = (
            f"aa_rect={aa_rect_ops}x{n_aa_rect} aa_tri={aa_tri_ops}"
            f"x{n_aa_tri} gen={gen_quad_ops}x{n_gen_quad + n_gen_left}, "
            f"shade~{shade_ops}"
        )
    else:
        prim_ops = tri_ops * n_t
        cull_ops = slab_ops * n_chunks
        note = (
            f"tri_ops={tri_ops}/tri x {n_t} tris (no-cull upper bound), "
            f"slab={slab_ops} x {n_chunks} chunks, shade~{shade_ops}"
        )

    per_ray_bounce_vpu = prim_ops + cull_ops + shade_ops + shade_extra
    return {
        "vpu_ops_per_ray_bounce": per_ray_bounce_vpu,
        "vpu_tri_loop": prim_ops,
        "vpu_cull": cull_ops,
        "transcendentals_per_ray_bounce": 0,   # folded into shade const
        "mxu_macs_per_ray_bounce": ext_macs + tex_macs,
        "note": note,
    }


def summarize(c: Counter, bounces: int) -> dict:
    vpu = sum(v for k, v in c.items() if not k.startswith("__"))
    trans = sum(v for k, v in c.items() if k.startswith("__trans"))
    macs = c.get("__mxu_macs", 0)
    other = {k: v for k, v in c.items() if k.startswith("__other")}
    return {
        "vpu_ops_per_ray_bounce": vpu // bounces,
        "transcendentals_per_ray_bounce": trans // bounces,
        "mxu_macs_per_ray_bounce": macs // bounces,
        "other": other,
    }


def measure_vpu_peak() -> float:
    """Measured f32 elementwise peak: K chained FMAs per element in a
    Pallas kernel over VMEM tiles. Returns ops/s (1 FMA = 2 ops)."""
    import functools
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from bench import _sync, _time_best

    K = 512
    ROWS, LANES, TILES = 256, 128, 64

    def kernel(x_ref, o_ref):
        x = x_ref[:]
        a = jnp.float32(1.0000001)
        b = jnp.float32(1e-7)
        for _ in range(K):
            x = x * a + b
        o_ref[:] = x

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            grid=(TILES,),
            in_specs=[pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((TILES * ROWS, LANES),
                                           jnp.float32),
        )(x)

    # chain REPS kernel invocations inside ONE jit: each dispatch over
    # the tunnel costs ~28ms of fixed overhead, which at a single
    # ~2G-op call would understate the peak ~14x (it did, r4: 0.08
    # "Tops/s" while real kernels measured 0.9+)
    REPS = 64

    @jax.jit
    def run_n(x):
        return jax.lax.fori_loop(0, REPS, lambda _, v: run(v), x)

    x = jnp.ones((TILES * ROWS, LANES), jnp.float32)
    _sync(run_n(x))
    dt = _time_best(lambda: _sync(run_n(x)))
    return 2.0 * K * TILES * ROWS * LANES * REPS / dt


def measure_mxu_peak() -> float:
    """Measured bf16 matmul peak via XLA (FLOPs/s)."""
    import jax
    import jax.numpy as jnp

    from bench import _sync, _time_best

    n = 4096
    REPS = 32   # chained inside one jit — same dispatch-overhead
                # amortization as measure_vpu_peak
    a = jnp.ones((n, n), jnp.bfloat16)
    b = jnp.eye(n, dtype=jnp.bfloat16)   # data-dependent chain, stable values

    @jax.jit
    def f(a, b):
        def step(_, c):
            return jnp.dot(c, b, preferred_element_type=jnp.float32).astype(
                jnp.bfloat16
            )

        return jax.lax.fori_loop(0, REPS, step, a)

    _sync(f(a, b))
    dt = _time_best(lambda: _sync(f(a, b)))
    return 2.0 * n * n * n * REPS / dt


def main() -> None:
    from bench import previous_value as _recorded_value

    # optional argv[1]: a file of bench.py JSON lines from THIS rig/run
    # (fresher than the last driver-recorded round) — its rates win
    fresh: dict[str, float] = {}
    if len(sys.argv) > 1 and os.path.exists(sys.argv[1]):
        with open(sys.argv[1]) as f:
            for line in f:
                line = line.strip()
                if line.startswith("{"):
                    try:
                        rec = json.loads(line)
                        if "metric" in rec and "value" in rec:
                            fresh[rec["metric"]] = float(rec["value"])
                    except json.JSONDecodeError:
                        pass

    def previous_value(root, metric):
        return fresh.get(metric) or _recorded_value(root, metric)

    vpu_peak = measure_vpu_peak()
    mxu_peak = measure_mxu_peak()
    print(f"measured VPU f32 peak: {vpu_peak/1e12:.2f} Tops/s")
    print(f"measured MXU bf16 peak: {mxu_peak/1e12:.1f} TFLOPs/s")

    rows = {}
    # flagship sphere kernel at the recorded headline rate
    counts = sphere_kernel_counts()
    rate = previous_value(ROOT, "fwd_rays_per_sec_chip_1200x900x1000spp_6b")
    rows["flagship_spheres"] = (counts, rate)
    for tag, spec, bounces, metric in (
        ("pyramide", "scenes/pyramide.toml", 5,
         "fwd_rays_per_sec_chip_cfg3_pyramide_1000x750"),
        ("grassblock", "scenes/grass_block.toml", 5,
         "fwd_rays_per_sec_chip_cfg4_grassblock_1000x750"),
        ("mcworld", "scenes/mcworld_water.toml", 6,
         "fwd_rays_per_sec_chip_cfg5_mcworld_1200x900"),
    ):
        counts = mesh_kernel_counts(os.path.join(ROOT, spec), bounces)
        rows[tag] = (counts, previous_value(ROOT, metric))

    # backward rows (VERDICT r4 next #1: "the accounting that drove
    # forward optimization stops exactly where the remaining gap is").
    # The bwd-only rate is derived from the recorded pair:
    #   1/rate_bwd = 1/rate_fwd+bwd - 1/rate_fwd
    for tag, spec, bounces, fwd_m, fb_m in (
        ("flagship_spheres_bwd", None, 6,
         "fwd_rays_per_sec_chip_1200x900x1000spp_6b",
         "fwd_bwd_rays_per_sec_chip_1200x900_6b"),
        ("pyramide_bwd", "scenes/pyramide.toml", 5,
         "fwd_rays_per_sec_chip_cfg3_pyramide_1000x750",
         "fwd_bwd_rays_per_sec_chip_cfg3_pyramide_1000x750"),
        ("grassblock_bwd", "scenes/grass_block.toml", 5,
         "fwd_rays_per_sec_chip_cfg4_grassblock_1000x750",
         "fwd_bwd_rays_per_sec_chip_cfg4_grassblock_1000x750"),
        ("mcworld_bwd", "scenes/mcworld_water.toml", 6,
         "fwd_rays_per_sec_chip_cfg5_mcworld_1200x900",
         "fwd_bwd_rays_per_sec_chip_cfg5_mcworld_1200x900"),
    ):
        spec_path = os.path.join(ROOT, spec) if spec else None
        counts = backward_counts(spec_path, bounces)
        fwd = previous_value(ROOT, fwd_m)
        fb = previous_value(ROOT, fb_m)
        rate = None
        if fwd and fb and fb < fwd:
            rate = 1.0 / (1.0 / fb - 1.0 / fwd)
        rows[tag] = (counts, rate)

    out = {"vpu_peak_ops_s": vpu_peak, "mxu_peak_flops_s": mxu_peak,
           "kernels": {}}
    for tag, (counts, rate) in rows.items():
        entry = dict(counts)
        entry["rays_per_sec"] = rate
        if rate:
            ach_vpu = counts["vpu_ops_per_ray_bounce"] * rate
            ach_mxu = counts["mxu_macs_per_ray_bounce"] * rate * 2.0
            entry["achieved_vpu_ops_s"] = ach_vpu
            entry["vpu_roofline_frac"] = ach_vpu / vpu_peak
            entry["mxu_roofline_frac"] = ach_mxu / mxu_peak
            print(
                f"{tag}: {counts['vpu_ops_per_ray_bounce']} VPU ops/rb "
                f"(+{counts['transcendentals_per_ray_bounce']} transc.), "
                f"{counts['mxu_macs_per_ray_bounce']} MACs/rb, "
                f"{rate/1e9:.2f} Grays/s -> "
                f"{ach_vpu/1e12:.2f} Tops/s = "
                f"{100*ach_vpu/vpu_peak:.0f}% of VPU peak, "
                f"{100*ach_mxu/mxu_peak:.1f}% of MXU peak"
            )
        out["kernels"][tag] = entry

    path = os.path.join(ROOT, "docs", "roofline.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
