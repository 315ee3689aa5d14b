"""Component-level profiling of the mesh-scene render path on the TPU.

Round-2 diagnostic: configs 3-5 (triangle scenes) run 13-86x below the
sphere megakernel. This script times each candidate bottleneck in
isolation — dense distance matrix + argmin, Pallas winner selection,
winner row-gather, atlas row-gather, full closest_hit, full bounce —
inside jitted lax.scan loops (the axon tunnel adds ~0.3ms dispatch
latency per call and block_until_ready does not block; see
memory/axon-tpu-quirks).

Usage: python tools/profile_mesh.py [--scene scenes/mcworld_water.toml]
                                    [--batch 16384] [--iters 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x) -> float:
    # scalar device->host transfer: the only reliable sync on axon
    return float(jnp.sum(x))


def bench(name: str, fn, *args, inner: int, warmups: int = 1, reps: int = 3):
    """fn must contain its own lax.scan over `inner` iterations."""
    t0 = time.perf_counter()
    sync(fn(*args))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    per_iter = best / inner
    return {"name": name, "compile_s": round(compile_s, 1),
            "total_s": round(best, 4), "per_iter_ms": round(per_iter * 1e3, 3)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="scenes/mcworld_water.toml")
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--only", default=None, help="comma list of case names")
    args = ap.parse_args()
    B, N = args.batch, args.iters

    from raytpu.camera import get_rays
    from raytpu.config import load_scene
    from raytpu.core import rng
    from raytpu.core.gather import gather_channels
    from raytpu.geometry.triangle import precompute, triangle_distances
    from raytpu.integrator.hit import closest_hit
    from raytpu.integrator.path import n_bounce_draws, trace
    from raytpu.integrator.render import sample_rays
    from raytpu.materials.texture import atlas_fetch

    scene, cam, cfg = load_scene(args.scene)
    geom = precompute(scene.triangles)
    T = scene.triangles.count
    atlas_n = scene.atlas.alpha.shape[0]
    print(f"scene={args.scene} T={T} atlas_texels={atlas_n} "
          f"B={B} iters={N} device={jax.devices()[0].platform}")

    pixel_ids = jnp.arange(B, dtype=jnp.int32) % cfg.n_pixels
    key = jax.random.PRNGKey(0)
    pix_keys = rng.pixel_keys(key, pixel_ids)
    ray_keys = rng.sample_keys(pix_keys, jnp.int32(0))
    cam_draws, bounce_draws = rng.ray_uniforms(
        ray_keys, 4, n_bounce_draws(cfg), cfg.max_bounces
    )
    origin, direction = sample_rays(cam, cfg, pixel_ids, cam_draws)

    def scan_over(body):
        """Run body(i) N times inside one jit; body returns a scalar."""
        @jax.jit
        def run(o, d):
            def step(acc, i):
                # perturb the origin so iterations can't be CSE'd away
                oo = jax.tree.map(lambda c: c + i * 1e-9, o)
                return acc + body(oo, d, i), None
            out, _ = jax.lax.scan(
                step, jnp.float32(0.0), jnp.arange(N, dtype=jnp.float32)
            )
            return out
        return run

    cases = {}

    def case(name):
        def deco(body):
            cases[name] = scan_over(body)
            return body
        return deco

    @case("empty")
    def _(o, d, i):
        # measures the per-scan-step floor (perturbation + reduce only)
        return jnp.sum(o.x) * 1e-6

    @case("tri_dist_argmin")
    def _(o, d, i):
        dists = triangle_distances(o, d, geom, cfg.tri_det_eps, cfg.tri_eps)
        return jnp.sum(jnp.argmin(dists, axis=1).astype(jnp.float32))

    @case("both_gathers")
    def _(o, d, i):
        idx = (jnp.arange(B) + i.astype(jnp.int32)) % max(T, 1)
        g = gather_channels(chans, idx)
        acc = sum(jnp.sum(c.astype(jnp.float32)) for c in g[:3])
        if atlas_n > 0:
            u = (o.x * 7.7 + i) % 1.0
            v = (o.y * 3.3) % 1.0
            mid = (jnp.arange(B) % scene.atlas.count).astype(jnp.int32)
            rgb, a = atlas_fetch(scene.atlas, mid, u, v)
            acc = acc + jnp.sum(rgb.x) + jnp.sum(a)
        return acc

    @case("pallas_select")
    def _(o, d, i):
        from raytpu.kernels.intersect import pallas_select
        t, idx = pallas_select(
            scene, geom, o, d, cfg.sphere_eps, cfg.tri_det_eps, cfg.tri_eps
        )
        return jnp.sum(idx.astype(jnp.float32))

    tris = scene.triangles
    chans = [
        geom.a.x, geom.a.y, geom.a.z,
        geom.edge_ab.x, geom.edge_ab.y, geom.edge_ab.z,
        geom.edge_ac.x, geom.edge_ac.y, geom.edge_ac.z,
        geom.normal_raw.x, geom.normal_raw.y, geom.normal_raw.z,
        tris.b.x, tris.b.y, tris.b.z, tris.c.x, tris.c.y, tris.c.z,
        tris.ua, tris.va, tris.ub, tris.vb, tris.uc, tris.vc,
        tris.mat_id,
    ]

    @case("winner_gather25")
    def _(o, d, i):
        idx = (jnp.arange(B) + i.astype(jnp.int32)) % max(T, 1)
        g = gather_channels(chans, idx)
        return sum(jnp.sum(c.astype(jnp.float32)) for c in g[:3])

    if atlas_n > 0:
        @case("atlas_gather")
        def _(o, d, i):
            u = (o.x * 7.7 + i) % 1.0
            v = (o.y * 3.3) % 1.0
            mid = (jnp.arange(B) % scene.atlas.count).astype(jnp.int32)
            rgb, a = atlas_fetch(scene.atlas, mid, u, v)
            return jnp.sum(rgb.x) + jnp.sum(a)

    @case("closest_hit_xla")
    def _(o, d, i):
        h = closest_hit(scene, geom, o, d, cfg)
        return jnp.sum(h.dst * 0.0 + h.mat.diffuse.x)

    @case("closest_hit_pallas")
    def _(o, d, i):
        h = closest_hit(scene, geom, o, d, cfg.replace(use_pallas=True))
        return jnp.sum(h.dst * 0.0 + h.mat.diffuse.x)

    # full bounce loops: per-iteration cost = bounces * per-bounce
    @case("trace_xla")
    def _(o, d, i):
        rad, alb, nrm = trace(scene, cfg, o, d, bounce_draws)
        return jnp.sum(rad.x)

    @case("trace_pallas")
    def _(o, d, i):
        rad, alb, nrm = trace(
            scene, cfg.replace(use_pallas=True), o, d, bounce_draws
        )
        return jnp.sum(rad.x)

    only = set(args.only.split(",")) if args.only else None
    results = []
    for name, fn in cases.items():
        if only and name not in only:
            continue
        try:
            r = bench(name, fn, origin, direction, inner=N)
        except Exception as e:  # noqa: BLE001 — report and continue
            r = {"name": name, "error": str(e)[:200]}
        # normalize: ns per ray (per bounce for the trace cases)
        if "per_iter_ms" in r:
            denom = B * (cfg.max_bounces if name.startswith("trace") else 1)
            r["ns_per_ray"] = round(r["per_iter_ms"] * 1e6 / denom, 2)
        results.append(r)
        print(json.dumps(r), flush=True)

    print("\nsummary (ns/ray):")
    for r in results:
        if "ns_per_ray" in r:
            print(f"  {r['name']:>20}: {r['ns_per_ray']:8.2f}")


if __name__ == "__main__":
    main()
