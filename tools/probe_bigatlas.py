"""Isolate the texture-fetch cost on the SCAN path for big-atlas scenes.

Renders the same scene twice — real atlas vs a 16x16 dummy (same
material table / geometry) — so the cost delta is the per-bounce texel
row-gather from the large table.

Usage: python tools/probe_bigatlas.py [scene] [W] [H] [spp]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    scene_path = sys.argv[1] if len(sys.argv) > 1 else "scenes/pyramide_eau.toml"
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 320
    H = int(sys.argv[3]) if len(sys.argv) > 3 else 200
    spp = int(sys.argv[4]) if len(sys.argv) > 4 else 16

    from raytpu.config import load_scene
    from raytpu.core.types import TextureAtlas
    from raytpu.core.vec3 import Vec3
    from raytpu.integrator.render import render

    scene, cam, cfg = load_scene(scene_path)
    cfg = cfg.replace(width=W, height=H, spp=spp)
    pids = jnp.arange(cfg.n_pixels, dtype=jnp.int32)
    key = jax.random.PRNGKey(0)
    rays = cfg.n_pixels * cfg.spp * cfg.max_bounces

    def timeit(name, s):
        fn = jax.jit(lambda sc, ca, p, k: render(sc, ca, cfg, p, k))
        t0 = time.perf_counter()
        out = fn(s, cam, pids, key)
        float(jnp.sum(out.radiance.x))
        compile_s = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.sum(fn(s, cam, pids, key).radiance.x))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:>16}: {best:7.3f}s  {best/rays*1e9:7.2f} ns/ray  "
              f"(compile {compile_s:.0f}s)")

    n_small = 16 * 16 * max(scene.atlas.count, 1)
    small = TextureAtlas(
        rgb=Vec3(*(jnp.full((n_small,), 0.5, jnp.float32) for _ in range(3))),
        alpha=jnp.ones((n_small,), jnp.float32),
        width=16, height=16,
    )
    timeit("small-atlas", scene.replace(atlas=small))
    timeit("real-atlas", scene)


if __name__ == "__main__":
    main()
