"""Time the mesh megakernel vs the scan path on TPU, with variants that
isolate the texture-fetch cost (untextured) and the triangle-loop cost.

Usage: python tools/bench_mesh_kernel.py [scene] [W] [H] [spp]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    scene_path = sys.argv[1] if len(sys.argv) > 1 else "scenes/mcworld_water.toml"
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 320
    H = int(sys.argv[3]) if len(sys.argv) > 3 else 240
    spp = int(sys.argv[4]) if len(sys.argv) > 4 else 32

    from raytpu.config import load_scene
    from raytpu.core.types import TextureAtlas
    from raytpu.integrator.render import render

    scene, cam, cfg = load_scene(scene_path)
    cfg = cfg.replace(width=W, height=H, spp=spp)
    pids = jnp.arange(cfg.n_pixels, dtype=jnp.int32)
    key = jax.random.PRNGKey(0)
    rays = cfg.n_pixels * cfg.spp * cfg.max_bounces

    def sync(x):
        return float(jnp.sum(x))

    def timeit(name, c, s=scene):
        fn = jax.jit(lambda sc, ca, p, k: render(sc, ca, c, p, k))
        t0 = time.perf_counter()
        out = fn(s, cam, pids, key)
        sync(out.radiance.x)
        compile_s = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            sync(fn(s, cam, pids, key).radiance.x)
            best = min(best, time.perf_counter() - t0)
        print(f"{name:>24}: {best:7.3f}s  {rays/best/1e9:6.3f} Grays/s  "
              f"{best/rays*1e9:6.2f} ns/ray  (compile {compile_s:.0f}s)")
        return out, best

    if os.environ.get("RAYTPU_BENCH_MK_ONLY"):
        timeit("megakernel", cfg.replace(use_megakernel=True))
        return

    a, _ = timeit("scan", cfg)
    b, _ = timeit("scan+pallas_select", cfg.replace(use_pallas=True))
    c, _ = timeit("megakernel", cfg.replace(use_megakernel=True))
    untex = scene.replace(atlas=TextureAtlas.empty())
    timeit("megakernel untextured", cfg.replace(use_megakernel=True), untex)

    for name in ("radiance", "albedo", "normal"):
        x = np.asarray(getattr(a, name).to_array())
        y = np.asarray(getattr(c, name).to_array())
        print(f"  scan vs mk {name}: maxdiff {np.abs(x-y).max():.4g} "
              f"mismatch {float((x != y).mean()):.4%}")


if __name__ == "__main__":
    main()
