"""Headline benchmark: forward rays/sec/chip at the BASELINE.json flagship
config (1200x900, 1000 spp, 6 bounces, 10-sphere Cornell scene —
/root/reference/README.md:99-122's comparison config).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the most recent recorded BENCH_r*.json
value (the reference publishes no machine-readable numbers — BASELINE.md).

Usage: python bench.py [--spp N] [--width W] [--height H] [--bounces B]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys
import time


def previous_value(repo_root: str) -> float | None:
    """Latest recorded bench value from BENCH_r{N}.json, if any."""
    best_round, best_val = -1, None
    for path in glob.glob(os.path.join(repo_root, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            with open(path) as f:
                data = json.load(f)
            val = float(data["value"])
        except Exception:
            continue
        if int(m.group(1)) > best_round:
            best_round, best_val = int(m.group(1)), val
    return best_val


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=1000)
    ap.add_argument("--width", type=int, default=1200)
    ap.add_argument("--height", type=int, default=900)
    ap.add_argument("--bounces", type=int, default=6)
    ap.add_argument(
        "--mesh", default=None, metavar="TILESxSAMPLES",
        help="shard over a ('tiles','samples') device mesh, e.g. 1x4 — "
             "for measuring multi-chip scaling efficiency (rays/s/chip "
             "at N chips vs 1)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from raytpu.integrator.render import render
    from raytpu.scenes import cornell_box

    scene, cam, cfg = cornell_box()
    cfg = cfg.replace(
        width=args.width, height=args.height,
        spp=args.spp, max_bounces=args.bounces,
        # production fast path: the full-bounce-loop Pallas megakernel
        # (bit-identical to the scan integrator, tests/test_megakernel.py;
        # render() falls back automatically on unsupported configs)
        use_megakernel=True,
    )

    if args.mesh:
        from raytpu.sharding import make_mesh, render_sharded

        nt, ns = (int(x) for x in args.mesh.lower().split("x"))
        mesh = make_mesh(nt, ns)
        fn = jax.jit(
            lambda sc, ca, pids, key: render_sharded(
                sc, ca, cfg, pids, key, mesh
            )
        )
    else:
        fn = jax.jit(lambda sc, ca, pids, key: render(sc, ca, cfg, pids, key))
    pixel_ids = jnp.arange(cfg.n_pixels, dtype=jnp.int32)
    key = jax.random.PRNGKey(0)

    def sync(x):
        # block_until_ready does not reliably block on the experimental
        # axon platform; a scalar device->host transfer always does.
        return float(jnp.sum(x))

    # compile + warm run (excluded from timing)
    sync(fn(scene, cam, pixel_ids, key).radiance.x)

    t0 = time.perf_counter()
    out = fn(scene, cam, pixel_ids, key)
    sync(out.radiance.x)
    elapsed = time.perf_counter() - t0

    rays = cfg.n_pixels * cfg.spp * cfg.max_bounces
    rays_per_sec = rays / elapsed
    if args.mesh:
        # per-CHIP metric: divide the aggregate mesh throughput by the
        # device count so vs_baseline against a 1-chip record measures
        # scaling efficiency, not raw aggregate speedup
        rays_per_sec /= jax.device_count()

    # sanity: the render must be a real image, not NaN/zero garbage
    mean = float(np.asarray(out.radiance.x, np.float64).mean()) / cfg.spp
    assert np.isfinite(mean) and mean > 0.0, f"broken render (mean={mean})"

    prev = previous_value(os.path.dirname(os.path.abspath(__file__)))
    vs_baseline = rays_per_sec / prev if prev else 1.0

    print(json.dumps({
        "metric": "fwd_rays_per_sec_chip_1200x900x1000spp_6b",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(vs_baseline, 4),
    }))


if __name__ == "__main__":
    main()
