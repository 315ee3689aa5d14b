"""Benchmark suite: rays/sec/chip over the BASELINE.json configs.

Default run emits ONE JSON line per metric:
  * forward rays/s for each of the five BASELINE.json configs
    (mesh configs measured at reduced spp — per-ray cost is
    spp-invariant because samples scan inside one jitted program),
  * forward+backward rays/s at the flagship config (grad of a
    photometric loss through the whole render, the BASELINE.json
    metric's second half),
  * LAST line: the flagship forward metric (the driver's headline;
    same metric name across rounds so vs_baseline tracks progress).

Usage:
  python bench.py                 # full suite (final line = headline)
  python bench.py --quick         # headline metric only
  python bench.py --scene scenes/mcworld_water.toml [--bwd] [--spp N]
  python bench.py --mesh 2x4      # shard over a (tiles,samples) mesh
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys
import time


def previous_value(repo_root: str, metric: str) -> float | None:
    """Latest recorded value for ``metric`` from BENCH_r{N}.json files.

    Handles both shapes: a raw metric line {"metric","value",...} and the
    driver's record {"parsed": {...}, "tail": "..."} (possibly with
    several JSON lines in the tail).
    """
    best_round, best_val = -1, None
    for path in glob.glob(os.path.join(repo_root, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m or int(m.group(1)) <= best_round:
            continue
        try:
            with open(path) as f:
                data = json.load(f)
        except Exception:
            continue
        candidates = []
        if isinstance(data.get("parsed"), dict):
            candidates.append(data["parsed"])
        for line in str(data.get("tail", "")).splitlines():
            line = line.strip()
            if line.startswith("{"):
                try:
                    candidates.append(json.loads(line))
                except Exception:
                    pass
        if "value" in data:
            candidates.append(data)
        for c in candidates:
            if c.get("metric") == metric and "value" in c:
                best_round, best_val = int(m.group(1)), float(c["value"])
    return best_val


def _sync(x) -> float:
    """block_until_ready does not reliably block on the experimental axon
    platform; a scalar device->host transfer always does."""
    import jax.numpy as jnp

    return float(jnp.sum(x))


def _time_best(fn_once, target_s: float = 1.0, samples: int = 3) -> float:
    """Seconds per call: min over ``samples`` independent measurements,
    each accumulated to at least ``target_s`` of measured wall time.

    VERDICT r2 weak #1: the old logic (`reps = int(1.0/elapsed)`) let any
    call in [1s, inf) be a SINGLE sample, so one tunnel/dispatch hiccup
    landed unchecked in the permanent record (BENCH_r02's fwd+bwd was 6.3x
    under the reproducible value). Min-of-3 over >=1s windows makes a
    single hiccup recoverable and matches standard bench practice (min =
    the least-noise estimate of deterministic device work).
    """
    t0 = time.perf_counter()
    fn_once()
    dt = time.perf_counter() - t0
    reps = max(1, int(-(-target_s // max(dt, 1e-3))))
    best = float("inf")
    for _ in range(samples):
        t0 = time.perf_counter()
        for _ in range(reps):
            fn_once()
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def measure_fwd(scene, cam, cfg, mesh=None):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from raytpu.integrator.render import render

    if mesh is not None:
        from raytpu.sharding import render_sharded

        fn = jax.jit(
            lambda sc, ca, pids, key: render_sharded(sc, ca, cfg, pids, key, mesh)
        )
    else:
        fn = jax.jit(lambda sc, ca, pids, key: render(sc, ca, cfg, pids, key))
    # block-major order = the production full-frame path (render_image):
    # coherent ray cones per kernel tile; per-pixel values identical
    from raytpu.integrator.render import blocked_pixel_order

    pixel_ids = jnp.asarray(blocked_pixel_order(cfg))
    key = jax.random.PRNGKey(0)

    out = fn(scene, cam, pixel_ids, key)
    _sync(out.radiance.x)  # compile + warm
    elapsed = _time_best(
        lambda: _sync(fn(scene, cam, pixel_ids, key).radiance.x)
    )

    # sanity: the render must be a real image, not NaN/zero garbage
    mean = float(np.asarray(out.radiance.x, np.float64).mean()) / cfg.spp
    assert np.isfinite(mean) and mean > 0.0, f"broken render (mean={mean})"
    return cfg.n_pixels * cfg.spp * cfg.max_bounces / elapsed


def measure_fwd_bwd(scene, cam, cfg):
    """rays/s for one forward+backward pass: value_and_grad of a
    photometric loss w.r.t. every float scene leaf through the whole
    render (the loop BASELINE names, /root/reference/main.c:245-284
    differentiated end-to-end). Rays counted as the forward count."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from raytpu.integrator.render import render
    from raytpu.train import combine_scene, partition_scene
    from raytpu.train.inverse import photometric_loss

    params, static = partition_scene(scene)
    target = jnp.zeros((cfg.n_pixels, 3), jnp.float32)
    pixel_ids = jnp.arange(cfg.n_pixels, dtype=jnp.int32)
    key = jax.random.PRNGKey(0)

    def loss_fn(params):
        sc = combine_scene(params, static)
        sums = render(sc, cam, cfg, pixel_ids, key)
        return photometric_loss(sums.radiance * (1.0 / cfg.spp), target)

    vg = jax.jit(jax.value_and_grad(loss_fn))
    loss, grads = vg(params)  # compile + warm
    _sync(loss)
    assert np.isfinite(float(loss))
    g_leaf = (
        (lambda g: g.spheres.center.x) if scene.spheres.count
        else (lambda g: g.triangles.a.x)
    )

    def once():
        loss, grads = vg(params)
        _sync(loss)
        _sync(g_leaf(grads))

    elapsed = _time_best(once)
    return cfg.n_pixels * cfg.spp * cfg.max_bounces / elapsed


def measure_denoise(width=1200, height=900):
    """Mpix/s for the two denoise passes at the BASELINE config-5 frame
    size (the reference's OIDN stage, /root/reference/denoiser.h:31-91,
    invoked main.c:455 — a real runtime stage the record must time)."""
    import jax
    import jax.numpy as jnp

    from raytpu.denoise.bilateral import denoise as bilateral
    from raytpu.denoise.learned import denoise_learned, load_params

    key = jax.random.PRNGKey(0)
    shape = (height, width, 3)
    color = jax.random.uniform(key, shape)
    albedo = jax.random.uniform(jax.random.fold_in(key, 1), shape)
    normal = jax.random.normal(jax.random.fold_in(key, 2), shape) * 0.3

    results = {}
    bi = jax.jit(bilateral)
    _sync(bi(color, albedo, normal))
    results["bilateral"] = _time_best(
        lambda: _sync(bi(color, albedo, normal))
    )
    params = load_params()
    if params is not None:
        kp = jax.jit(lambda c, a, n: denoise_learned(c, a, n, params))
        _sync(kp(color, albedo, normal))
        results["kpcn"] = _time_best(lambda: _sync(kp(color, albedo, normal)))
    mpix = width * height / 1e6
    return {k: mpix / v for k, v in results.items()}


def _expected_steps() -> dict:
    """Checked-in expectations for REAL step-changes (VERDICT r4 weak #2:
    BENCH_r04's record carried a 'suspect a mis-capture' warning on its
    best number — the genuine 10.2x backward-megakernel jump — because
    emit() could not tell an expected improvement from a bad capture).

    bench_expected_steps.json maps metric -> {"min_vs": float,
    "max_vs": float, "note": str}: when vs_baseline lands inside the
    declared band the out-of-[0.5,3] warning is replaced by an INFO line
    naming the change; outside the band (or for unlisted metrics) the
    warning stays — the band exists for *explained* jumps only.
    """
    path = os.path.join(ROOT, "bench_expected_steps.json")
    try:
        with open(path) as f:
            return json.load(f)
    except Exception:
        return {}


def emit(metric, value, prev, unit="rays/s"):
    vs = round(value / prev, 4) if prev else 1.0
    print(json.dumps({
        "metric": metric,
        "value": round(value, 1),
        "unit": unit,
        "vs_baseline": vs,
    }), flush=True)
    if prev and (vs < 0.5 or vs > 3.0):
        exp = _expected_steps().get(metric)
        if exp and exp.get("min_vs", 0.5) <= vs <= exp.get("max_vs", 3.0):
            print(
                f"bench INFO: {metric} vs_baseline={vs} is an expected "
                f"step-change: {exp.get('note', '')}",
                file=sys.stderr, flush=True,
            )
            return
        # VERDICT r2 task 2d: a bad capture must be visible in the tail —
        # BENCH_r02 silently recorded fwd+bwd at 0.16x the reproducible
        # value. This line does not change the JSON record.
        print(
            f"bench WARNING: {metric} vs_baseline={vs} is outside [0.5, 3] "
            "— suspect a mis-capture; re-run before trusting this record",
            file=sys.stderr, flush=True,
        )


HEADLINE = "fwd_rays_per_sec_chip_1200x900x1000spp_6b"

# BASELINE.json's five configs: (metric tag, scene spec, fwd overrides,
# fwd+bwd overrides or None). Mesh configs are timed at reduced spp.
# The spp-invariance this rests on is MEASURED, not assumed
# (tools/probe_spp_invariance.py on v5e, r3): per-sample device cost is
# spp-invariant, but each call carries ~28ms of fixed dispatch/tunnel
# overhead, so reduced-spp rates UNDERSTATE the full-spp rate —
# flagship 1.73 G at spp=1000 vs 1.50 G at spp=50 (0.87x); pyramide
# 0.85 G at spp=200 vs 0.77 G at spp=50 (0.91x). The recorded numbers
# are therefore conservative; spp below 20 is never used for a record.
ROOT = os.path.dirname(os.path.abspath(__file__))
CONFIGS = [
    ("cfg1_cornell_400x300", "cornell", {}, None),  # sphere-path bwd is
    # the flagship fwd_bwd line below; no second sphere bwd record
    # sphere AO backward rides the index replay since r5 (recorded
    # occlusion factors; the probes never run in the backward), so its
    # cost is finally worth recording
    ("cfg2_dof_ao_800x600", f"{ROOT}/scenes/cornell_dof_ao.toml",
     {"spp": 100}, {"spp": 50}),
    ("cfg3_pyramide_1000x750", f"{ROOT}/scenes/pyramide.toml",
     {"spp": 50}, {"spp": 50}),
    ("cfg4_grassblock_1000x750", f"{ROOT}/scenes/grass_block.toml",
     {"spp": 50}, {"spp": 50}),
    # mesh + ambient occlusion — the reference's feature-complete CPU
    # path (list_of_mesh with useAO, main.c:316; "≈2x slower",
    # README.md:32). In-kernel AO probes since round 5; this line keeps
    # the cost visible next to its no-AO twin above (VERDICT r4 next #4)
    ("grassblock_ao_1000x750", f"{ROOT}/scenes/grass_block.toml",
     {"spp": 50, "use_ao": True}, {"spp": 50, "use_ao": True}),
    # fwd at spp=50: at spp=20 the ~28ms fixed dispatch overhead eats
    # ~7% of a 0.4s call, understating the (spp-invariant) per-ray rate
    ("cfg5_mcworld_1200x900", f"{ROOT}/scenes/mcworld_water.toml",
     {"spp": 50}, {"spp": 20}),
    # not a BASELINE config: the equirect-sky showcase (VERDICT r3), a
    # sphere-megakernel scene exercising the in-kernel sky slot +
    # XLA row-gather composition (kernels/trace_spheres)
    ("sky_1000x750", f"{ROOT}/scenes/sky.toml", {"spp": 50}, {"spp": 50}),
    # the reference's canonical scene SHAPE — OBJ mesh + equirect sky in
    # one render (main.c:361 + 374) — on the mesh megakernel's sky slot
    # (VERDICT r3 missing #2; previously scan-path only, ~6x slower)
    ("mesh_sky_1000x750", f"{ROOT}/scenes/mesh_sky.toml",
     {"spp": 50}, {"spp": 50}),
]


def flagship():
    from raytpu.scenes import cornell_box

    scene, cam, cfg = cornell_box()
    cfg = cfg.replace(
        width=1200, height=900, spp=1000, max_bounces=6,
        # production fast path: the full-bounce-loop Pallas megakernel
        # (bit-identical to the scan integrator, tests/test_megakernel.py;
        # render() falls back automatically on unsupported configs)
        use_megakernel=True,
    )
    return scene, cam, cfg


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=None)
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--height", type=int, default=None)
    ap.add_argument("--bounces", type=int, default=None)
    ap.add_argument("--scene", default=None,
                    help="bench one scene spec / builtin instead of the suite")
    ap.add_argument("--bwd", action="store_true",
                    help="measure forward+backward (grad through the render)")
    ap.add_argument("--quick", action="store_true",
                    help="headline flagship metric only")
    ap.add_argument(
        "--mesh", default=None, metavar="TILESxSAMPLES",
        help="shard over a ('tiles','samples') device mesh, e.g. 1x4 — "
             "for measuring multi-chip scaling efficiency (rays/s/chip "
             "at N chips vs 1)",
    )
    args = ap.parse_args()

    import jax

    from raytpu.config import load_scene
    from raytpu.observe import enable_compilation_cache
    from raytpu.sharding import init_distributed

    enable_compilation_cache()

    # multi-host scaling mode: under a distributed launch (env-configured
    # coordinator), --mesh spans every process's chips and the printed
    # rays/s/chip divided by the 1-host record IS the scaling efficiency
    if init_distributed() and jax.process_index() != 0:
        import builtins

        builtins.print = lambda *a, **k: None  # only process 0 reports

    def overrides(cfg):
        over = {}
        if args.spp is not None:
            over["spp"] = args.spp
        if args.width is not None:
            over["width"] = args.width
        if args.height is not None:
            over["height"] = args.height
        if args.bounces is not None:
            over["max_bounces"] = args.bounces
        return cfg.replace(**over) if over else cfg

    dev_mesh = None
    if args.mesh:
        from raytpu.sharding import make_mesh

        nt, ns = (int(x) for x in args.mesh.lower().split("x"))
        dev_mesh = make_mesh(nt, ns)

    # the Pallas megakernel only lowers on TPU backends; CPU smoke runs
    # (and the virtual-device test harness) take the scan path
    mk = jax.default_backend() != "cpu"

    if args.scene:
        scene, cam, cfg = load_scene(args.scene)
        cfg = overrides(cfg).replace(use_megakernel=mk)
        tag = os.path.splitext(os.path.basename(args.scene))[0]
        if args.bwd:
            val = measure_fwd_bwd(scene, cam, cfg)
            emit(f"fwd_bwd_rays_per_sec_chip_{tag}", val, None)
        else:
            val = measure_fwd(scene, cam, cfg, mesh=dev_mesh)
            if dev_mesh is not None:
                val /= jax.device_count()
            emit(f"fwd_rays_per_sec_chip_{tag}", val, None)
        return

    scene, cam, cfg = flagship()
    cfg = overrides(cfg).replace(use_megakernel=mk)

    if not args.quick:
        # per-config forward AND forward+backward numbers (VERDICT r2
        # weak #2: fwd+bwd was benchmark-invisible for the mesh configs,
        # which is how an 83x fwd/bwd gap went unrecorded)
        for tag, spec, over, bwd_over in CONFIGS:
            s, c, k = load_scene(spec)
            k = k.replace(use_megakernel=mk, **over)
            v = measure_fwd(s, c, k)
            emit(f"fwd_rays_per_sec_chip_{tag}", v,
                 previous_value(ROOT, f"fwd_rays_per_sec_chip_{tag}"))
            if bwd_over is not None:
                kb = k.replace(**bwd_over)
                v = measure_fwd_bwd(s, c, kb)
                emit(f"fwd_bwd_rays_per_sec_chip_{tag}", v,
                     previous_value(ROOT, f"fwd_bwd_rays_per_sec_chip_{tag}"))
        # flagship forward+backward (the second half of BASELINE's metric),
        # at reduced spp — per-ray cost is spp-invariant (header comment)
        bwd_cfg = cfg.replace(spp=50)
        v = measure_fwd_bwd(scene, cam, bwd_cfg)
        emit("fwd_bwd_rays_per_sec_chip_1200x900_6b", v,
             previous_value(ROOT, "fwd_bwd_rays_per_sec_chip_1200x900_6b"))
        # denoise pass (BASELINE config-5 names it; denoiser.h:31-91).
        # NOTE (r4/r5 variance): kpcn reads 26-28 Mpix/s in a fresh
        # process (twice, r5) but 18-20 at THIS point of the full suite
        # — the depression is suite-context (device/allocator state
        # after ~20 render benches), not measurement noise; min-of-3
        # windows are already used. Treat suite-context denoise numbers
        # as a lower bound.
        for name, mpix_s in measure_denoise().items():
            emit(f"denoise_{name}_mpix_per_sec_1200x900", mpix_s,
                 previous_value(ROOT, f"denoise_{name}_mpix_per_sec_1200x900"),
                 unit="Mpix/s")

    val = measure_fwd(scene, cam, cfg, mesh=dev_mesh)
    if dev_mesh is not None:
        # per-CHIP metric: divide the aggregate mesh throughput by the
        # device count so vs_baseline against a 1-chip record measures
        # scaling efficiency, not raw aggregate speedup
        val /= jax.device_count()
    emit(HEADLINE, val, previous_value(ROOT, HEADLINE))


if __name__ == "__main__":
    main()
