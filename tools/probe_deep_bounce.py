"""Compiled 19-bounce deep-dive on real TPU: the refraction-stack scene
(scenes/refraction_stack.toml) run fwd and fwd+bwd through the sphere
megakernel, with kernel-vs-scan agreement checked on-device.

Validates two claims at the depth the reference's hardest exhibit uses
(/root/reference/results/refraction_stack_1000RAYS_19RB_22-11_22h24.png):
  * the megakernel tile policies (ROWS=16 fwd / BWD_ROWS=8 bwd,
    kernels/trace_spheres.py:41-47) fit VMEM at max_bounces=19 when
    COMPILED (the interpret-mode tests cannot see a VMEM overflow);
  * compiled kernel == compiled scan at depth 19 (bit-identity).

Run on the TPU rig:  python tools/probe_deep_bounce.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import _time_best, measure_fwd, measure_fwd_bwd  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from raytpu.config import load_scene
    from raytpu.integrator.render import render

    scene, cam, cfg = load_scene(
        os.path.join(os.path.dirname(__file__), "..",
                     "scenes", "refraction_stack.toml")
    )
    assert cfg.max_bounces == 19

    # --- compiled kernel-vs-scan agreement at depth 19 ------------------
    small = cfg.replace(width=64, height=48, spp=8)
    pids = jnp.arange(small.n_pixels, dtype=jnp.int32)
    key = jax.random.PRNGKey(19)
    a = render(scene, cam, small.replace(use_megakernel=False), pids, key)
    b = render(scene, cam, small.replace(use_megakernel=True), pids, key)
    x = np.asarray(a.radiance.to_array())
    y = np.asarray(b.radiance.to_array())
    # On hardware, Mosaic and XLA:TPU contract FMAs differently, so the
    # two paths agree to ulps rather than bitwise (tools/probe_bitexact.py
    # demonstrates it on the normalize chain; interpret-mode CI, where
    # both lower through one backend, stays bit-exact). At depth 19 a
    # single ulp on a knife edge (TIR / roulette) rewrites a whole
    # sample's path, so gate on the differing-pixel FRACTION. Measured
    # growth (this scene, 64x48 spp=8): 0.4% @ 4 bounces, 1.6% @ 8,
    # 2.3% @ 12, 2.7% @ 16-19 (saturating; 97.3% of pixels bit-exact).
    bad = (np.abs(x - y) > 1e-4 + 1e-5 * np.abs(x)).any(axis=-1)
    exact = (x == y).all(axis=-1)
    print(
        f"kernel-vs-scan at 19 bounces: {bad.mean():.3%} pixels differ, "
        f"{exact.mean():.3%} bit-exact "
        f"(max |diff| {np.abs(x - y).max():.3f} over spp={small.spp} sums)"
    )
    assert bad.mean() <= 0.04, "diverging pixels beyond the measured band"
    assert exact.mean() >= 0.90, "bulk bit-exactness lost"

    # --- compiled grad parity at depth 19 (BWD_ROWS=8 claim) ------------
    from raytpu.train import combine_scene, partition_scene

    params, static = partition_scene(scene)

    def loss(params, c):
        sums = render(combine_scene(params, static), cam, c, pids, key)
        return jnp.mean((sums.radiance.to_array() - 0.3) ** 2)

    gk = jax.jit(jax.grad(loss), static_argnums=1)(
        params, small.replace(use_megakernel=True)
    )
    gs = jax.jit(jax.grad(loss), static_argnums=1)(
        params, small.replace(use_megakernel=False)
    )
    gkx = np.asarray(gk.spheres.center.x)
    gsx = np.asarray(gs.spheres.center.x)
    rel = np.abs(gkx - gsx).max() / max(np.abs(gsx).max(), 1e-12)
    print(f"grad(center.x) kernel vs scan, rel max diff: {rel:.3e}")

    # --- throughput at depth 19 -----------------------------------------
    perf = cfg.replace(spp=50, use_megakernel=True)
    v = measure_fwd(scene, cam, perf)
    print(f"fwd   rays/s @ 19 bounces: {v/1e9:.3f} G")
    v = measure_fwd_bwd(scene, cam, cfg.replace(spp=20, use_megakernel=True))
    print(f"fwd+bwd rays/s @ 19 bounces: {v/1e9:.3f} G")


if __name__ == "__main__":
    main()
