"""Compiled-mode deep-bounce fwd+bwd smoke on real TPU (preflight gate).

ADVICE r2/r3 #3: the with_indices index buffer (bounces x tile_rows x
LANE i32) grows with depth, and before round 4 nothing automatic ever
exercised the differentiable MESH path at the reference's deepest
regime (19-20 bounces, /root/reference/results/
refraction_stack_1000RAYS_19RB_22-11_22h24.png; pyramide_eau ships at
20 bounces, main.c:292-328) on actual hardware — a VMEM overflow there
would only surface in production. This script compiles and runs, on the
default backend (TPU on the rig; CPU still validates shapes/VMEM-free
paths):

  * pyramide_eau (textured mesh, water/glass physics) at its shipped 20
    bounces: forward render + grad of a photometric loss through the
    mesh megakernel's index-replay backward;
  * refraction_stack (nested refractive spheres) at 19 bounces: same
    through the sphere backward megakernel.

Exit code 0 iff every loss/grad is finite. Run by tools/preflight.sh.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def smoke(scene_path: str, width: int, height: int, spp: int,
          bounces: int | None = None, want_kernel: bool = False) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from raytpu.config import load_scene
    from raytpu.integrator.render import blocked_pixel_order, render
    from raytpu.train import combine_scene, partition_scene
    from raytpu.train.inverse import photometric_loss

    scene, cam, cfg = load_scene(scene_path)
    cfg = cfg.replace(
        width=width, height=height, spp=spp,
        use_megakernel=jax.default_backend() != "cpu",
        **({"max_bounces": bounces} if bounces is not None else {}),
    )
    if want_kernel and cfg.use_megakernel:
        from raytpu.kernels import trace_scene, trace_spheres

        assert trace_scene.supported(scene, cfg) or trace_spheres.supported(
            scene, cfg
        ), f"{scene_path}: expected a megakernel path, got the scan fallback"
    params, static = partition_scene(scene)
    pids = jnp.asarray(blocked_pixel_order(cfg))
    key = jax.random.PRNGKey(0)
    target = jnp.zeros((cfg.n_pixels, 3), jnp.float32)

    def loss_fn(params):
        sums = render(combine_scene(params, static), cam, cfg, pids, key)
        return photometric_loss(sums.radiance * (1.0 / cfg.spp), target)

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    loss = float(loss)
    leaves = jax.tree_util.tree_leaves(grads)
    finite = all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
    nonzero = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
    assert np.isfinite(loss), f"{scene_path}: loss={loss}"
    assert finite, f"{scene_path}: non-finite gradient"
    assert nonzero > 0.0, f"{scene_path}: all-zero gradients"
    print(
        f"deep-bounce smoke OK: {os.path.basename(scene_path)} "
        f"{width}x{height}x{spp}spp x{cfg.max_bounces}b "
        f"loss={loss:.5f} grad|sum|={nonzero:.3e}"
    )


def window_parity(scene_path: str, bounces: int) -> None:
    """MULTI-window reverse-sweep gradient parity on the real backend:
    the windowed unrolled path (checkpoints + per-window vjp +
    serialization fence) only lowers through Mosaic — interpret mode
    takes the single-vjp scan form, and the pytest harness forces CPU
    (tests/conftest.py) — so this is where the structure is pinned
    against the always-correct index-replay SCAN backward
    (RAYTPU_MESH_BWD=replay). ``bounces`` above SINGLE_WINDOW_MAX makes
    the kernel run several windows."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from raytpu.config import load_scene
    from raytpu.integrator.render import render
    from raytpu.train import combine_scene, partition_scene

    if jax.default_backend() == "cpu":
        print("window-parity SKIPPED (cpu backend)")
        return
    scene, cam, cfg0 = load_scene(scene_path)
    cfg = cfg0.replace(
        width=32, height=24, spp=2, max_bounces=bounces,
        use_megakernel=True,
    )
    pids = jnp.arange(cfg.n_pixels, dtype=jnp.int32)
    key = jax.random.PRNGKey(91)
    params, static = partition_scene(scene)

    def loss(params):
        sums = render(combine_scene(params, static), cam, cfg, pids, key)
        return (
            jnp.mean((sums.radiance.to_array() - 0.2) ** 2)
            + jnp.mean(sums.normal.to_array() ** 2)
        )

    def grads(**env):
        old = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            return jax.jit(jax.grad(loss))(params)
        finally:
            for k, v in old.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    g_win = grads()                                 # windowed kernel
    g_ref = grads(RAYTPU_MESH_BWD="replay")         # scan replay
    for name, a, b in (
        ("tri.a.x", g_win.triangles.a.x, g_ref.triangles.a.x),
        ("sph.diffuse.x", g_win.spheres.mat.diffuse.x,
         g_ref.spheres.mat.diffuse.x),
    ):
        a, b = np.asarray(a), np.asarray(b)
        # different compiled programs (Mosaic vs XLA scan): ulp-level
        # FMA differences compound over 10 bounces and single knife-edge
        # sample flips move few-triangle grads by ~0.4% at spp=2
        # (tools/probe_bitexact.py) — the bar is direction + magnitude,
        # not bit equality
        np.testing.assert_allclose(a, b, rtol=2e-2, atol=1e-6,
                                   err_msg=name)
    assert np.abs(np.asarray(g_ref.spheres.mat.diffuse.x)).max() > 0
    print(f"window-parity OK: {os.path.basename(scene_path)} x{bounces}b")


def main() -> None:
    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    # mcworld at 20 bounces (pyramide_eau's shipped depth, main.c:296)
    # exercises the MESH megakernel + index-replay backward — the
    # with_indices buffer ADVICE #3 flagged — at the deepest regime;
    # refraction_stack's 19 bounces exercise the sphere bwd megakernel.
    # (pyramide_eau itself serves from the scan path: its 1500-wide
    # atlas exceeds the in-kernel texture-row bound.)
    smoke(os.path.join(root, "scenes/mcworld_water.toml"), 128, 80, 2,
          bounces=20, want_kernel=True)
    smoke(os.path.join(root, "scenes/refraction_stack.toml"), 128, 96, 2,
          want_kernel=True)
    # gradient PARITY of the multi-window sweep (not just finiteness):
    # 10 bounces > SINGLE_WINDOW_MAX forces the windowed path
    window_parity(os.path.join(root, "scenes/pyramide.toml"), 10)


if __name__ == "__main__":
    main()
