"""shard_map smoke of BOTH megakernels on the real backend (preflight).

VERDICT r4 weak #5: the builder's real-chip shard_map smoke of the
megakernels existed only as a commit-message claim — nothing automated
re-ran it. This script builds a mesh over every available device (one
real TPU on this rig -> a 1x1 ('tiles','samples') mesh; more chips
shard for real) and renders

  * the flagship sphere scene through the SPHERE megakernel, and
  * grass_block (textured mesh, quad pairs) through the MESH megakernel,

under ``render_sharded``, asserting each matches its unsharded
single-chip render exactly (same keys; a 1x1 mesh must be a bit-exact
no-op, and an NxM mesh sums identical disjoint sample sets).

On a CPU backend the megakernels cannot lower — the script still runs
the sharded-vs-unsharded check through the scan path so the harness
itself stays covered everywhere.

Exit code 0 iff both comparisons pass. Run by tools/preflight.sh.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def smoke(scene, cam, cfg, tag: str) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from raytpu.integrator.render import render
    from raytpu.sharding.mesh import make_mesh, render_sharded

    mesh = make_mesh()
    pixel_ids = jnp.arange(cfg.n_pixels, dtype=jnp.int32)
    key = jax.random.PRNGKey(3)

    a = render(scene, cam, cfg, pixel_ids, key)
    b = render_sharded(scene, cam, cfg, pixel_ids, key, mesh)
    x = np.asarray(a.radiance.to_array())
    y = np.asarray(b.radiance.to_array())
    np.testing.assert_array_equal(
        x, y, err_msg=f"{tag}: sharded render != single-chip render"
    )
    assert np.isfinite(x).all() and float(np.abs(x).max()) > 0.0
    print(
        f"shardmap smoke OK [{tag}]: mesh={dict(mesh.shape)} "
        f"backend={jax.default_backend()} "
        f"megakernel={'on' if cfg.use_megakernel else 'off'}"
    )


def main() -> None:
    import jax

    from raytpu.config import load_scene
    from raytpu.scenes import cornell_box

    mk = jax.default_backend() != "cpu"

    scene, cam, cfg = cornell_box()
    cfg = cfg.replace(
        width=64, height=48, spp=8, max_bounces=4, use_megakernel=mk,
        pixel_tile=64 * 48,
    )
    if mk:
        from raytpu.kernels import trace_spheres

        assert trace_spheres.supported(scene, cfg)
    smoke(scene, cam, cfg, "sphere_megakernel")

    mscene, mcam, mcfg = load_scene("scenes/grass_block.toml")
    mcfg = mcfg.replace(
        width=64, height=48, spp=4, max_bounces=4, use_megakernel=mk,
        pixel_tile=64 * 48,
    )
    if mk:
        from raytpu.kernels import trace_scene

        assert trace_scene.supported(mscene, mcfg)
    smoke(mscene, mcam, mcfg, "mesh_megakernel")


if __name__ == "__main__":
    main()
