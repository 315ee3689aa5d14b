"""Multi-mesh scene specs ([[meshes]]): concatenated triangle SoA with
per-mesh material-slot offsets and one global atlas."""

import os
import textwrap

import jax
import jax.numpy as jnp
import numpy as np

from raytpu.config import load_scene_file
from raytpu.core.types import RenderConfig
from raytpu.integrator.render import render


def test_two_meshes_concatenate(tmp_path):
    spec = tmp_path / "two.toml"
    spec.write_text(textwrap.dedent("""
        [render]
        width = 12
        height = 8
        spp = 2
        bounces = 3

        [camera]
        origin = [2.0, 1.5, 2.5]
        target = [0.0, 0.4, 0.0]
        vfov = 45.0

        [[meshes]]
        obj = "/root/reference/model3D/pyramide/pyramide_tri.obj"
        mtl = "/root/reference/model3D/pyramide/pyramide_tri.mtl"

        [[meshes]]
        obj = "/root/reference/model3D/pyramide_tri.obj"
        mtl = "/root/reference/model3D/pyramide_tri.mtl"
        translate = [1.5, 0.0, 0.0]

        [[spheres]]
        center = [0, 0, 0]
        radius = 100000.0
        emission = [0.8, 0.9, 1.0]
        emission_strength = 1.0
    """))
    scene, cam, cfg = load_scene_file(str(spec))

    # 6 textured + 6 Kd-colored triangles, with offset material slots
    # (Morton ordering at load interleaves the two meshes' triangles, so
    # assert per-slot counts rather than load order)
    assert scene.triangles.count == 12
    ids = np.asarray(scene.triangles.mat_id)
    assert (ids == 0).sum() == 6 and (ids == 1).sum() == 6
    assert scene.atlas.count == 2
    # second mesh's slot is a solid tile of its MTL Kd color
    h, w = scene.atlas.height, scene.atlas.width
    rgb = np.asarray(scene.atlas.rgb.to_array())
    tile2 = rgb[h * w :]
    np.testing.assert_allclose(
        tile2,
        np.broadcast_to(
            np.round(np.array([0.8, 0.288, 0.637867]) * 255) / 255,
            tile2.shape,
        ),
        rtol=1e-5,
    )
    # translation applied to the second mesh (mat slot 1)
    ax = np.asarray(scene.triangles.a.x)
    assert float(ax[ids == 1].min()) >= 0.9

    # and it renders
    sums = render(
        scene, cam, cfg, jnp.arange(cfg.n_pixels, dtype=jnp.int32),
        jax.random.PRNGKey(0),
    )
    assert np.isfinite(np.asarray(sums.radiance.to_array())).all()


def test_reference_scene_specs_load():
    """Every checked-in scene spec parses into a renderable scene."""
    import glob

    from raytpu.config import load_scene_file

    specs = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "scenes", "*.toml")))
    assert len(specs) >= 8
    for p in specs:
        scene, cam, cfg = load_scene_file(p)
        assert scene.spheres.count + scene.triangles.count > 0, p
        assert cfg.n_pixels > 0, p


def test_largest_mesh_renders():
    """1tree_tri.obj (1320 triangles — the reference's largest mesh)."""
    from raytpu.config import load_scene_file

    p = os.path.join(os.path.dirname(__file__), "..", "scenes", "tree.toml")
    scene, cam, cfg = load_scene_file(p)
    assert scene.triangles.count == 1320
    cfg = cfg.replace(width=10, height=8, spp=1, max_bounces=2)
    sums = render(
        scene, cam, cfg, jnp.arange(cfg.n_pixels, dtype=jnp.int32),
        jax.random.PRNGKey(0),
    )
    assert np.isfinite(np.asarray(sums.radiance.to_array())).all()
