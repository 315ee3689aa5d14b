"""Asset pipeline tests against the reference's shipped model3D assets
(SURVEY.md §4: 'PPM/OBJ/MTL parsers against the small assets that ship in
the reference')."""
import numpy as _np


def test_mtl_kd_fallback_tile():
    """Untextured MTL materials (root pyramide_tri.mtl: Kd only, no
    map_Kd) become solid atlas tiles of their diffuse color — the CUDA
    fork's per-material diffuse behavior (triangle.hu:104-117)."""
    from raytpu.io.obj import build_atlas, parse_mtl, parse_obj

    mtl = parse_mtl("/root/reference/model3D/pyramide_tri.mtl")
    assert mtl["Mat"]["map_kd"] is None
    assert mtl["Mat"]["kd"] == (0.8, 0.288, 0.637867)
    mesh = parse_obj("/root/reference/model3D/pyramide_tri.obj")
    entries = [mtl.get(n, {}) for n in mesh.mat_names]
    atlas = build_atlas(
        [e.get("map_kd") for e in entries],
        fallback_colors=[e.get("kd") for e in entries],
        fallback_alphas=[e.get("d") for e in entries],
    )
    rgb = _np.asarray(atlas.rgb.to_array())
    # solid tiles quantize to the u8 lattice (round(kd*255)/255) so the
    # atlas stays exactly u8-packable (TextureAtlas.packed)
    _np.testing.assert_allclose(
        rgb[0], _np.round(_np.array([0.8, 0.288, 0.637867]) * 255) / 255,
        rtol=1e-6,
    )
    assert float(_np.asarray(atlas.alpha)[0]) == 1.0

import os

import numpy as np
import pytest

from raytpu.io.obj import (
    build_atlas,
    load_obj_scene,
    mesh_to_triangles,
    parse_obj,
    tex_path_from_mtl,
)

REF = "/root/reference/model3D"


class TestParseObj:
    def test_pyramide_counts(self):
        """pyramide_tri.obj: 5 vertices, 5 uvs, 6 faces, 1 usemtl."""
        mesh = parse_obj(f"{REF}/pyramide_tri.obj")
        assert mesh.vertices.shape == (5, 3)
        assert mesh.face_v.shape == (6, 3)
        assert mesh.mat_names == ["Mat"]
        assert (mesh.face_mat == 0).all()

    def test_pyramide_face_indices_one_based(self):
        mesh = parse_obj(f"{REF}/pyramide_tri.obj")
        # first face is "f 3/1/1 1/2/1 4/3/1" -> 0-based (2, 0, 3)
        np.testing.assert_array_equal(mesh.face_v[0], [2, 0, 3])
        np.testing.assert_array_equal(mesh.face_t[0], [0, 1, 2])

    def test_pyramide_eau_materials(self):
        """scene.obj: 34 faces, 5 usemtl blocks in order."""
        mesh = parse_obj(f"{REF}/pyramide_eau/scene.obj")
        assert mesh.face_v.shape[0] == 34
        assert mesh.mat_names == [
            "murs_1", "lumiere_1", "plafond_sol_1", "vitre_1", "eau_1",
        ]
        # faces inherit the most recent usemtl slot
        assert mesh.face_mat[0] == 0
        assert mesh.face_mat[-1] == 4

    def test_translation_matches_move_mesh(self):
        mesh = parse_obj(f"{REF}/pyramide_tri.obj")
        t0 = mesh_to_triangles(mesh)
        t1 = mesh_to_triangles(mesh, translate=(1.0, 2.0, 3.0))
        np.testing.assert_allclose(np.asarray(t1.a.x), np.asarray(t0.a.x) + 1.0)
        np.testing.assert_allclose(np.asarray(t1.b.y), np.asarray(t0.b.y) + 2.0)
        np.testing.assert_allclose(np.asarray(t1.c.z), np.asarray(t0.c.z) + 3.0)


class TestMtl:
    def test_map_kd_resolution(self):
        p = tex_path_from_mtl(f"{REF}/pyramide_eau/scene.mtl", "murs_1")
        assert p == f"{REF}/pyramide_eau/tex/murs.png"

    def test_missing_material(self):
        assert tex_path_from_mtl(f"{REF}/pyramide_eau/scene.mtl", "nope") is None

    def test_material_without_map(self):
        # pyramide_tri.mtl's "Mat" has no map_Kd
        assert tex_path_from_mtl(f"{REF}/pyramide_tri.mtl", "Mat") is None


class TestAtlas:
    def test_ppm_atlas_mcworld(self):
        """mcworld tex dir ships real 16x16 ASCII PPMs + _alpha.ppm."""
        d = f"{REF}/mcworld_tiltedtex_water/tex"
        atlas = build_atlas([f"{d}/stone.png", f"{d}/dirt.png"])
        assert (atlas.width, atlas.height) == (16, 16)
        assert atlas.count == 2
        assert atlas.alpha.shape[0] == 2 * 16 * 16
        a = np.asarray(atlas.rgb.x)
        assert a.min() >= 0.0 and a.max() <= 1.0

    def test_png_fallback_with_alpha_png(self):
        """pyramide_eau has no PPMs: loader falls back to PNG + _alpha.png."""
        d = f"{REF}/pyramide_eau/tex"
        atlas = build_atlas([f"{d}/murs.png"])
        assert (atlas.width, atlas.height) == (1500, 1227)

    def test_collapse_factor_upscaled(self):
        """A kxk nearest-upscale collapses back to the original — the
        grass_block case (1920x1440 PNG constant on 30x30 blocks)."""
        from raytpu.io.obj import collapse_factor

        rng = np.random.default_rng(0)
        base = rng.random((12, 16, 3)).astype(np.float32)
        up = np.repeat(np.repeat(base, 5, axis=0), 5, axis=1)
        assert collapse_factor([up], 60, 80) == 5
        # non-collapsible: random full-res texture
        noisy = rng.random((60, 80, 3)).astype(np.float32)
        assert collapse_factor([noisy], 60, 80) == 1
        # the factor is the largest k valid for EVERY tile jointly
        up2 = np.repeat(np.repeat(rng.random((6, 8)).astype(np.float32),
                                  10, axis=0), 10, axis=1)
        assert collapse_factor([up, up2], 60, 80) == 5

    def test_collapse_bit_exact_nearest(self):
        """Collapsed atlas returns the identical texel for every uv under
        the nearest fetch: floor(floor(u*w)/k) == floor(u*(w/k))."""
        import tempfile

        import jax.numpy as jnp
        from PIL import Image

        from raytpu.materials.texture import atlas_fetch

        rng = np.random.default_rng(1)
        base = (rng.random((8, 8, 3)) * 255).astype(np.uint8)
        up = np.repeat(np.repeat(base, 4, axis=0), 4, axis=1)
        with tempfile.TemporaryDirectory() as d:
            Image.fromarray(up).save(f"{d}/t.png")
            full = build_atlas([f"{d}/t.png"], collapse=False)
            small = build_atlas([f"{d}/t.png"], collapse=True)
        assert (full.width, full.height) == (32, 32)
        assert (small.width, small.height) == (8, 8)
        u = jnp.asarray(rng.random(256), jnp.float32)
        v = jnp.asarray(rng.random(256), jnp.float32)
        mat = jnp.zeros(256, jnp.int32)
        a = atlas_fetch(full, mat, u, v)
        b = atlas_fetch(small, mat, u, v)
        np.testing.assert_array_equal(
            np.asarray(a[0].to_array()), np.asarray(b[0].to_array())
        )

    def test_size_mismatch_rejected(self):
        d1 = f"{REF}/mcworld_tiltedtex_water/tex"
        d2 = f"{REF}/pyramide_eau/tex"
        with pytest.raises(ValueError, match="share one size"):
            build_atlas([f"{d1}/stone.png", f"{d2}/murs.png"])


class TestSceneLoad:
    def test_pyramide_scene(self):
        scene = load_obj_scene(
            f"{REF}/pyramide_tri.obj", f"{REF}/pyramide_tri.mtl",
            with_textures=False,
        )
        assert scene.triangles.count == 6
        assert scene.spheres.count == 0

    def test_mcworld_scene_with_textures(self):
        scene = load_obj_scene(
            f"{REF}/mcworld_tiltedtex_water/mineways_tri.obj",
            f"{REF}/mcworld_tiltedtex_water/mineways_tri.mtl",
        )
        assert scene.triangles.count > 500  # 606 tris per SURVEY.md §6
        assert scene.atlas.count == len(
            parse_obj(f"{REF}/mcworld_tiltedtex_water/mineways_tri.obj").mat_names
        )
