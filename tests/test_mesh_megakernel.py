"""The mesh megakernel (kernels/trace_scene.py) vs the scan integrator:
same RNG streams, same semantics — textured triangles, material-table
physics (refraction/cutout), sphere+mesh mixing — compared in
interpreter mode on CPU. On TPU the compiled kernel is checked against
the compiled scan path in bench runs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytpu.config import load_scene
from raytpu.core.types import MatTable, RenderConfig, Scene, TextureAtlas, Triangles
from raytpu.core.vec3 import Vec3
from raytpu.integrator.render import render
from raytpu.kernels.trace_scene import supported

pytestmark = pytest.mark.kernel


def _compare(scene, cam, cfg, key, atol=1e-4, outlier_frac=0.02):
    """Scan vs mesh megakernel. Interpreter mode runs the kernel op-by-op
    while the jitted scan gets XLA FMA contraction, so grazing hits /
    texel-boundary UVs can flip for rare samples (same tolerance policy
    as tests/test_megakernel.py)."""
    assert supported(scene, cfg), "scene should take the mesh megakernel"
    pids = jnp.arange(cfg.n_pixels, dtype=jnp.int32)
    a = render(scene, cam, cfg, pids, key)
    b = render(
        scene, cam,
        cfg.replace(use_megakernel=True, pallas_interpret=True),
        pids, key,
    )
    for name in ("radiance", "albedo", "normal"):
        x = np.asarray(getattr(a, name).to_array())
        y = np.asarray(getattr(b, name).to_array())
        bad = (np.abs(x - y) > atol + 1e-5 * np.abs(x)).any(axis=-1)
        assert bad.mean() <= outlier_frac, (
            f"{name}: {bad.mean():.2%} pixels differ "
            f"(max {np.abs(x - y).max():.4f})"
        )


def _synthetic_textured_scene():
    """Two textured quads (4 tris, 2 materials, 8x8 atlas) + ground/sun
    spheres. Material 1 is emissive with texture-modulated emission;
    the atlas alpha plane includes cutout (0), refractive-window (0.5)
    and opaque (1) texels, driving every shading branch."""
    from raytpu.scenes import spheres_from_rows

    rng = np.random.default_rng(7)
    w = h = 8
    rgb = rng.random((2 * h * w, 3), np.float32)
    alpha = rng.choice(
        np.float32([0.0, 0.5, 1.0]), size=2 * h * w, p=[0.2, 0.2, 0.6]
    )

    def quad(x0, z0, mat):
        # two triangles spanning [x0,x0+1]x[z0,z0+1] at y=0.5/0.0
        a = [(x0, 0.0, z0), (x0, 0.5, z0 + 1), (x0 + 1, 0.0, z0)]
        b = [(x0 + 1, 0.5, z0 + 1), (x0 + 1, 0.0, z0), (x0, 0.5, z0 + 1)]
        uv = [(0, 0), (0, 1), (1, 0)], [(1, 1), (1, 0), (0, 1)]
        return [a, b], uv, [mat, mat]

    tris, uvs, mats = [], [], []
    for verts, uv, mm in (quad(-1.0, -2.5, 0), quad(0.2, -2.0, 1)):
        tris += verts
        uvs += list(uv)
        mats += mm
    t = np.float32(tris)          # (4, 3, 3)
    u = np.float32(uvs)           # (4, 3, 2)
    v3 = lambda a: Vec3(jnp.asarray(a[:, 0]), jnp.asarray(a[:, 1]),
                        jnp.asarray(a[:, 2]))
    triangles = Triangles(
        a=v3(t[:, 0]), b=v3(t[:, 1]), c=v3(t[:, 2]),
        ua=jnp.asarray(u[:, 0, 0]), va=jnp.asarray(u[:, 0, 1]),
        ub=jnp.asarray(u[:, 1, 0]), vb=jnp.asarray(u[:, 1, 1]),
        uc=jnp.asarray(u[:, 2, 0]), vc=jnp.asarray(u[:, 2, 1]),
        mat_id=jnp.asarray(mats, jnp.int32),
    )
    atlas = TextureAtlas(
        rgb=Vec3(jnp.asarray(rgb[:, 0]), jnp.asarray(rgb[:, 1]),
                 jnp.asarray(rgb[:, 2])),
        alpha=jnp.asarray(alpha), width=w, height=h,
    )
    table = MatTable(
        emission=Vec3(jnp.float32([0, 1]), jnp.float32([0, 1]),
                      jnp.float32([0, 0.8])),
        emission_strength=jnp.float32([0.0, 2.0]),
        reflection=jnp.float32([0.3, 0.0]),
        ior=jnp.float32([1.33, 1.0]),
        alpha_const=jnp.float32([1.0, 1.0]),
        use_alpha_const=jnp.asarray([False, False]),
        emission_from_texture=jnp.asarray([False, True]),
    )
    rows = [
        ((0, -501, 0), 500.0, (0.8, 0.8, 0.75), (0, 0, 0), 0.0, 0.0, 1.0, 1.0),
        ((4, 6, 2), 1.0, (0, 0, 0), (1, 1, 1), 20.0, 0.0, 1.0, 1.0),
        ((0, 0, 0), 1e4, (0, 0, 0), (0.784, 0.965, 1.0), 1.0, 0.0, 1.0, 1.0),
    ]
    scene = Scene(
        spheres=spheres_from_rows(rows), triangles=triangles, atlas=atlas,
        mat_table=table, sky=type(Scene.from_spheres(
            spheres_from_rows(rows)).sky).empty(), sky_sphere_index=-1,
    )
    from raytpu.camera import make_camera

    cam = make_camera(
        origin=(0.3, 0.8, 1.5), target=(0, 0.2, -2), up=(0, 1, 0),
        vfov_deg=55.0, aspect_ratio=1.5,
    )
    return scene, cam


def test_synthetic_textured_matches_scan():
    """Cutout / refractive-window / opaque texels, texture-modulated
    emission, two materials, sphere+mesh mix — every branch of the
    bounce in one scene."""
    scene, cam = _synthetic_textured_scene()
    cfg = RenderConfig(width=14, height=10, spp=4, max_bounces=5)
    _compare(scene, cam, cfg, jax.random.PRNGKey(50))


def test_pyramide_water_matches_scan():
    """BASELINE config 3's scene: textured mesh whose material table
    forces water physics (alpha .6 / ior 1.33 -> probabilistic
    refraction through the mesh, the pile.h reduction on triangles)."""
    scene, cam, _ = load_scene("scenes/pyramide.toml")
    cfg = RenderConfig(width=12, height=8, spp=4, max_bounces=5)
    _compare(scene, cam, cfg, jax.random.PRNGKey(52))


@pytest.mark.slow
def test_mcworld_kernel_matches_scan_trace():
    """BASELINE config 5's scene: 606 triangles across 5 AABB chunks, 11
    materials, water refraction — exercises the chunk cull and the
    176-texture-row one-hot fetch (the largest texrow space in the
    corpus). Compared directly against the scan trace."""
    from raytpu.core import rng
    from raytpu.integrator.path import n_bounce_draws, trace
    from raytpu.integrator.render import sample_rays
    from raytpu.kernels.trace_scene import trace_mesh_megakernel

    scene, cam, _ = load_scene("scenes/mcworld_water.toml")
    cfg = RenderConfig(width=10, height=6, spp=1, max_bounces=4)
    pids = jnp.arange(cfg.n_pixels, dtype=jnp.int32)
    pix_keys = rng.pixel_keys(jax.random.PRNGKey(53), pids)
    ray_keys = rng.sample_keys(pix_keys, jnp.int32(0))
    cam_draws, bounce_draws = rng.ray_uniforms(
        ray_keys, 4, n_bounce_draws(cfg), cfg.max_bounces
    )
    origin, direction = sample_rays(cam, cfg, pids, cam_draws)
    a = trace(scene, cfg, origin, direction, bounce_draws)
    b = trace_mesh_megakernel(
        scene, cfg, origin, direction, bounce_draws, interpret=True
    )
    for want, got, name in zip(a, b, ("radiance", "albedo", "normal")):
        x = np.stack(list(want), -1)
        y = np.stack(list(got), -1)
        bad = (np.abs(x - y) > 1e-4 + 1e-5 * np.abs(x)).any(axis=-1)
        assert bad.mean() <= 0.02, f"{name}: {bad.mean():.2%}"


def test_untextured_mesh_matches_scan():
    """Mesh without an atlas: the constant default material path
    (mesh.h:207)."""
    scene, cam, _ = load_scene("scenes/pyramide.toml")
    scene = scene.replace(atlas=TextureAtlas.empty())
    cfg = RenderConfig(width=10, height=6, spp=2, max_bounces=3)
    _compare(scene, cam, cfg, jax.random.PRNGKey(54))


def test_dispatch_and_fallbacks():
    """Sphere-only scenes keep taking trace_spheres; small-atlas mesh
    scenes take trace_scene — including AO configs (in-kernel hemisphere
    probes since round 5, main.c:316).
    grass_block's 1440x1920 PNG is a nearest-upscale of a 48x64
    pixel-art original, so the bit-exact atlas collapse (io/obj.py
    collapse_factor) brings it inside the in-kernel texture bounds."""
    from raytpu.kernels import trace_spheres
    from raytpu.scenes import cornell_box

    sph_scene, _, _ = cornell_box()
    cfg = RenderConfig()
    assert trace_spheres.supported(sph_scene, cfg)
    assert not supported(sph_scene, cfg)  # no triangles

    mesh_scene, cam, _ = load_scene("scenes/pyramide.toml")
    assert supported(mesh_scene, cfg)
    assert not trace_spheres.supported(mesh_scene, cfg)
    assert supported(mesh_scene, cfg.replace(use_ao=True))

    big_tex, _, _ = load_scene("scenes/grass_block.toml")
    assert supported(big_tex, cfg)
    assert big_tex.atlas.width * big_tex.atlas.height <= 64 * 64
    # many-tile atlases fit the texture-row fetch bounds (mcworld: 176
    # texrows, 64 A-operand sublanes) and run in-kernel since round 2
    mc, _, _ = load_scene("scenes/mcworld_water.toml")
    assert supported(mc, cfg)


def test_mesh_ao_matches_scan():
    """Mesh + ambient occlusion through the megakernel (the reference's
    feature-complete CPU path: list_of_mesh scenes with useAO,
    main.c:316 + 94-116) vs the scan integrator — same draws, same
    occlusion booleans (the AO probes test the per-triangle table with
    any_hit's validity rules, NOT the merged-quad fast path)."""
    scene, cam, _ = load_scene("scenes/grass_block.toml")
    cfg = RenderConfig(
        width=16, height=12, spp=3, max_bounces=4, use_ao=True,
        ao_samples=2,
    )
    assert supported(scene, cfg)
    _compare(scene, cam, cfg, jax.random.PRNGKey(9))
    # and with the quad fast path on (grass_block pairs all 6 faces)
    _compare(
        scene, cam, cfg.replace(merge_quads=True), jax.random.PRNGKey(9)
    )


def test_mesh_ao_grad_matches_scan():
    """Gradients through the mesh+AO kernel path: the occlusion factor
    is recorded by the forward and replayed as a constant, which must
    equal the scan path's AD (the indicator sum is piecewise-constant,
    so its true derivative is zero a.e.)."""
    from raytpu.train import combine_scene, partition_scene

    scene, cam, _ = load_scene("scenes/grass_block.toml")
    cfg = RenderConfig(
        width=10, height=8, spp=2, max_bounces=3, use_ao=True,
        ao_samples=2, use_megakernel=True, pallas_interpret=True,
    )
    pids = jnp.arange(cfg.n_pixels, dtype=jnp.int32)
    key = jax.random.PRNGKey(77)
    params, static = partition_scene(scene)

    def loss(params, c):
        sums = render(combine_scene(params, static), cam, c, pids, key)
        return jnp.mean((sums.radiance.to_array() - 0.2) ** 2)

    g_mk = jax.grad(loss)(params, cfg)
    g_scan = jax.grad(loss)(params, cfg.replace(use_megakernel=False))
    for name, a, b in (
        ("atlas.rgb.x", g_mk.atlas.rgb.x, g_scan.atlas.rgb.x),
        ("mat.emission_strength", g_mk.mat_table.emission_strength,
         g_scan.mat_table.emission_strength),
        ("sph.diffuse.x", g_mk.spheres.mat.diffuse.x,
         g_scan.spheres.mat.diffuse.x),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7,
            err_msg=name,
        )
    assert float(np.abs(np.asarray(g_scan.atlas.rgb.x)).max()) > 0


def test_mesh_megakernel_grad_matches_scan():
    """The index-replay backward (trace_scene._mkm_bwd): the forward
    kernel records per-bounce winner indices and the pullback replays the
    trace through closest_hit(best_idx=...) — so gradients for EVERY
    scene leaf must equal the scan path's. The loss touches radiance AND
    the normal AOV (the AOV chain is the one continuous route from
    triangle vertices under nearest-texel fetch: normal_raw =
    cross(b-a, c-a) -> normalize)."""
    from raytpu.train import combine_scene, partition_scene

    scene, cam, _ = load_scene("scenes/pyramide.toml")
    cfg = RenderConfig(
        width=10, height=8, spp=3, max_bounces=5,
        use_megakernel=True, pallas_interpret=True,
    )
    pids = jnp.arange(cfg.n_pixels, dtype=jnp.int32)
    key = jax.random.PRNGKey(55)
    params, static = partition_scene(scene)

    def loss(params, c):
        sums = render(combine_scene(params, static), cam, c, pids, key)
        return (
            jnp.mean((sums.radiance.to_array() - 0.2) ** 2)
            + jnp.mean(sums.normal.to_array() ** 2)
        )

    g_mk = jax.grad(loss)(params, cfg)
    g_scan = jax.grad(loss)(params, cfg.replace(use_megakernel=False))
    checked = {
        "atlas.rgb.x": (g_mk.atlas.rgb.x, g_scan.atlas.rgb.x),
        "atlas.alpha": (g_mk.atlas.alpha, g_scan.atlas.alpha),
        "tri.a.x": (g_mk.triangles.a.x, g_scan.triangles.a.x),
        "tri.b.y": (g_mk.triangles.b.y, g_scan.triangles.b.y),
        "tri.c.z": (g_mk.triangles.c.z, g_scan.triangles.c.z),
        "mat.reflection": (g_mk.mat_table.reflection,
                           g_scan.mat_table.reflection),
        "sph.center.y": (g_mk.spheres.center.y, g_scan.spheres.center.y),
        "sph.diffuse.x": (g_mk.spheres.mat.diffuse.x,
                          g_scan.spheres.mat.diffuse.x),
    }
    nonzero = 0
    for name, (a, b) in checked.items():
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7,
            err_msg=name,
        )
        nonzero += bool(np.abs(np.asarray(b)).max() > 0)
    # the comparison must not be vacuous: the scan path produces real
    # gradient signal for most of the leaves above on this scene
    assert nonzero >= 5, f"only {nonzero} leaves had nonzero reference grads"


def test_mesh_megakernel_grad_origin_direction():
    """Ray-cotangent route: d(loss)/d(camera) flows through the kernel's
    VJP origin/direction cotangents (sample_rays pullback)."""
    from raytpu.core import rng as rrng
    from raytpu.integrator.path import n_bounce_draws, trace
    from raytpu.integrator.render import sample_rays
    from raytpu.kernels.trace_scene import trace_mesh_megakernel

    scene, cam, _ = load_scene("scenes/pyramide.toml")
    cfg = RenderConfig(width=8, height=6, spp=1, max_bounces=4)
    pids = jnp.arange(cfg.n_pixels, dtype=jnp.int32)
    pix_keys = rrng.pixel_keys(jax.random.PRNGKey(9), pids)
    ray_keys = rrng.sample_keys(pix_keys, jnp.int32(0))
    cam_draws, bounce_draws = rrng.ray_uniforms(
        ray_keys, 4, n_bounce_draws(cfg), cfg.max_bounces
    )
    origin, direction = sample_rays(cam, cfg, pids, cam_draws)

    def loss_mk(o, d):
        rad, _, nrm = trace_mesh_megakernel(
            scene, cfg, o, d, bounce_draws, interpret=True
        )
        return jnp.mean(rad.to_array() ** 2) + jnp.mean(nrm.to_array() ** 2)

    def loss_scan(o, d):
        rad, _, nrm = trace(scene, cfg, o, d, bounce_draws)
        return jnp.mean(rad.to_array() ** 2) + jnp.mean(nrm.to_array() ** 2)

    go_mk, gd_mk = jax.grad(loss_mk, argnums=(0, 1))(origin, direction)
    go_sc, gd_sc = jax.grad(loss_scan, argnums=(0, 1))(origin, direction)
    for name, a, b in (
        ("d_origin", go_mk.to_array(), go_sc.to_array()),
        ("d_direction", gd_mk.to_array(), gd_sc.to_array()),
    ):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7, err_msg=name)
        assert np.abs(b).max() > 0, f"{name}: vacuous comparison"

