"""Golden tests: the jitted f32 renderer vs the scalar f64 oracle
(tests/oracle.py) at equal RNG streams (SURVEY.md §4).

f32 vs f64 rounding can flip discrete decisions (closest-primitive ties,
refraction russian roulette, bright-threshold) for a small fraction of
rays, so the comparison allows a small outlier fraction and compares
means with a modest tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytpu.core.types import RenderConfig
from raytpu.integrator.render import render
from raytpu.scenes import cornell_box

from tests.oracle import render_oracle

pytestmark = pytest.mark.golden


def _compare(scene, cam, cfg, key, rtol=0.02, atol=0.02, outlier_frac=0.02):
    pixel_ids = jnp.arange(cfg.n_pixels, dtype=jnp.int32)
    sums = render(scene, cam, cfg, pixel_ids, key)
    got = np.asarray(sums.radiance.to_array(), np.float64)
    got_alb = np.asarray(sums.albedo.to_array(), np.float64)
    got_nrm = np.asarray(sums.normal.to_array(), np.float64)

    want, want_alb, want_nrm = render_oracle(scene, cam, cfg, key)

    for name, g, w in (
        ("radiance", got, want),
        ("albedo", got_alb, want_alb),
        ("normal", got_nrm, want_nrm),
    ):
        err = np.abs(g - w)
        tol = atol * cfg.spp + rtol * np.abs(w)
        bad = (err > tol).any(axis=-1)
        frac = bad.mean()
        assert frac <= outlier_frac, (
            f"{name}: {frac:.3%} pixels out of tolerance "
            f"(max err {err.max():.4f})"
        )


@pytest.mark.slow
def test_cornell_matches_oracle():
    scene, cam, _ = cornell_box()
    cfg = RenderConfig(width=16, height=12, spp=4, max_bounces=5)
    _compare(scene, cam, cfg, jax.random.PRNGKey(3))


@pytest.mark.slow
def test_cornell_ao_matches_oracle():
    scene, cam, _ = cornell_box()
    cfg = RenderConfig(
        width=12, height=8, spp=3, max_bounces=4, use_ao=True, ao_intensity=2.5
    )
    _compare(scene, cam, cfg, jax.random.PRNGKey(5))


@pytest.mark.slow
def test_cornell_dof_matches_oracle():
    """Depth of field: aperture origin jitter + focus re-aim
    (camera.h:42-54, exercised nowhere else against the oracle)."""
    scene, cam, _ = cornell_box()
    cfg = RenderConfig(
        width=12, height=8, spp=3, max_bounces=4,
        aperture_x=0.3, aperture_y=0.3, focus_distance=3.0,
    )
    _compare(scene, cam, cfg, jax.random.PRNGKey(6))


@pytest.mark.slow
def test_cuda_hsl_boost_matches_oracle():
    """The CUDA fork's emissive L*=1.2 HSL boost (main_cuda.cu:89-98)."""
    from raytpu.scenes import cornell_box_cuda

    scene, cam, _ = cornell_box_cuda()
    cfg = RenderConfig(
        width=12, height=8, spp=3, max_bounces=3, hsl_l_factor=1.2
    )
    _compare(scene, cam, cfg, jax.random.PRNGKey(7))


@pytest.mark.slow
def test_cornell_dof_asym_matches_oracle():
    """Asymmetric aperture (ouverture_x != ouverture_y) variant — the
    reference jitters x and y independently (camera.h:44-45)."""
    scene, cam, _ = cornell_box()
    cfg = RenderConfig(
        width=12, height=8, spp=3, max_bounces=3,
        aperture_x=0.3, aperture_y=0.2, focus_distance=3.0,
    )
    _compare(scene, cam, cfg, jax.random.PRNGKey(11))


@pytest.mark.slow
def test_refraction_stack_matches_oracle():
    """Glass + water spheres exercise the pile.h IOR-stack semantics
    (push on entry, pop+swap on exit) and the probabilistic
    refract-vs-scatter split (main.c:167-193)."""
    from raytpu.camera import make_camera
    from raytpu.core.types import Scene
    from raytpu.scenes import BLACK, SKY, WHITE, spheres_from_rows

    rows = [
        ((0, -501, 0), 500.0, WHITE, BLACK, 0.0, 0.0, 1.0, 1.0),   # floor
        ((0, 0, -3), 1.0, WHITE, BLACK, 0.0, 0.3, 0.1, 1.5),       # glass ball
        ((0.8, 0.2, -2), 0.5, (0.6, 0.8, 1.0), BLACK, 0.0, 0.93, 0.6, 1.33),  # water ball
        ((0, 0, 0), 100.0, BLACK, SKY, 1.0, 0.0, 1.0, 1.0),        # sky dome
    ]
    scene = Scene.from_spheres(spheres_from_rows(rows))
    cam = make_camera(
        origin=(0, 0.5, 2), target=(0, 0, -3), up=(0, 1, 0),
        vfov_deg=50.0, aspect_ratio=1.5,
    )
    cfg = RenderConfig(width=12, height=8, spp=4, max_bounces=8)
    _compare(scene, cam, cfg, jax.random.PRNGKey(13), outlier_frac=0.05)


@pytest.mark.slow
def test_textured_mesh_matches_oracle():
    """mcworld mesh: triangles + texture atlas + alpha-cutout leaves
    (tri_uvmapping semantics, texture.h:44-89)."""
    from raytpu.camera import make_camera
    from raytpu.io.obj import load_obj_scene
    from raytpu.scenes import BLACK, SKY, spheres_from_rows

    d = "/root/reference/model3D/mcworld_tiltedtex_water"
    sky = spheres_from_rows([((0, 0, 0), 10000.0, BLACK, SKY, 1.0, 0.0, 1.0, 1.0)])
    scene = load_obj_scene(
        f"{d}/mineways_tri.obj", f"{d}/mineways_tri.mtl", spheres=sky
    )
    cam = make_camera(
        origin=(2.5, 2.6, 2.5), target=(0.075, 1.0, 0.0), up=(0, 1, 0),
        vfov_deg=45.0, aspect_ratio=1.5,
    )
    cfg = RenderConfig(width=12, height=8, spp=2, max_bounces=4)
    _compare(scene, cam, cfg, jax.random.PRNGKey(17), outlier_frac=0.05)


def test_textured_mesh_ao_matches_oracle():
    """Mesh + ambient occlusion vs the f64 oracle: the reference's
    feature-complete CPU configuration (list_of_mesh scenes with useAO,
    /root/reference/main.c:316; ambient_occlusion main.c:94-116 probes
    closest_hit over spheres AND triangles)."""
    from raytpu.camera import make_camera
    from raytpu.io.obj import load_obj_scene
    from raytpu.scenes import BLACK, SKY, spheres_from_rows

    d = "/root/reference/model3D/mcworld_tiltedtex_water"
    sky = spheres_from_rows([((0, 0, 0), 10000.0, BLACK, SKY, 1.0, 0.0, 1.0, 1.0)])
    scene = load_obj_scene(
        f"{d}/mineways_tri.obj", f"{d}/mineways_tri.mtl", spheres=sky
    )
    cam = make_camera(
        origin=(2.5, 2.6, 2.5), target=(0.075, 1.0, 0.0), up=(0, 1, 0),
        vfov_deg=45.0, aspect_ratio=1.5,
    )
    cfg = RenderConfig(
        width=12, height=8, spp=2, max_bounces=4, use_ao=True,
        ao_samples=2, ao_intensity=2.5,
    )
    _compare(scene, cam, cfg, jax.random.PRNGKey(19), outlier_frac=0.05)
