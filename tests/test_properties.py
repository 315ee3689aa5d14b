"""Property tests (SURVEY.md §4): physical invariants of the estimator.

* radiance is non-negative everywhere;
* a scene with no emissive surfaces renders black;
* alpha = 1 behaves as fully opaque (identical to no-alpha);
* alpha -> 0 makes a surface invisible (cutout pass-through);
* throughput can only grow via the reference's deliberate x1.3 bright
  quirk — with the quirk neutralized it is monotone non-increasing,
  so radiance is bounded by the brightest emitter.
"""

import jax
import jax.numpy as jnp
import numpy as np

from raytpu.core.types import RenderConfig, Scene
from raytpu.integrator.render import render
from raytpu.scenes import BLACK, WHITE, cornell_box, spheres_from_rows


def _render(scene, cam, cfg, key=0):
    pids = jnp.arange(cfg.n_pixels, dtype=jnp.int32)
    sums = render(scene, cam, cfg, pids, jax.random.PRNGKey(key))
    return np.asarray(sums.radiance.to_array())


CFG = RenderConfig(width=12, height=8, spp=4, max_bounces=4)


def test_radiance_nonnegative():
    scene, cam, _ = cornell_box()
    rad = _render(scene, cam, CFG)
    assert (rad >= 0).all()
    assert np.isfinite(rad).all()


def test_no_emitters_renders_black():
    scene, cam, _ = cornell_box()
    m = scene.spheres.mat
    scene = scene.replace(
        spheres=scene.spheres.replace(
            mat=m.replace(emission_strength=jnp.zeros_like(m.emission_strength))
        )
    )
    rad = _render(scene, cam, CFG)
    np.testing.assert_array_equal(rad, 0.0)


def test_alpha_one_is_opaque():
    scene, cam, _ = cornell_box()
    m = scene.spheres.mat
    # alpha exactly 1 (> refr_alpha_hi) must equal the original scene
    # (whose alphas are already 1.0) bit for bit
    a = _render(scene, cam, CFG)
    scene2 = scene.replace(
        spheres=scene.spheres.replace(
            mat=m.replace(alpha=jnp.ones_like(m.alpha))
        )
    )
    b = _render(scene2, cam, CFG)
    np.testing.assert_array_equal(a, b)


def test_alpha_zero_is_invisible():
    """A cutout sphere in front of an emitter does not block it."""
    rows = [
        ((0, 0, -5), 1.0, WHITE, (1.0, 0.5, 0.25), 2.0, 0.0, 1.0, 1.0),
        # blocking sphere, alpha 0 -> invisible
        ((0, 0, -2.5), 0.8, WHITE, BLACK, 0.0, 0.0, 0.0, 1.0),
    ]
    scene = Scene.from_spheres(spheres_from_rows(rows))
    from raytpu.camera import make_camera

    cam = make_camera(
        origin=(0, 0, 0), target=(0, 0, -1), up=(0, 1, 0),
        vfov_deg=30.0, aspect_ratio=1.5,
    )
    rad = _render(scene, cam, CFG)
    # center pixels see the emitter's boosted color through the cutout
    center = rad.reshape(CFG.height, CFG.width, 3)[3:5, 5:7]
    assert center.mean() > 0.5 * CFG.spp


def test_throughput_bounded_without_bright_quirk():
    """With bright_boost=1 and diffuse <= 1, radiance <= max emission
    contribution per sample (energy conservation of the plain path)."""
    scene, cam, _ = cornell_box()
    cfg = CFG.replace(bright_boost=1.0)
    rad = _render(scene, cam, cfg)
    m = scene.spheres.mat
    # max emitted radiance of any single hit (HSL boost at factors 1.0
    # leaves emission unchanged; emission colors <= 1)
    max_emit = float(jnp.max(m.emission_strength))
    assert rad.max() <= cfg.spp * max(max_emit, 1.0) + 1e-4


def test_integrator_under_debug_nans():
    """SURVEY §5.2: the integrator must run clean under
    jax.config jax_debug_nans — no NaN is produced anywhere in the trace
    (the 1e-30/1e-38 floors in the sqrt/normalize chains exist exactly
    for this). debug_nans re-executes op-by-op on any NaN and raises,
    so simply completing the render is the assertion."""
    scene, cam, _ = cornell_box()
    cfg = RenderConfig(width=10, height=6, spp=2, max_bounces=4)
    jax.config.update("jax_debug_nans", True)
    try:
        out = _render(scene, cam, cfg)
    finally:
        jax.config.update("jax_debug_nans", False)
    assert np.isfinite(out).all()


def test_mesh_integrator_under_debug_nans():
    """Same NaN-cleanliness for the triangle + texture-atlas path
    (barycentric inv_area, UV wrap, atlas gather)."""
    from raytpu.config import load_scene

    scene, cam, _ = load_scene("scenes/pyramide.toml")
    cfg = RenderConfig(width=10, height=6, spp=2, max_bounces=4)
    jax.config.update("jax_debug_nans", True)
    try:
        pids = jnp.arange(cfg.n_pixels, dtype=jnp.int32)
        sums = render(scene, cam, cfg, pids, jax.random.PRNGKey(3))
        out = np.asarray(sums.radiance.to_array())
    finally:
        jax.config.update("jax_debug_nans", False)
    assert np.isfinite(out).all()
