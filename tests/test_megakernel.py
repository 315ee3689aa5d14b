"""The full-bounce-loop megakernel vs the scan integrator: same RNG
streams, same semantics, compared in interpreter mode on CPU (and
compiled on TPU in bench/CI)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytpu.core.types import RenderConfig, Scene
from raytpu.integrator.render import render
from raytpu.kernels.trace_spheres import supported
from raytpu.scenes import BLACK, WHITE, cornell_box, spheres_from_rows

pytestmark = pytest.mark.kernel


def _compare(scene, cam, cfg, key, atol=1e-4, outlier_frac=0.02):
    """Scan vs megakernel. In interpreter mode the kernel runs op-by-op
    while the jitted scan path gets XLA's FMA contraction
    (xla_allow_excess_precision), so grazing hits on the 500-radius wall
    spheres (catastrophically cancelling discriminants) can flip for
    rare samples — a tiny per-pixel outlier fraction is allowed. On TPU,
    compiled-vs-compiled is bit-identical (max diff 0.0 at 1200x900x50spp,
    checked in bench runs)."""
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


def test_cornell_matches_scan():
    scene, cam, _ = cornell_box()
    cfg = RenderConfig(width=16, height=12, spp=4, max_bounces=5)
    assert supported(scene, cfg)
    _compare(scene, cam, cfg, jax.random.PRNGKey(41))


def test_refractive_spheres_match_scan():
    rows = [
        ((0, -501, 0), 500.0, WHITE, BLACK, 0.0, 0.0, 1.0, 1.0),
        ((0, 1.5, -3), 0.8, BLACK, (1.0, 0.9, 0.7), 5.0, 0.0, 1.0, 1.0),
        # glass ball: alpha in the refraction window
        ((0, 0, -3), 0.7, WHITE, BLACK, 0.0, 0.2, 0.1, 1.5),
        # cutout ball
        ((0.9, 0, -2.2), 0.4, WHITE, BLACK, 0.0, 0.0, 0.0, 1.0),
    ]
    scene = Scene.from_spheres(spheres_from_rows(rows))
    from raytpu.camera import make_camera

    cam = make_camera(
        origin=(0, 0, 1), target=(0, 0, -3), up=(0, 1, 0),
        vfov_deg=50.0, aspect_ratio=1.5,
    )
    cfg = RenderConfig(width=12, height=8, spp=4, max_bounces=6)
    _compare(scene, cam, cfg, jax.random.PRNGKey(42))


def test_ao_dof_matches_scan():
    """BASELINE config 2's features: AO probes + DoF aperture jitter."""
    scene, cam, _ = cornell_box()
    cfg = RenderConfig(
        width=12, height=8, spp=3, max_bounces=4,
        use_ao=True, ao_intensity=2.5,
        aperture_x=0.3, aperture_y=0.3, focus_distance=3.0,
    )
    assert supported(scene, cfg)
    _compare(scene, cam, cfg, jax.random.PRNGKey(43))


def test_hsl_boost_matches_scan():
    """The CUDA fork's L*=1.2 HSL boost, in-kernel."""
    scene, cam, _ = cornell_box()
    cfg = RenderConfig(
        width=12, height=8, spp=3, max_bounces=3, hsl_l_factor=1.2
    )
    assert supported(scene, cfg)
    _compare(scene, cam, cfg, jax.random.PRNGKey(46))


def test_unsupported_configs_fall_back():
    scene, cam, _ = cornell_box()
    # sky scenes are a first-class kernel path since round 3 (the
    # single-slot sky composition, _forward_body docstring) — supported
    # whether or not a texture is attached (no texture = plain emitter)
    assert supported(scene.replace(sky_sphere_index=1), RenderConfig())
    # a sky index past the sphere table is the remaining unsupported case
    assert not supported(
        scene.replace(sky_sphere_index=99), RenderConfig()
    )
    # textured-sky scene renders through the kernel path
    from raytpu.core.types import SkyTexture
    from raytpu.core.vec3 import Vec3 as _V

    sky = SkyTexture(
        rgb=_V(jnp.ones(4), jnp.ones(4), jnp.ones(4)), width=2, height=2
    )
    s2 = scene.replace(sky=sky, sky_sphere_index=9)
    assert supported(s2, RenderConfig())
    cfg = RenderConfig(
        width=8, height=6, spp=2, max_bounces=3,
        use_megakernel=True, pallas_interpret=True,
    )
    pids = jnp.arange(cfg.n_pixels, dtype=jnp.int32)
    out = render(s2, cam, cfg, pids, jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(out.radiance.to_array())).all()


def test_megakernel_sharded_matches_single_device():
    """The megakernel composes with the ('tiles','samples') mesh: a
    sharded megakernel render equals the unsharded megakernel render
    exactly (same arithmetic, same per-(pixel, sample) RNG streams)."""
    from raytpu.sharding import make_mesh, render_sharded

    scene, cam, _ = cornell_box()
    cfg = RenderConfig(
        width=16, height=8, spp=8, max_bounces=3,
        use_megakernel=True, pallas_interpret=True,
    )
    pids = jnp.arange(cfg.n_pixels, dtype=jnp.int32)
    key = jax.random.PRNGKey(44)
    ref = render(scene, cam, cfg, pids, key)
    mesh = make_mesh(2, 4)
    got = render_sharded(scene, cam, cfg, pids, key, mesh)
    np.testing.assert_allclose(
        np.asarray(got.radiance.to_array()),
        np.asarray(ref.radiance.to_array()),
        rtol=1e-5, atol=1e-5,
    )


def test_megakernel_grad_matches_scan():
    """jax.grad through use_megakernel runs the hand-structured backward
    megakernel (kernels/trace_spheres._bwd_kernel — jax.vjp of the shared
    bounce-loop body, fused in VMEM); its sphere-parameter cotangents
    must equal the scan configuration's gradients."""
    from raytpu.train import combine_scene, partition_scene

    scene, cam, _ = cornell_box()
    cfg = RenderConfig(
        width=8, height=6, spp=2, max_bounces=3,
        use_megakernel=True, pallas_interpret=True,
    )
    pids = jnp.arange(cfg.n_pixels, dtype=jnp.int32)
    key = jax.random.PRNGKey(45)
    params, static = partition_scene(scene)

    def loss(params, c):
        sums = render(combine_scene(params, static), cam, c, pids, key)
        return jnp.mean((sums.radiance.to_array() - 0.2) ** 2)

    g_mk = jax.grad(loss)(params, cfg)
    g_scan = jax.grad(loss)(params, cfg.replace(use_megakernel=False))
    np.testing.assert_allclose(
        np.asarray(g_mk.spheres.mat.diffuse.x),
        np.asarray(g_scan.spheres.mat.diffuse.x),
        rtol=1e-5, atol=1e-6,
    )
    # regression: the same grad under an ENCLOSING jit — custom_vjp
    # functions must not close over traced values (pix_keys/pixel_ids
    # become tracers under jit and used to break residual packing with
    # "No constant handler for DynamicJaxprTracer")
    g_jit = jax.jit(lambda p: jax.grad(loss)(p, cfg))(params)
    np.testing.assert_allclose(
        np.asarray(g_jit.spheres.mat.diffuse.x),
        np.asarray(g_scan.spheres.mat.diffuse.x),
        rtol=1e-5, atol=1e-6,
    )


def test_megakernel_camera_grads_match_scan():
    """Camera-pose gradients flow through the backward kernel's RAY
    cotangent outputs (d_origin/d_direction feed get_rays' pullback) —
    not just the sphere-table cotangents the previous test covers.

    The loss targets the first-hit NORMAL AOV: radiance is piecewise
    constant in ray geometry by design (winner selection runs under
    stop_gradient, emission/diffuse products carry no dst dependence —
    the documented silhouette-bias estimator, train/inverse.py), so a
    radiance loss has identically-zero camera gradients on BOTH paths.
    The normal = (point - center)/radius depends smoothly on the ray, so
    it exercises the d_origin/d_direction outputs for real."""
    scene, cam, _ = cornell_box()
    cfg = RenderConfig(
        width=8, height=6, spp=2, max_bounces=3,
        use_megakernel=True, pallas_interpret=True,
    )
    pids = jnp.arange(cfg.n_pixels, dtype=jnp.int32)
    key = jax.random.PRNGKey(47)

    def loss(cam, c):
        sums = render(scene, cam, c, pids, key)
        return jnp.mean(sums.normal.to_array() * jnp.arange(3.0))

    g_mk = jax.grad(loss)(cam, cfg)
    g_scan = jax.grad(loss)(cam, cfg.replace(use_megakernel=False))
    fk, _ = jax.tree_util.tree_flatten(g_mk)
    fs, _ = jax.tree_util.tree_flatten(g_scan)
    assert any(np.abs(np.asarray(x)).max() > 0 for x in fs)
    for a, b in zip(fk, fs):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
        )


def test_megakernel_ao_grad_matches_scan():
    """Sphere AO gradients through the round-5 index-replay backward:
    the forward records occlusion factors and the replay treats them as
    constants — which must equal the scan path's AD exactly (the
    indicator sum is piecewise-constant, so its true derivative is zero
    a.e.; emission compensation rides e_scale_mult)."""
    from raytpu.config import load_scene
    from raytpu.train import combine_scene, partition_scene

    scene, cam, cfg0 = load_scene("scenes/cornell_dof_ao.toml")
    cfg = cfg0.replace(
        width=8, height=6, spp=2, max_bounces=3,
        use_megakernel=True, pallas_interpret=True,
    )
    assert cfg.use_ao
    pids = jnp.arange(cfg.n_pixels, dtype=jnp.int32)
    key = jax.random.PRNGKey(31)
    params, static = partition_scene(scene)

    def loss(params, c):
        sums = render(combine_scene(params, static), cam, c, pids, key)
        return jnp.mean((sums.radiance.to_array() - 0.2) ** 2)

    g_mk = jax.grad(loss)(params, cfg)
    g_scan = jax.grad(loss)(params, cfg.replace(use_megakernel=False))
    for name, a, b in (
        ("diffuse.x", g_mk.spheres.mat.diffuse.x,
         g_scan.spheres.mat.diffuse.x),
        ("emission_strength", g_mk.spheres.mat.emission_strength,
         g_scan.spheres.mat.emission_strength),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7,
            err_msg=name,
        )
    assert float(np.abs(np.asarray(g_scan.spheres.mat.diffuse.x)).max()) > 0
