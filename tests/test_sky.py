"""Sky-sphere environment mapping (sphere_uvmapping, texture.h:92-112;
the 'derniere sphere = ciel' convention, main.c:331) vs the f64 oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytpu.core.types import RenderConfig, Scene
from raytpu.core.vec3 import Vec3
from raytpu.core.types import SkyTexture
from raytpu.integrator.render import render
from raytpu.scenes import BLACK, spheres_from_rows

from tests.oracle import render_oracle


def _sky_scene():
    rows = [
        # one diffuse ball + the giant sky sphere (emissive via texture)
        ((0, 0, -3), 1.0, (0.8, 0.8, 0.8), BLACK, 0.0, 0.0, 1.0, 1.0),
        ((0, 0, 0), 1000.0, BLACK, (1.0, 1.0, 1.0), 1.0, 0.0, 1.0, 1.0),
    ]
    scene = Scene.from_spheres(spheres_from_rows(rows))
    # small procedural equirect texture: horizontal color bands
    h, w = 8, 16
    tex = np.zeros((h * w, 3), np.float32)
    for y in range(h):
        tex[y * w : (y + 1) * w] = [y / h, 0.5, 1.0 - y / h]
    sky = SkyTexture(
        rgb=Vec3(
            jnp.asarray(tex[:, 0]), jnp.asarray(tex[:, 1]), jnp.asarray(tex[:, 2])
        ),
        width=w,
        height=h,
    )
    return scene.replace(sky=sky, sky_sphere_index=1)


def test_sky_matches_oracle():
    from raytpu.camera import make_camera

    scene = _sky_scene()
    cam = make_camera(
        origin=(0, 0, 2), target=(0, 0, -3), up=(0, 1, 0),
        vfov_deg=60.0, aspect_ratio=1.5,
    )
    cfg = RenderConfig(width=12, height=8, spp=3, max_bounces=3)
    key = jax.random.PRNGKey(31)
    pids = jnp.arange(cfg.n_pixels, dtype=jnp.int32)
    sums = render(scene, cam, cfg, pids, key)
    got = np.asarray(sums.radiance.to_array(), np.float64)
    want, _, _ = render_oracle(scene, cam, cfg, key)
    err = np.abs(got - want)
    tol = 0.02 * cfg.spp + 0.02 * np.abs(want)
    bad = (err > tol).any(axis=-1)
    assert bad.mean() <= 0.05, f"{bad.mean():.2%} out (max {err.max():.4f})"
    # the sky must actually contribute color variation
    assert got.std() > 0.05
