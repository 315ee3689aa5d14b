"""Pallas intersection kernel vs the XLA distance-matrix path.

Runs the kernel in interpreter mode on CPU (SURVEY.md §7: 'keep the jnp
path as the always-correct fallback and test them against each other').
The same comparison runs compiled on real TPU in bench/CI."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytpu.config import load_scene
from raytpu.core.types import RenderConfig
from raytpu.integrator.hit import closest_hit
from raytpu.integrator.render import render
from raytpu.geometry.triangle import precompute
from raytpu.scenes import cornell_box

pytestmark = pytest.mark.kernel


def _random_rays(key, b):
    k1, k2 = jax.random.split(key)
    from raytpu.core.vec3 import Vec3

    o = jax.random.uniform(k1, (b, 3), minval=-2.0, maxval=2.0)
    d = jax.random.normal(k2, (b, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return Vec3.from_array(o), Vec3.from_array(d)


@pytest.mark.parametrize("scene_name", ["cornell", "scenes/pyramide.toml"])
def test_pallas_matches_jnp_closest_hit(scene_name):
    import os

    path = os.path.join(os.path.dirname(__file__), "..", scene_name)
    scene, cam, _ = load_scene(scene_name if scene_name == "cornell" else path)
    cfg_jnp = RenderConfig()
    cfg_pal = RenderConfig(use_pallas=True, pallas_interpret=True)

    origin, direction = _random_rays(jax.random.PRNGKey(0), 512)
    geom = precompute(scene.triangles) if scene.triangles.count else None

    a = closest_hit(scene, geom, origin, direction, cfg_jnp)
    b = closest_hit(scene, geom, origin, direction, cfg_pal)

    np.testing.assert_array_equal(np.asarray(a.did_hit), np.asarray(b.did_hit))
    np.testing.assert_allclose(
        np.asarray(a.dst), np.asarray(b.dst), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(a.normal.to_array()),
        np.asarray(b.normal.to_array()),
        rtol=1e-6, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(a.mat.diffuse.to_array()),
        np.asarray(b.mat.diffuse.to_array()),
        rtol=1e-6, atol=1e-6,
    )


def test_pallas_full_render_matches():
    scene, cam, _ = cornell_box()
    cfg = RenderConfig(width=16, height=12, spp=4, max_bounces=4)
    pids = jnp.arange(cfg.n_pixels, dtype=jnp.int32)
    key = jax.random.PRNGKey(1)
    a = render(scene, cam, cfg, pids, key)
    b = render(
        scene, cam, cfg.replace(use_pallas=True, pallas_interpret=True),
        pids, key,
    )
    np.testing.assert_allclose(
        np.asarray(a.radiance.to_array()),
        np.asarray(b.radiance.to_array()),
        rtol=1e-5, atol=1e-5,
    )
