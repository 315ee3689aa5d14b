"""Distributed determinism tests on the 8-virtual-device CPU mesh
(SURVEY.md §4): any (tiles, samples) factorization must produce sums
bit-comparable (up to f32 reduction-order) to the single-device render,
because RNG streams are keyed by (pixel, global sample index)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytpu.core.types import RenderConfig
from raytpu.integrator.render import render, render_image
from raytpu.scenes import cornell_box
from raytpu.sharding import make_mesh, render_sharded, render_image_sharded


@pytest.fixture(scope="module")
def setup():
    scene, cam, cfg = cornell_box()
    cfg = cfg.replace(width=16, height=8, spp=8, max_bounces=3)
    key = jax.random.PRNGKey(0)
    pids = jnp.arange(cfg.n_pixels, dtype=jnp.int32)
    ref = render(scene, cam, cfg, pids, key)
    return scene, cam, cfg, key, pids, ref


@pytest.mark.parametrize("nt,ns", [(1, 8), (2, 4), (4, 2), (8, 1)])
def test_mesh_factorization_matches_single_device(setup, nt, ns):
    scene, cam, cfg, key, pids, ref = setup
    mesh = make_mesh(nt, ns)
    got = render_sharded(scene, cam, cfg, pids, key, mesh)
    np.testing.assert_allclose(
        np.asarray(got.radiance.to_array()),
        np.asarray(ref.radiance.to_array()),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(got.albedo.to_array()),
        np.asarray(ref.albedo.to_array()),
        rtol=1e-5, atol=1e-5,
    )
    assert int(np.asarray(got.samples).ravel()[0]) == cfg.spp


def test_render_image_sharded_matches_unsharded(setup):
    scene, cam, cfg, key, _, _ = setup
    mesh = make_mesh(2, 4)
    a = render_image(scene, cam, cfg, key)
    b = render_image_sharded(scene, cam, cfg, key, mesh)
    np.testing.assert_allclose(a.image, b.image, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(a.canvas, b.canvas)


def test_spp_not_divisible_raises(setup):
    scene, cam, cfg, key, pids, _ = setup
    mesh = make_mesh(1, 8)
    with pytest.raises(ValueError, match="spp"):
        render_sharded(scene, cam, cfg.replace(spp=7), pids, key, mesh)
