"""emission_from_texture (superset flag): texel-modulated emission vs
the f64 oracle at equal RNG."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from raytpu.config import load_scene_file
from raytpu.core.types import RenderConfig
from raytpu.integrator.render import render

from tests.oracle import render_oracle

ROOT = os.path.join(os.path.dirname(__file__), "..")


def test_texel_modulated_emission_matches_oracle():
    scene, cam, _ = load_scene_file(os.path.join(ROOT, "scenes/pyramide.toml"))
    mt = scene.mat_table
    scene = scene.replace(
        mat_table=mt.replace(
            emission=jax.tree.map(lambda x: jnp.ones_like(x), mt.emission),
            emission_strength=jnp.full_like(mt.emission_strength, 1.5),
            emission_from_texture=jnp.ones_like(mt.emission_from_texture),
        )
    )
    cfg = RenderConfig(width=10, height=8, spp=2, max_bounces=3)
    key = jax.random.PRNGKey(51)
    pids = jnp.arange(cfg.n_pixels, dtype=jnp.int32)
    sums = render(scene, cam, cfg, pids, key)
    got = np.asarray(sums.radiance.to_array(), np.float64)
    want, _, _ = render_oracle(scene, cam, cfg, key)
    err = np.abs(got - want)
    tol = 0.02 * cfg.spp + 0.02 * np.abs(want)
    bad = (err > tol).any(axis=-1)
    assert bad.mean() <= 0.1, f"{bad.mean():.1%} out (max {err.max():.3f})"
    # emission must actually vary with the texel (not flat)
    assert got.std() > 1e-3
