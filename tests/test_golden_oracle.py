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
    scene, cam, _ = cornell_box()
    cfg = RenderConfig(
        width=12, height=8, spp=3, max_bounces=3,
        aperture_x=0.3, aperture_y=0.2, focus_distance=3.0,
    )
    _compare(scene, cam, cfg, jax.random.PRNGKey(11))
