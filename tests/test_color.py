"""HSL round-trip / tonemap / quantize tests (rtutility.h:56-165 semantics)."""

import colorsys

import jax.numpy as jnp
import numpy as np

from raytpu.core.color import hsl_boost, hsl_to_rgb, quantize, rgb_to_hsl, tonemap
from raytpu.core.vec3 import Vec3


def test_hsl_matches_colorsys():
    rng = np.random.default_rng(0)
    rgb = rng.uniform(0, 1, (64, 3)).astype(np.float32)
    got = np.asarray(rgb_to_hsl(Vec3.from_array(jnp.asarray(rgb))).to_array())
    for i in range(64):
        h, l, s = colorsys.rgb_to_hls(*rgb[i])
        np.testing.assert_allclose(got[i], [h, s, l], rtol=1e-3, atol=1e-4)


def test_hsl_roundtrip_identity():
    """main.c:154-160 boosts L and S by 1.0 — the round trip must be
    (numerically) the identity."""
    rng = np.random.default_rng(1)
    rgb = rng.uniform(0, 4, (128, 3)).astype(np.float32)  # emission can exceed 1
    rgb[:8] = rgb[:8, :1]  # some gray rows (s == 0 path)
    v = Vec3.from_array(jnp.asarray(rgb))
    back = np.asarray(hsl_to_rgb(rgb_to_hsl(v)).to_array())
    np.testing.assert_allclose(back, rgb, rtol=1e-3, atol=2e-3)


def test_hsl_boost_factor():
    v = Vec3.create([0.5], [0.2], [0.1])
    boosted = np.asarray(hsl_boost(v, l_factor=1.2).to_array())[0]
    plain = np.asarray(hsl_boost(v).to_array())[0]
    assert boosted.sum() > plain.sum()


def test_tonemap_quantize_matches_reference_math():
    """write_color_canva (rtutility.h:56-71): sqrt(sum/spp), clamp .999,
    *256 truncate."""
    sums = np.array([[0.0, 0.25, 4.0], [100.0, 0.5, 0.9999]], np.float32)
    spp = 4
    mean = Vec3.from_array(jnp.asarray(sums / spp))
    q = np.asarray(quantize(tonemap(mean)).to_array())
    want = np.floor(256 * np.clip(np.sqrt(sums / spp), 0, 0.999))
    np.testing.assert_array_equal(q, want)
