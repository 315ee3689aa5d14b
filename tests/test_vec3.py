"""Unit tests for the SoA vector core (vs numpy f64 closed forms)."""

import jax.numpy as jnp
import numpy as np
import pytest

from raytpu.core.vec3 import Vec3, random_unit_vector, reflect, refract


def rand_vec(rng, n=16):
    a = rng.standard_normal((n, 3)).astype(np.float32)
    return Vec3.from_array(jnp.asarray(a)), a.astype(np.float64)


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def test_dot_cross_length(rng):
    v, vn = rand_vec(rng)
    w, wn = rand_vec(rng)
    np.testing.assert_allclose(v.dot(w), np.sum(vn * wn, -1), rtol=1e-5)
    np.testing.assert_allclose(
        v.cross(w).to_array(), np.cross(vn, wn), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(v.length(), np.linalg.norm(vn, axis=-1), rtol=1e-5)


def test_normalize(rng):
    v, vn = rand_vec(rng)
    u = v.normalize()
    np.testing.assert_allclose(u.length(), 1.0, rtol=1e-5)
    # zero vector normalizes to zero (guarded), like vec3_normalize on 0
    z = Vec3.zeros((2,)).normalize()
    np.testing.assert_array_equal(np.asarray(z.to_array()), 0.0)


def test_lerp_endpoints(rng):
    v, vn = rand_vec(rng)
    w, wn = rand_vec(rng)
    np.testing.assert_allclose(v.lerp(w, 0.0).to_array(), vn, rtol=1e-6)
    np.testing.assert_allclose(v.lerp(w, 1.0).to_array(), wn, rtol=1e-5, atol=1e-6)


def test_reflect_matches_formula(rng):
    v, vn = rand_vec(rng)
    nrm, nn = rand_vec(rng)
    nrm = nrm.normalize()
    nn = nn / np.linalg.norm(nn, axis=-1, keepdims=True)
    got = reflect(v, nrm).to_array()
    want = vn - 2 * np.sum(vn * nn, -1, keepdims=True) * nn
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_reflect_preserves_length_mirror():
    # mirror a straight-down vector off the y-up plane
    v = Vec3.create([0.0], [-1.0], [0.0])
    n = Vec3.create([0.0], [1.0], [0.0])
    r = reflect(v, n).to_array()
    np.testing.assert_allclose(np.asarray(r), [[0.0, 1.0, 0.0]], atol=1e-7)


def test_refract_squaring_quirk():
    """The reference squares n1, n2 before use (rtutility.h:214-215), so the
    tangential scale is (n1/n2)^2, NOT the Snell n1/n2. Assert we reproduce
    that exact behavior."""
    v = Vec3.create([0.6], [-0.8], [0.0])  # unit, entering
    n = Vec3.create([0.0], [1.0], [0.0])
    n1, n2 = 1.0, 1.5
    got = np.asarray(refract(v, n, jnp.float32(n1), jnp.float32(n2)).to_array())[0]
    # reference math in f64
    n1s, n2s = n1 * n1, n2 * n2
    ratio = n1s / n2s
    ndotv = -0.8
    radical = 1 - ratio**2 * (1 - ndotv**2)
    tan = (np.array([0.6, -0.8, 0.0]) - np.array([0, 1, 0]) * ndotv) * ratio
    nor = -np.array([0, 1, 0]) * np.sqrt(radical)
    np.testing.assert_allclose(got, tan + nor, rtol=1e-5, atol=1e-6)


def test_refract_total_internal_reflection():
    # grazing exit with high ratio -> radical < 0 -> mirror fallback
    v = Vec3.create([0.995], [-0.0998], [0.0])
    n = Vec3.create([0.0], [1.0], [0.0])
    got = np.asarray(refract(v, n, jnp.float32(2.0), jnp.float32(1.0)).to_array())[0]
    want = np.asarray(reflect(v, n).to_array())[0]
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_random_unit_vector_is_unit_and_uniform():
    import jax

    k = jax.random.PRNGKey(0)
    u = jax.random.uniform(k, (5000,))
    v = jax.random.uniform(jax.random.PRNGKey(1), (5000,))
    d = random_unit_vector(u, v)
    np.testing.assert_allclose(np.asarray(d.length()), 1.0, atol=1e-5)
    # mean should be near zero for a uniform sphere distribution
    m = np.asarray(d.to_array()).mean(0)
    assert np.all(np.abs(m) < 0.05), m
