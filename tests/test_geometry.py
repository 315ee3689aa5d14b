"""Geometry kernel unit tests vs closed-form cases (SURVEY.md §4),
including the reference's epsilon conventions (sphere.h:29, mesh.h:88)."""

import jax.numpy as jnp
import numpy as np

from raytpu.core.types import Triangles
from raytpu.core.vec3 import Vec3
from raytpu.geometry.sphere import sphere_distances
from raytpu.geometry.triangle import (
    build_aabb,
    barycentric,
    hit_aabb,
    precompute,
    triangle_distances,
)


def vec(*rows):
    a = np.array(rows, np.float32)
    return Vec3(jnp.asarray(a[:, 0]), jnp.asarray(a[:, 1]), jnp.asarray(a[:, 2]))


def make_tris(verts):
    """verts: list of (A, B, C) triples."""
    a = vec(*[t[0] for t in verts])
    b = vec(*[t[1] for t in verts])
    c = vec(*[t[2] for t in verts])
    z = jnp.zeros((len(verts),))
    return Triangles(a, b, c, z, z, z, z, z, z, jnp.zeros((len(verts),), jnp.int32))


class TestSphere:
    def test_head_on(self):
        o = vec((0, 0, 0))
        d = vec((0, 0, -1))
        c = vec((0, 0, -5))
        t = sphere_distances(o, d, c, jnp.asarray([1.0]))
        np.testing.assert_allclose(np.asarray(t), [[4.0]], rtol=1e-6)

    def test_miss(self):
        o = vec((0, 0, 0))
        d = vec((0, 1, 0))
        c = vec((0, 0, -5))
        t = sphere_distances(o, d, c, jnp.asarray([1.0]))
        assert np.isinf(np.asarray(t)).all()

    def test_inside_sphere_takes_far_root(self):
        """t1 < 0 inside the sphere; the reference falls through to t2
        (sphere.h:27-44)."""
        o = vec((0, 0, 0))
        d = vec((0, 0, -1))
        c = vec((0, 0, 0))
        t = sphere_distances(o, d, c, jnp.asarray([2.0]))
        np.testing.assert_allclose(np.asarray(t), [[2.0]], rtol=1e-6)

    def test_eps_rejects_grazing_self_hit(self):
        """roots below 1e-4 are rejected (sphere.h:29,38)."""
        o = vec((0, 0, 1.0))  # on the sphere surface
        d = vec((0, 0, 1.0))  # leaving
        c = vec((0, 0, 0))
        t = sphere_distances(o, d, c, jnp.asarray([1.0]))
        assert np.isinf(np.asarray(t)).all()

    def test_unnormalized_direction(self):
        """The reference uses a = dot(dir, dir), not assuming unit dir
        (sphere.h:22)."""
        o = vec((0, 0, 0))
        d = vec((0, 0, -2))
        c = vec((0, 0, -5))
        t = sphere_distances(o, d, c, jnp.asarray([1.0]))
        np.testing.assert_allclose(np.asarray(t), [[2.0]], rtol=1e-6)


class TestTriangle:
    def test_head_on_hit(self):
        tris = make_tris([(( -1, -1, -3), (1, -1, -3), (0, 1, -3))])
        geom = precompute(tris)
        o = vec((0, 0, 0))
        d = vec((0, 0, -1))
        t = triangle_distances(o, d, geom)
        np.testing.assert_allclose(np.asarray(t), [[3.0]], rtol=1e-6)

    def test_backface_cull(self):
        """det >= 1e-6 culls backfaces (mesh.h:88): reversing the winding
        makes the same geometric hit invisible."""
        tris = make_tris([((1, -1, -3), (-1, -1, -3), (0, 1, -3))])
        geom = precompute(tris)
        o = vec((0, 0, 0))
        d = vec((0, 0, -1))
        t = triangle_distances(o, d, geom)
        assert np.isinf(np.asarray(t)).all()

    def test_outside_misses(self):
        tris = make_tris([((-1, -1, -3), (1, -1, -3), (0, 1, -3))])
        geom = precompute(tris)
        o = vec((5, 5, 0))
        d = vec((0, 0, -1))
        t = triangle_distances(o, d, geom)
        assert np.isinf(np.asarray(t)).all()

    def test_barycentric_recovers_uv(self):
        tris = make_tris([((-1, -1, -3), (1, -1, -3), (0, 1, -3))])
        geom = precompute(tris)
        p = vec((0.0, -1 / 3, -3.0))  # centroid
        a = tris.a.take(jnp.asarray([0]))
        b = tris.b.take(jnp.asarray([0]))
        c = tris.c.take(jnp.asarray([0]))
        n = geom.normal.take(jnp.asarray([0]))
        wa, wb, wc = barycentric(a, b, c, n, p)
        np.testing.assert_allclose(
            [float(wa[0]), float(wb[0]), float(wc[0])], [1 / 3] * 3, rtol=1e-4
        )


class TestAABB:
    def test_hit_and_miss(self):
        tris = make_tris([((-1, -1, -3), (1, -1, -3), (0, 1, -3))])
        box = build_aabb(tris)
        o = vec((0, 0, 0), (0, 5, 0))
        d = vec((0, 0, -1), (0, 0, -1))
        got = np.asarray(hit_aabb(o, d, box))
        np.testing.assert_array_equal(got, [True, False])

    def test_ray_from_inside(self):
        tris = make_tris([((-1, -1, -1), (1, -1, -1), (0, 1, 1))])
        box = build_aabb(tris)
        o = vec((0, 0, 0))
        d = vec((1, 0, 0))
        assert bool(np.asarray(hit_aabb(o, d, box))[0])
