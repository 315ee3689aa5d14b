"""Quad merging (geometry/quads.py + the kernel rectangle path in
kernels/trace_scene.py): detection invariants on the shipped scenes,
closure/winding rejection, and — in the kernel tier — merged-path
radiance allclose + winner-index agreement against the scan integrator
(/root/reference/triangle.hu:42-59 is the culling win this chases on
block-world meshes like model3D/RTX_MAP/mcworld)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytpu.config import load_scene
from raytpu.geometry.quads import detect_quad_pairs, leftover_indices


def _detect(tris):
    return detect_quad_pairs(
        tris.a.x, tris.a.y, tris.a.z,
        tris.b.x, tris.b.y, tris.b.z,
        tris.c.x, tris.c.y, tris.c.z,
    )


# (scene, tris, pairs, leftover) — measured; block exports pair nearly
# everything, the organic tree mesh pairs NOTHING (the detector demands
# exact f64 parallelogram closure, so meshes whose exporter rounds
# differently safely fall back to the per-triangle loop)
SHIPPED = [
    ("pyramide", 6, 1, 4),
    ("pyramide_eau", 34, 9, 16),
    ("grass_block", 12, 6, 0),
    ("mcworld_water", 606, 266, 74),
    ("caverne", 762, 380, 2),
    ("tree", 1320, 0, 1320),
]


@pytest.mark.parametrize("name,n_tris,n_pairs,n_left", SHIPPED)
def test_pair_counts_on_shipped_scenes(name, n_tris, n_pairs, n_left):
    scene, _, cfg = load_scene(f"scenes/{name}.toml")
    assert scene.triangles.count == n_tris
    assert len(cfg.quad_pairs) == n_pairs
    assert len(leftover_indices(n_tris, cfg.quad_pairs)) == n_left
    # invariants: disjoint, in-range, i < j is not guaranteed but both
    # halves must be distinct triangles and each used at most once
    used = set()
    for i, j, oi in cfg.quad_pairs:
        assert 0 <= i < n_tris and 0 <= j < n_tris and i != j
        assert 0 <= oi < 3
        assert i not in used and j not in used
        used |= {i, j}


def _tris_from(verts):
    """verts: (T, 3, 3) numpy."""
    from raytpu.core.types import Triangles
    from raytpu.core.vec3 import Vec3

    t = np.float32(verts)
    z = jnp.zeros(t.shape[0], jnp.float32)
    v3 = lambda a: Vec3(jnp.asarray(a[:, 0]), jnp.asarray(a[:, 1]),
                        jnp.asarray(a[:, 2]))
    return Triangles(
        a=v3(t[:, 0]), b=v3(t[:, 1]), c=v3(t[:, 2]),
        ua=z, va=z, ub=z, vb=z, uc=z, vc=z,
        mat_id=jnp.zeros(t.shape[0], jnp.int32),
    )


def test_detects_exact_parallelogram():
    # unit square split along the diagonal (0,0)-(1,1), consistent winding
    tris = _tris_from([
        [(0, 0, 0), (1, 0, 0), (1, 1, 0)],
        [(0, 0, 0), (1, 1, 0), (0, 1, 0)],
    ])
    pairs = _detect(tris)
    assert len(pairs) == 1
    i, j, oi = pairs[0]
    assert {i, j} == {0, 1}


def test_rejects_broken_closure():
    # same shared diagonal but the second apex misses the parallelogram
    # point (0,1,0) — opp_i + opp_j != s1 + s2
    tris = _tris_from([
        [(0, 0, 0), (1, 0, 0), (1, 1, 0)],
        [(0, 0, 0), (1, 1, 0), (0.25, 1, 0)],
    ])
    assert _detect(tris) == ()


def test_rejects_opposite_winding():
    # exact closure but the halves face opposite ways: the reference
    # backface-culls (det >= 1e-6, mesh.h:88), so a single-sided
    # rectangle would wrongly resurrect the flipped half
    tris = _tris_from([
        [(0, 0, 0), (1, 0, 0), (1, 1, 0)],
        [(0, 0, 0), (0, 1, 0), (1, 1, 0)],   # reversed order -> n flipped
    ])
    assert _detect(tris) == ()


def test_rejects_non_coplanar_shared_edge():
    # shared edge, closure violated out of plane (roof shape)
    tris = _tris_from([
        [(0, 0, 0), (1, 0, 0), (1, 1, 0)],
        [(0, 0, 0), (1, 1, 0), (0, 1, 0.5)],
    ])
    assert _detect(tris) == ()


def _trace_pair(name, key=53, w=10, h=6, bounces=4):
    """(scan outputs, quad-kernel outputs, quad idx, plain idx)."""
    from raytpu.core import rng
    from raytpu.integrator.path import n_bounce_draws, trace
    from raytpu.integrator.render import sample_rays
    from raytpu.kernels.trace_scene import _mkm_forward

    scene, cam, cfg = load_scene(f"scenes/{name}.toml")
    cfg = cfg.replace(width=w, height=h, spp=1, max_bounces=bounces)
    assert len(cfg.quad_pairs) > 0
    pids = jnp.arange(cfg.n_pixels, dtype=jnp.int32)
    pix_keys = rng.pixel_keys(jax.random.PRNGKey(key), pids)
    ray_keys = rng.sample_keys(pix_keys, jnp.int32(0))
    cam_draws, bounce_draws = rng.ray_uniforms(
        ray_keys, 4, n_bounce_draws(cfg), cfg.max_bounces
    )
    origin, direction = sample_rays(cam, cfg, pids, cam_draws)
    a = trace(scene, cfg, origin, direction, bounce_draws)
    b, idx_q, _ = _mkm_forward(
        scene, cfg, origin, direction, bounce_draws,
        interpret=True, with_indices=True,
    )
    _, idx_p, _ = _mkm_forward(
        scene, cfg.replace(merge_quads=False), origin, direction,
        bounce_draws, interpret=True, with_indices=True,
    )
    return a, b, idx_q, idx_p


@pytest.mark.kernel
@pytest.mark.parametrize("name", ["pyramide_eau", "mcworld_water"])
def test_merged_matches_scan(name):
    """Merged-path radiance/AOVs vs the scan integrator: the rectangle
    test rounds differently in the last ulp (fraction ranking, module
    docstring), so the bar is allclose with the same knife-edge outlier
    budget as the other kernel-vs-scan tests."""
    a, b, idx_q, idx_p = _trace_pair(name)
    for want, got, nm in zip(a, b, ("radiance", "albedo", "normal")):
        x = np.stack(list(want), -1)
        y = np.stack(list(got), -1)
        bad = (np.abs(x - y) > 1e-4 + 1e-5 * np.abs(x)).any(axis=-1)
        assert bad.mean() <= 0.02, f"{nm}: {bad.mean():.2%} differ"
    # winner agreement: the recorded per-bounce winner index (the value
    # the backward replay consumes) vs the per-triangle loop's. Bounce 0
    # sees identical input rays, so any disagreement there is a genuine
    # knife-edge flip (diagonal crack / last-ulp t-tie) and must be
    # rare; later bounces cascade (one flipped ray diverges for all its
    # remaining bounces), so the all-bounce bar is looser
    q, p = np.asarray(idx_q), np.asarray(idx_p)
    agree0 = (q[0] == p[0]).mean()
    agree = (q == p).mean()
    assert agree0 >= 0.99, f"bounce-0 winner agreement {agree0:.2%}"
    assert agree >= 0.95, f"winner agreement {agree:.2%}"


@pytest.mark.kernel
def test_zero_pairs_mesh_identical():
    """tree.toml detects no pairs, so merge on/off must take the SAME
    per-triangle code path — outputs bit-identical by construction."""
    from raytpu.core import rng
    from raytpu.integrator.path import n_bounce_draws
    from raytpu.integrator.render import sample_rays
    from raytpu.kernels.trace_scene import _mkm_forward

    scene, cam, cfg = load_scene("scenes/tree.toml")
    assert cfg.quad_pairs == ()
    cfg = cfg.replace(width=8, height=5, spp=1, max_bounces=3)
    pids = jnp.arange(cfg.n_pixels, dtype=jnp.int32)
    pix_keys = rng.pixel_keys(jax.random.PRNGKey(7), pids)
    ray_keys = rng.sample_keys(pix_keys, jnp.int32(0))
    cam_draws, bounce_draws = rng.ray_uniforms(
        ray_keys, 4, n_bounce_draws(cfg), cfg.max_bounces
    )
    origin, direction = sample_rays(cam, cfg, pids, cam_draws)
    on, _, _ = _mkm_forward(
        scene, cfg, origin, direction, bounce_draws,
        interpret=True, with_indices=False,
    )
    off, _, _ = _mkm_forward(
        scene, cfg.replace(merge_quads=False), origin, direction,
        bounce_draws, interpret=True, with_indices=False,
    )
    for a, b in zip(on, off):
        for ca, cb in zip(a, b):
            np.testing.assert_array_equal(np.asarray(ca), np.asarray(cb))


@pytest.mark.kernel
def test_miss_with_nonunit_direction_no_phantom_hit():
    """Regression (round-4 review): the axis-aligned group merge must
    gate the BIG miss sentinel out of the fraction compare — with
    |d_k| > 1 (bounce directions exceed unit norm whenever
    reflection > 1; callers may also pass unnormalized directions) a
    miss-vs-miss compare otherwise 'wins' with index -1 and fabricates
    a hit on sphere n_spheres-1."""
    from raytpu.integrator.path import n_bounce_draws, trace
    from raytpu.kernels.trace_scene import trace_mesh_megakernel

    scene, cam, cfg = load_scene("scenes/grass_block.toml")
    cfg = cfg.replace(spp=1, max_bounces=2)
    b = 128
    # rays far outside all geometry, pointing away, |direction| = 2
    from raytpu.core.vec3 import Vec3

    origin = Vec3(
        jnp.full((b,), 500.0), jnp.full((b,), 500.0), jnp.full((b,), 500.0)
    )
    direction = Vec3(
        jnp.full((b,), 2.0), jnp.zeros((b,)), jnp.zeros((b,))
    )
    draws = jnp.full((cfg.max_bounces, n_bounce_draws(cfg), b), 0.5)
    a = trace(scene, cfg, origin, direction, draws)
    k = trace_mesh_megakernel(scene, cfg, origin, direction, draws,
                              interpret=True)
    for want, got in zip(a, k):
        for cw, cg in zip(want, got):
            np.testing.assert_array_equal(np.asarray(cw), np.asarray(cg))
