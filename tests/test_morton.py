"""Morton triangle reordering: spatial-locality property + render
invariance (the reorder must not change images beyond tie-breaks that
do not occur in practice)."""

import jax
import jax.numpy as jnp
import numpy as np

from raytpu.config import load_scene
from raytpu.core.types import RenderConfig
from raytpu.geometry.morton import morton_codes, morton_order
from raytpu.integrator.render import render


def _chunk_volume(tris, chunk=128):
    """Total volume of per-chunk AABBs (the cull's figure of merit)."""
    pts = np.stack([
        np.stack([np.asarray(c) for c in v], axis=1)
        for v in (tris.a, tris.b, tris.c)
    ], axis=1)  # (T, 3verts, 3xyz)
    n = pts.shape[0]
    vol = 0.0
    for s in range(0, n, chunk):
        p = pts[s : s + chunk].reshape(-1, 3)
        ext = p.max(0) - p.min(0)
        vol += float(np.prod(np.maximum(ext, 1e-9)))
    return vol


def test_morton_codes_order_neighbors():
    # points along a line get monotonically increasing codes
    x = np.linspace(0.0, 1.0, 32).astype(np.float32)
    codes = morton_codes(x, np.zeros_like(x), np.zeros_like(x))
    assert (np.diff(codes.astype(np.int64)) >= 0).all()


def test_morton_shrinks_chunk_boxes_on_mcworld():
    scene, _, _ = load_scene("scenes/mcworld_water.toml")
    # load_scene already morton-orders; reconstruct the unordered mesh
    import raytpu.config as config_mod

    from raytpu.io.mesh_formats import parse_mesh
    from raytpu.io.obj import mesh_to_triangles

    raw = mesh_to_triangles(parse_mesh(
        "/root/reference/model3D/mcworld_tiltedtex_water/mineways_tri.obj"
    ))
    ordered = morton_order(raw)
    assert ordered.count == raw.count
    # same triangle multiset
    key = lambda t: np.sort(np.asarray(t.a.x))
    np.testing.assert_allclose(key(ordered), key(raw))
    assert _chunk_volume(ordered) < _chunk_volume(raw)


def test_morton_render_invariance():
    """Rendering the reordered scene gives the same image (order only
    affects exact-tie resolution, which real scenes never hit)."""
    scene, cam, _ = load_scene("scenes/pyramide.toml")
    cfg = RenderConfig(width=12, height=8, spp=3, max_bounces=4)
    pids = jnp.arange(cfg.n_pixels, dtype=jnp.int32)
    key = jax.random.PRNGKey(9)
    a = render(scene, cam, cfg, pids, key)
    shuffled = scene.replace(
        triangles=morton_order(scene.triangles)  # idempotent-ish reorder
    )
    b = render(shuffled, cam, cfg, pids, key)
    np.testing.assert_array_equal(
        np.asarray(a.radiance.to_array()), np.asarray(b.radiance.to_array())
    )
