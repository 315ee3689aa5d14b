"""Gradient tests (SURVEY.md §4): finite differences vs reverse-mode
autodiff for scene parameters, at fixed RNG streams. With the RNG fixed
the estimator is a deterministic function; discrete decisions (closest
primitive, roulette) do not flip under the tiny FD step on these
configurations, so pixel-gradient FD matches autodiff."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from raytpu.camera import make_camera
from raytpu.core.types import RenderConfig
from raytpu.integrator.render import render
from raytpu.scenes import cornell_box
from raytpu.sharding import make_mesh
from raytpu.train import (
    combine_scene,
    make_train_step,
    partition_scene,
    photometric_loss,
)


def _loss(scene, cam, cfg, pids, key):
    sums = render(scene, cam, cfg, pids, key)
    mean = sums.radiance * (1.0 / cfg.spp)
    # arbitrary fixed target so the loss is sensitive to everything
    return jnp.mean((mean.to_array() - 0.25) ** 2)


@pytest.fixture(scope="module")
def tiny():
    scene, cam, _ = cornell_box()
    cfg = RenderConfig(width=6, height=4, spp=2, max_bounces=3)
    pids = jnp.arange(cfg.n_pixels, dtype=jnp.int32)
    key = jax.random.PRNGKey(7)
    return scene, cam, cfg, pids, key


@pytest.mark.parametrize(
    "path",
    [
        ("spheres", "center", "x"),
        ("spheres", "radius"),
        ("spheres", "mat", "diffuse", "y"),
        ("spheres", "mat", "emission_strength"),
        ("spheres", "mat", "reflection"),
    ],
)
def test_fd_matches_autodiff(tiny, path):
    scene, cam, cfg, pids, key = tiny

    def get(s):
        o = s
        for p in path:
            o = getattr(o, p)
        return o

    def set_leaf(s, val):
        # rebuild the pytree with one leaf replaced
        leaves, treedef = jax.tree.flatten(s)
        target = get(s)
        new_leaves = [val if l is target else l for l in leaves]
        return jax.tree.unflatten(treedef, new_leaves)

    idx = 3  # a finite-size sphere (the orange light)
    base = get(scene)

    def f(theta):
        return _loss(set_leaf(scene, base.at[idx].set(theta)), cam, cfg, pids, key)

    theta0 = base[idx]
    g_auto = jax.grad(f)(theta0)

    h = 3e-3
    g_fd = (f(theta0 + h) - f(theta0 - h)) / (2 * h)
    assert np.isfinite(float(g_auto))
    np.testing.assert_allclose(
        float(g_auto), float(g_fd), rtol=0.08, atol=2e-4,
    )


def test_camera_pose_grad_finite(tiny):
    scene, cam, cfg, pids, key = tiny

    def f(ox):
        c = make_camera(
            origin=(ox, 0.3, 0.5), target=(0.0, -0.5, -3.0), up=(0.0, 1.0, 0.0),
            vfov_deg=70.0, aspect_ratio=1.5,
        )
        return _loss(scene, c, cfg, pids, key)

    g = jax.grad(f)(jnp.float32(0.34))
    h = 3e-3
    fd = (f(jnp.float32(0.34 + h)) - f(jnp.float32(0.34 - h))) / (2 * h)
    np.testing.assert_allclose(float(g), float(fd), rtol=0.08, atol=2e-4)


def test_train_step_reduces_loss(tiny):
    scene, cam, cfg, pids, key = tiny
    target = jnp.full((cfg.n_pixels, 3), 0.3, jnp.float32)
    init_fn, step_fn = make_train_step(cfg, optax.adam(5e-2), mesh=None)
    state, static = init_fn(scene, cam)
    _, loss0 = step_fn(state, static, cam, pids, target, key)
    for _ in range(5):
        state, loss = step_fn(state, static, cam, pids, target, key)
    assert float(loss) < float(loss0)


def test_train_step_sharded_matches_unsharded(tiny):
    scene, cam, cfg, pids, key = tiny
    cfg = cfg.replace(spp=4)
    target = jnp.full((cfg.n_pixels, 3), 0.3, jnp.float32)

    init_fn_u, step_fn_u = make_train_step(cfg, optax.adam(5e-2), mesh=None)
    state_u, static = init_fn_u(scene, cam)
    _, loss_u = step_fn_u(state_u, static, cam, pids, target, key)

    mesh = make_mesh(2, 4)
    init_fn_s, step_fn_s = make_train_step(cfg, optax.adam(5e-2), mesh=mesh)
    state_s, static_s = init_fn_s(scene, cam)
    _, loss_s = step_fn_s(state_s, static_s, cam, pids, target, key)

    np.testing.assert_allclose(float(loss_u), float(loss_s), rtol=1e-5)


def _textured_scene():
    """Textured pyramide scene in bilinear mode: radiance depends
    CONTINUOUSLY on geometry/camera (with nearest-texel filtering —
    reference semantics — radiance is piecewise-constant in every
    geometric parameter and those gradients are correctly zero a.e.)."""
    import os

    from raytpu.config import load_scene_file

    root = os.path.join(os.path.dirname(__file__), "..")
    scene, cam, _ = load_scene_file(os.path.join(root, "scenes/pyramide.toml"))
    cfg = RenderConfig(
        width=8, height=6, spp=2, max_bounces=3, bilinear_textures=True
    )
    return scene, cam, cfg


def test_train_camera_pose():
    """train_camera=True optimizes the camera pytree jointly with the
    scene (the north star's 'camera pose' differentiability) — on a
    bilinear-textured scene where camera gradients are nonzero."""
    scene, cam, cfg = _textured_scene()
    pids = jnp.arange(cfg.n_pixels, dtype=jnp.int32)
    key = jax.random.PRNGKey(7)
    target = jnp.full((cfg.n_pixels, 3), 0.3, jnp.float32)
    init_fn, step_fn = make_train_step(
        cfg, optax.adam(1e-2), mesh=None, train_camera=True
    )
    state, static = init_fn(scene, cam)
    assert state.cam_params is not None
    _, loss0 = step_fn(state, static, cam, pids, target, key)
    for _ in range(5):
        state, loss = step_fn(state, static, cam, pids, target, key)
    assert float(loss) < float(loss0)
    moved = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.cam_params, cam
    )
    assert max(jax.tree.leaves(moved)) > 0


def test_vertex_gradient_nonzero_with_bilinear():
    """Triangle-vertex gradients flow through the hit-point ->
    barycentric -> UV -> bilinear-texel chain: finite and nonzero for
    the full render (an FD check on the full estimator is dominated by
    visibility/roulette discontinuities — the smooth chain is
    FD-verified at unit level below)."""
    scene, cam, cfg = _textured_scene()
    pids = jnp.arange(cfg.n_pixels, dtype=jnp.int32)
    key = jax.random.PRNGKey(9)

    def f(ax):
        tris = scene.triangles
        s = scene.replace(triangles=tris.replace(a=tris.a._replace(x=ax)))
        return _loss(s, cam, cfg, pids, key)

    g = np.asarray(jax.grad(f)(scene.triangles.a.x))
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0


def test_bilinear_texture_chain_fd():
    """FD vs autodiff through the smooth chain alone: hit point ->
    barycentric -> UV wrap -> bilinear texel -> color, w.r.t. a vertex
    coordinate, at a fixed interior hit point (no visibility events)."""
    from raytpu.config import load_scene_file
    from raytpu.core.vec3 import Vec3
    from raytpu.materials.texture import triangle_material
    import os

    root = os.path.join(os.path.dirname(__file__), "..")
    scene, _, _ = load_scene_file(os.path.join(root, "scenes/pyramide.toml"))
    t = scene.triangles
    i = 2
    pick = lambda v: Vec3(v.x[i : i + 1], v.y[i : i + 1], v.z[i : i + 1])
    a, b, c = pick(t.a), pick(t.b), pick(t.c)
    normal = (b - a).cross(c - a).normalize()
    # interior point: barycentric mix
    p = a * 0.3 + b * 0.45 + c * 0.25

    def f(ax):
        a2 = Vec3(ax, a.y, a.z)
        m = triangle_material(
            a2, b, c,
            (t.ua[i : i + 1], t.va[i : i + 1]),
            (t.ub[i : i + 1], t.vb[i : i + 1]),
            (t.uc[i : i + 1], t.vc[i : i + 1]),
            normal, p, t.mat_id[i : i + 1],
            scene.atlas, scene.mat_table, bilinear=True,
        )
        return jnp.sum(m.diffuse.to_array() * jnp.asarray([0.3, 1.1, -0.7]))

    x0 = a.x
    g = float(jax.grad(f)(x0)[0])
    h = 1e-3
    fd = float((f(x0 + h) - f(x0 - h)) / (2 * h))
    assert abs(g) > 1e-6
    np.testing.assert_allclose(g, fd, rtol=0.05, atol=1e-5)


def test_partition_roundtrip(tiny):
    scene, *_ = tiny
    params, static = partition_scene(scene)
    back = combine_scene(params, static)
    la, lb = jax.tree.leaves(scene), jax.tree.leaves(back)
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
