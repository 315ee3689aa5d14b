"""Differentiable-rendering train step.

One step = sharded forward render (pixels over 'tiles', samples over
'samples' with a psum, raytpu.sharding.mesh) -> photometric loss vs a
target image -> reverse-mode gradients w.r.t. every floating-point scene
leaf (+ optionally the camera) -> optax update. Because the loss is a
mean over *globally sharded* pixels, XLA inserts the cross-device
reductions for both the loss and the parameter gradients; nothing is
hand-scheduled (SURVEY.md §5.8).

Gradients of a Monte-Carlo estimator are well-defined here because the
RNG streams are fixed by (pixel, sample) keys: the estimator is a
deterministic differentiable function of the scene parameters
(SURVEY.md §7 "Gradient correctness").

GRADIENT STRUCTURE (important): with the reference's nearest-texel
filtering and flat materials, pixel radiance is PIECEWISE-CONSTANT in
every purely geometric parameter (sphere centers/radii, triangle
vertices, camera pose) — the only dependence runs through discrete
events (which primitive is hit, which texel is fetched, roulette
branches), so those gradients are correctly ZERO almost everywhere,
and finite differences at fixed RNG agree. Parameters that multiply
radiance directly (diffuse/emission colors, emission strength, texture
values) have ordinary nonzero gradients. To optimize GEOMETRY or the
camera, enable ``cfg.bilinear_textures`` on a textured scene: bilinear
color filtering makes UV -> color continuous and the hit-point ->
barycentric -> UV chain carries real gradients
(tests/test_grad.py::test_bilinear_texture_chain_fd). Visibility
(silhouette) discontinuities remain unhandled, as the north star
accepts; reparameterized/edge sampling would be the next step.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax import Array
from jax.sharding import Mesh

from raytpu.camera import Camera
from raytpu.core.types import RenderConfig, Scene
from raytpu.integrator.render import render
from raytpu.sharding.mesh import render_sharded


def _is_diff(leaf) -> bool:
    return jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating)


def partition_scene(scene: Scene):
    """Split a Scene pytree into (params, static): params holds every
    floating leaf (differentiable), static holds int/bool leaves (mat ids,
    flags). Recombine with :func:`combine_scene`."""
    leaves, treedef = jax.tree.flatten(scene)
    params = [l if _is_diff(l) else None for l in leaves]
    static = [None if _is_diff(l) else l for l in leaves]
    return jax.tree.unflatten(treedef, params), jax.tree.unflatten(treedef, static)


def combine_scene(params, static) -> Scene:
    scene = jax.tree.map(
        lambda p, s: p if s is None else s,
        params,
        static,
        is_leaf=lambda x: x is None,
    )
    # sky.rgb is a trainable leaf, but its u8-packed fast-fetch twin
    # (SkyTexture.packed, a uint32 STATIC leaf) is built once at load —
    # after an optimizer step the two diverge and the packed fetch would
    # silently render the pre-training sky. Recombined scenes therefore
    # drop the packed twin; the f32 gather path produces the same values
    # (packed is a bit-exact cache, never the source of truth).
    if (
        getattr(scene, "sky", None) is not None
        and scene.sky.packed is not None
    ):
        scene = scene.replace(sky=scene.sky.replace(packed=None))
    return scene


def photometric_loss(mean_rad, target: Array) -> Array:
    """L2 in linear radiance between the rendered mean and a target
    (B, 3)-shaped image batch."""
    diff = mean_rad.to_array() - target
    return jnp.mean(diff * diff)


class TrainState(NamedTuple):
    params: Any        # Scene-shaped pytree of float leaves (None elsewhere)
    cam_params: Any    # Camera pytree (or None if camera is frozen)
    opt_state: Any


def make_train_step(
    cfg: RenderConfig,
    optimizer: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    train_camera: bool = False,
):
    """Build (init_fn, step_fn).

    step_fn(state, static, cam, pixel_ids, target, key) -> (state, loss).
    ``pixel_ids``/``target`` are global arrays; with a mesh they are
    sharded over 'tiles' and the spp budget over 'samples' by
    render_sharded. cfg is closed over (static shapes).
    """

    def loss_fn(params, cam_params, static, cam_frozen, pixel_ids, target, key):
        scene = combine_scene(params, static)
        cam = cam_params if train_camera else cam_frozen
        if mesh is None:
            sums = render(scene, cam, cfg, pixel_ids, key)
        else:
            sums = render_sharded(scene, cam, cfg, pixel_ids, key, mesh)
        mean_rad = sums.radiance * (1.0 / cfg.spp)
        return photometric_loss(mean_rad, target)

    def init_fn(scene: Scene, cam: Camera) -> tuple[TrainState, Any]:
        params, static = partition_scene(scene)
        cam_params = cam if train_camera else None
        opt_state = optimizer.init(
            (params, cam_params) if train_camera else params
        )
        return TrainState(params, cam_params, opt_state), static

    @jax.jit
    def step_fn(state: TrainState, static, cam: Camera, pixel_ids, target, key):
        if train_camera:
            loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(
                state.params, state.cam_params, static, cam, pixel_ids, target, key
            )
            updates, opt_state = optimizer.update(
                grads, state.opt_state, (state.params, state.cam_params)
            )
            new_params, new_cam = optax.apply_updates(
                (state.params, state.cam_params), updates
            )
            return TrainState(new_params, new_cam, opt_state), loss
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, state.cam_params, static, cam, pixel_ids, target, key
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(new_params, None, opt_state), loss

    return init_fn, step_fn
