"""Mesh construction and the sharded render step.

See package docstring for the design. The key invariant: RNG streams are
keyed by (pixel_id, global_sample_index), so any (tiles, samples) mesh
factorization computes exactly the same per-sample terms as a single
device — the multi-device render is a pure reshuffling of those terms
plus one ``psum`` (so sums agree up to f32 summation order).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from raytpu.camera import Camera
from raytpu.core.types import RenderConfig, Scene
from raytpu.integrator.render import RenderOutput, RenderSums, assemble_image, render

TILE_AXIS = "tiles"
SAMPLE_AXIS = "samples"


def make_mesh(
    n_tiles: Optional[int] = None,
    n_samples: Optional[int] = None,
    devices=None,
) -> Mesh:
    """Build a ('tiles', 'samples') mesh over ``devices``.

    With neither factor given, all devices go on the sample axis (the
    reduction is one psum of a few MB per image — negligible vs render
    time, and it keeps every device's pixel tile identical in cost).
    """
    devices = np.asarray(jax.devices() if devices is None else devices)
    n = devices.size
    if n_tiles is None and n_samples is None:
        n_tiles, n_samples = 1, n
    elif n_tiles is None:
        n_tiles = n // n_samples
    elif n_samples is None:
        n_samples = n // n_tiles
    if n_tiles * n_samples != n:
        raise ValueError(
            f"mesh {n_tiles}x{n_samples} != {n} devices"
        )
    return Mesh(devices.reshape(n_tiles, n_samples), (TILE_AXIS, SAMPLE_AXIS))


def render_sharded(
    scene: Scene,
    cam: Camera,
    cfg: RenderConfig,
    pixel_ids: Array,
    key: Array,
    mesh: Mesh,
) -> RenderSums:
    """One sharded render step: pixels split over 'tiles', the spp sample
    budget split over 'samples' with disjoint global sample indices, then
    ``psum`` of the sums over the sample axis.

    Returns per-pixel *sums* over all cfg.spp samples (identical to the
    unsharded :func:`raytpu.integrator.render.render`), with the leading
    pixel axis sharded over 'tiles'.
    """
    nt = mesh.shape[TILE_AXIS]
    ns = mesh.shape[SAMPLE_AXIS]
    b = pixel_ids.shape[0]
    if b % nt != 0:
        raise ValueError(f"pixel batch {b} not divisible by tiles={nt}")
    if cfg.spp % ns != 0:
        raise ValueError(f"spp={cfg.spp} not divisible by samples={ns}")
    spp_local = cfg.spp // ns

    def step(scene, cam, pids, key):
        s_idx = jax.lax.axis_index(SAMPLE_AXIS)
        sums = render(
            scene, cam, cfg, pids, key,
            sample_offset=s_idx * spp_local,
            n_samples=spp_local,
        )
        return jax.tree.map(
            lambda x: jax.lax.psum(x, SAMPLE_AXIS), sums
        )

    sharded = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), P(), P(TILE_AXIS), P()),
        # per-pixel sums shard over tiles; the scalar sample counter is
        # replicated (every tile accumulated the same spp)
        out_specs=RenderSums(P(TILE_AXIS), P(TILE_AXIS), P(TILE_AXIS), P()),
        check_vma=False,
    )
    return sharded(scene, cam, pixel_ids, key)


@functools.partial(jax.jit, static_argnums=(2,), static_argnames=("mesh",))
def _render_sharded_jit(scene, cam, cfg, pixel_ids, key, *, mesh):
    return render_sharded(scene, cam, cfg, pixel_ids, key, mesh)


def render_image_sharded(
    scene: Scene,
    cam: Camera,
    cfg: RenderConfig,
    key: Array,
    mesh: Optional[Mesh] = None,
) -> RenderOutput:
    """Full-frame multi-device render (the sharded twin of
    :func:`raytpu.integrator.render.render_image`)."""
    mesh = mesh if mesh is not None else make_mesh()
    nt = mesh.shape[TILE_AXIS]
    n_pix = cfg.n_pixels
    # pad the pixel range to a multiple of (tile size * n_tiles)
    tile = min(cfg.pixel_tile, -(-n_pix // nt))
    chunk = tile * nt
    n_chunks = -(-n_pix // chunk)
    padded = n_chunks * chunk

    ids = np.minimum(np.arange(padded, dtype=np.int32), n_pix - 1)
    rad = np.zeros((padded, 3), np.float32)
    alb = np.zeros((padded, 3), np.float32)
    nrm = np.zeros((padded, 3), np.float32)

    for c in range(n_chunks):
        sl = slice(c * chunk, (c + 1) * chunk)
        sums = _render_sharded_jit(
            scene, cam, cfg, jnp.asarray(ids[sl]), key, mesh=mesh
        )
        rad[sl] = np.asarray(sums.radiance.to_array())
        alb[sl] = np.asarray(sums.albedo.to_array())
        nrm[sl] = np.asarray(sums.normal.to_array())

    return assemble_image(cfg, rad[:n_pix], alb[:n_pix], nrm[:n_pix])
