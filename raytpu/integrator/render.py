"""Render orchestration: ray generation, sample accumulation, tiling.

Replaces the reference's pthread row-slab loop (fill_canva,
/root/reference/main.c:245-284) and per-pixel sample loop (main.c:264-273)
with a jitted wavefront: a tile of pixels is traced together, samples
accumulate through a ``lax.scan``, and tiles stream through one compiled
program. Pixel coordinates follow the reference exactly:
u = (i + U(-.5,.5))/(W-1), v = (j + U(-.5,.5))/(H-1) with j counted from
the bottom row (main.c:265-266); the aperture jitter is
U(-.5,.5) * ouverture (main.c:268-269).

Outputs stay in linear float; sqrt-gamma + quantization happen once at
image assembly (write_color_canva semantics, rtutility.h:56-71 — but
unlike the reference we do NOT quantize before denoising; see SURVEY.md
§7 fidelity notes).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from raytpu.camera import Camera, get_rays
from raytpu.core import rng
from raytpu.core.color import quantize, tonemap
from raytpu.core.types import RenderConfig, Scene
from raytpu.core.vec3 import Vec3
from raytpu.integrator.path import trace


class RenderSums(NamedTuple):
    """Per-pixel accumulators (sample sums, not means) — the checkpointable
    render state (SURVEY.md §5.4)."""

    radiance: Vec3
    albedo: Vec3
    normal: Vec3
    samples: Array  # scalar int32: samples accumulated so far


def sample_rays(
    cam: Camera,
    cfg: RenderConfig,
    pixel_ids: Array,
    draws: Array,
):
    """Generate one camera ray per pixel id for one sample index.
    draws: (4, B) U(0,1) camera draws from rng.ray_uniforms."""
    i = (pixel_ids % cfg.width).astype(jnp.float32)
    j = (pixel_ids // cfg.width).astype(jnp.float32)
    u = (i + (draws[0] - 0.5)) / (cfg.width - 1)
    v = (j + (draws[1] - 0.5)) / (cfg.height - 1)
    dx = (draws[2] - 0.5) * cfg.aperture_x
    dy = (draws[3] - 0.5) * cfg.aperture_y
    return get_rays(cam, u, v, cfg.focus_distance, dx, dy)


_logged_fallbacks: set = set()


def _log_fallback(reasons: str) -> None:
    """One stderr line when a production-sized render that asked for the
    megakernel is served by the scan path (VERDICT r2 weak #7: the silent
    ~6x drop). Deduplicated per reason string for the process."""
    if reasons in _logged_fallbacks:
        return
    _logged_fallbacks.add(reasons)
    import sys

    print(
        f"raytpu: megakernel unavailable ({reasons}); "
        "scan path serves this render",
        file=sys.stderr,
    )


def render(
    scene: Scene,
    cam: Camera,
    cfg: RenderConfig,
    pixel_ids: Array,
    key: Array,
    sample_offset: int = 0,
    n_samples: Optional[int] = None,
    init: Optional[RenderSums] = None,
) -> RenderSums:
    """Accumulate ``n_samples`` samples for a batch of pixels.

    Jittable and differentiable. ``sample_offset`` selects the global
    sample indices [offset, offset + n) so sample-axis sharding and
    checkpoint/resume consume exactly the same RNG streams as a
    single-device run.
    """
    n = cfg.spp if n_samples is None else n_samples
    b = pixel_ids.shape[0]
    pix_keys = rng.pixel_keys(key, pixel_ids)

    if init is None:
        init = RenderSums(
            Vec3.zeros((b,)), Vec3.zeros((b,)), Vec3.zeros((b,)),
            jnp.zeros((), jnp.int32),
        )

    from raytpu.integrator.path import n_bounce_draws

    # One sample's full trace is rematerialized in the backward pass
    # (jax.checkpoint): without it, reverse-mode through the
    # (samples x bounces) scan-of-scan keeps every bounce's intermediates
    # for every sample alive at once — ~tens of GB at production sizes
    # (it crashes the TPU compiler outright at 1200x900). With remat the
    # residual footprint is one sample's carry, and each sample's bounce
    # scan is recomputed during its backward step (HBM-for-FLOPs trade,
    # SURVEY.md 'jax.checkpoint / rematerialisation').
    kernel_fn = None
    if cfg.use_megakernel:
        from raytpu.kernels import trace_scene, trace_spheres

        if trace_spheres.supported(scene, cfg):
            kernel_fn = trace_spheres.trace_megakernel
        elif trace_scene.supported(scene, cfg):
            kernel_fn = trace_scene.trace_mesh_megakernel
        elif b * n >= 64 * 1024:
            # a production-sized render silently dropping to the scan
            # path costs up to ~6x throughput — say why, once per gate
            # combination (this runs at Python/trace time, not per step)
            mod = trace_scene if scene.triangles.count > 0 else trace_spheres
            _log_fallback(", ".join(mod.unsupported_reasons(scene, cfg)))

    # NOTE: pix_keys / pixel_ids are explicit arguments (not closure
    # captures): a custom_vjp function must not close over traced values
    # — under an enclosing jit they become tracers and break residual
    # packing ("No constant handler for DynamicJaxprTracer").
    def scan_sample(scene, cam, pix_keys, pixel_ids, s):
        ray_keys = rng.sample_keys(pix_keys, s)
        cam_draws, bounce_draws = rng.ray_uniforms(
            ray_keys, 4, n_bounce_draws(cfg), cfg.max_bounces
        )
        origin, direction = sample_rays(cam, cfg, pixel_ids, cam_draws)
        return trace(scene, cfg, origin, direction, bounce_draws)

    if kernel_fn is not None:
        # both megakernels define their own backward (the sphere
        # kernel's hand-structured backward Pallas kernel, the mesh
        # kernel's index-replay VJP): grad flows straight through.
        # jax.checkpoint keeps the per-sample residuals down to
        # (scene, cam, keys) — the kernel's inputs (rays, draws) are
        # recomputed from the RNG during backward instead of being
        # stored for every sample at once.
        def mk_direct(scene, cam, pix_keys, pixel_ids, s):
            ray_keys = rng.sample_keys(pix_keys, s)
            cam_draws, bounce_draws = rng.ray_uniforms(
                ray_keys, 4, n_bounce_draws(cfg), cfg.max_bounces
            )
            origin, direction = sample_rays(cam, cfg, pixel_ids, cam_draws)
            return kernel_fn(
                scene, cfg, origin, direction, bounce_draws,
                interpret=cfg.pallas_interpret,
            )

        traced_sample = jax.checkpoint(mk_direct)
    else:
        traced_sample = jax.checkpoint(scan_sample)

    def sample_step(sums: RenderSums, s: Array):
        rad, alb, nrm = traced_sample(scene, cam, pix_keys, pixel_ids, s)
        return (
            RenderSums(
                sums.radiance + rad,
                sums.albedo + alb,
                sums.normal + nrm,
                sums.samples + 1,
            ),
            None,
        )

    # offset added after arange so sample_offset may be a traced value
    # (the sharded path derives it from lax.axis_index)
    sample_idx = jnp.arange(n, dtype=jnp.int32) + jnp.asarray(
        sample_offset, jnp.int32
    )
    sums, _ = jax.lax.scan(sample_step, init, sample_idx)
    return sums


@functools.partial(jax.jit, static_argnums=(2,))
def _render_tile(scene, cam, cfg, pixel_ids, key):
    return render(scene, cam, cfg, pixel_ids, key)


def blocked_pixel_order(cfg: RenderConfig, block_w: int = 128,
                        block_h: int = 64) -> np.ndarray:
    """Pixel ids in screen-block-major order (128x64 blocks, row-major
    inside each block).

    The megakernels trace tiles of consecutive ids; with row-major
    arange ids a 8192-ray tile is a 7-row strip of a 1200-wide frame,
    and its rays diverge so much that the chunk culls almost never skip
    (measured: NO_CULL == culled throughput on mcworld). A 128x64 block
    is one full ROWS_BIG tile (or two stacked ROWS_WIDE_ATLAS tiles) of
    a compact screen rectangle — a coherent ray cone, so per-tile
    early-outs and cull pruning actually fire (+4% on mcworld, neutral
    on sphere scenes). RNG keys hang off the pixel ID, so any order
    produces bit-identical per-pixel values.
    """
    w, h = cfg.width, cfg.height
    ids = np.arange(w * h, dtype=np.int32).reshape(h, w)
    out = [
        ids[y0 : y0 + block_h, x0 : x0 + block_w].ravel()
        for y0 in range(0, h, block_h)
        for x0 in range(0, w, block_w)
    ]
    return np.concatenate(out)


class RenderOutput(NamedTuple):
    image: np.ndarray      # (H, W, 3) linear float mean radiance, row 0 = top
    canvas: np.ndarray     # (H, W, 3) quantized 0..255 ints (reference canva)
    albedo: np.ndarray     # (H, W, 3) AOV mean
    normal: np.ndarray     # (H, W, 3) AOV mean


def render_image(
    scene: Scene,
    cam: Camera,
    cfg: RenderConfig,
    key: Array,
) -> RenderOutput:
    """Full-frame render: tiles of ``cfg.pixel_tile`` pixels stream through
    one jitted program (same compiled code for every tile)."""
    n_pix = cfg.n_pixels
    tile = min(cfg.pixel_tile, n_pix)
    n_tiles = (n_pix + tile - 1) // tile
    padded = n_tiles * tile

    rad = np.zeros((n_pix, 3), np.float32)
    alb = np.zeros((n_pix, 3), np.float32)
    nrm = np.zeros((n_pix, 3), np.float32)

    # block-major pixel order (blocked_pixel_order): coherent ray cones
    # per kernel tile; results scatter back by pixel id. Padding repeats
    # the last id — its duplicate entries compute identical sums, so the
    # scatter is id-idempotent.
    order = blocked_pixel_order(cfg)
    all_ids = np.pad(order, (0, padded - n_pix), mode="edge")

    for t in range(n_tiles):
        ids_np = all_ids[t * tile : (t + 1) * tile]
        sums = _render_tile(scene, cam, cfg, jnp.asarray(ids_np), key)
        rad[ids_np] = np.asarray(sums.radiance.to_array())
        alb[ids_np] = np.asarray(sums.albedo.to_array())
        nrm[ids_np] = np.asarray(sums.normal.to_array())

    return assemble_image(cfg, rad, alb, nrm)


def assemble_image(
    cfg: RenderConfig, rad_sums: np.ndarray, alb_sums: np.ndarray,
    nrm_sums: np.ndarray, spp: Optional[int] = None,
) -> RenderOutput:
    """Means + tonemap + quantize; flips rows so row 0 is the top (the
    reference writes bottom-up storage top-down, main.c:460-465)."""
    spp = spp if spp is not None else cfg.spp
    h, w = cfg.height, cfg.width

    mean_rad = rad_sums.reshape(h, w, 3) / spp
    mean_alb = alb_sums.reshape(h, w, 3) / spp
    mean_nrm = nrm_sums.reshape(h, w, 3) / spp

    toned = tonemap(Vec3.from_array(jnp.asarray(mean_rad)))
    canvas = np.asarray(quantize(toned).to_array(), np.float32)

    flip = lambda a: a[::-1]  # bottom-up rows -> top-down image
    return RenderOutput(
        image=flip(mean_rad),
        canvas=flip(canvas).astype(np.int32),
        albedo=flip(mean_alb),
        normal=flip(mean_nrm),
    )
