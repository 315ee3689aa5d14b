"""Counter-based RNG key derivation.

The reference uses libc ``rand()`` with process-global state shared
(racily) across pthreads (/root/reference/rtutility.h:229-231,
main.c:48) and, on CUDA, per-pixel curand with a fixed seed of 1010
(/root/reference/rtutility.hu:165-173). Neither is reproducible across
thread counts or shardable.

Here every random draw is keyed by (pixel_id, sample_id, bounce, slot)
through threefry ``fold_in`` chains, so:
  * renders are bit-reproducible for a given seed,
  * any sharding of pixels or samples across devices consumes exactly the
    same per-(pixel, sample) streams — 1-device and N-device renders agree,
  * checkpoint/resume restarts mid-sample-loop bit-identically
    (SURVEY.md §5.4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array


def pixel_keys(key: Array, pixel_ids: Array) -> Array:
    """One key per pixel: fold_in(key, pixel_id), vmapped. (B,) -> (B, 2)."""
    return jax.vmap(lambda p: jax.random.fold_in(key, p))(pixel_ids)


def sample_keys(pix_keys: Array, sample_id) -> Array:
    """Per-(pixel, sample) keys. pix_keys (B,2), scalar sample_id -> (B,2)."""
    return jax.vmap(lambda k: jax.random.fold_in(k, sample_id))(pix_keys)


def ray_uniforms(
    ray_keys: Array, n_cam: int, n_bounce: int, max_bounces: int
) -> tuple[Array, Array]:
    """All U(0,1) draws a (pixel, sample) ray consumes, in ONE threefry
    batch per ray (camera jitter + every bounce's draws), minimizing the
    per-bounce RNG cost inside the scan.

    Layout (fixed, shared with the f64 oracle): draw j of bounce b lives
    at flat index n_cam + b * n_bounce + j.

    Returns (cam_draws (n_cam, B), bounce_draws (max_bounces, n_bounce, B)).
    """
    total = n_cam + max_bounces * n_bounce

    def draw(k):
        return jax.random.uniform(k, (total,))

    d = jax.vmap(draw)(ray_keys)  # (B, total)
    cam = d[:, :n_cam].T
    bounce = d[:, n_cam:].reshape(-1, max_bounces, n_bounce).transpose(1, 2, 0)
    return cam, bounce
