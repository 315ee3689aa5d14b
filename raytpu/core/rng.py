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


def bounce_uniforms(ray_keys: Array, bounce, n: int) -> Array:
    """n U(0,1) draws per ray for one bounce: (B, 2) keys -> (n, B).

    Draw slots are fixed per bounce so the consumption pattern is
    identical between the jitted f32 renderer and the f64 oracle.
    """
    def draw(k):
        return jax.random.uniform(jax.random.fold_in(k, bounce), (n,))

    return jax.vmap(draw)(ray_keys).T


def camera_uniforms(ray_keys: Array, n: int = 4) -> Array:
    """Per-(pixel, sample) camera draws (pixel jitter u/v, aperture dx/dy):
    (B, 2) keys -> (n, B). Uses bounce slot -1 so it never collides with
    bounce draws."""
    def draw(k):
        return jax.random.uniform(jax.random.fold_in(k, 0x7FFFFFFF), (n,))

    return jax.vmap(draw)(ray_keys).T
