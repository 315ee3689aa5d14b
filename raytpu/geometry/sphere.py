"""Branchless vectorized ray-sphere intersection.

Reformulates hit_sphere (/root/reference/sphere.h:13-47) — a scalar
quadratic solve with near-then-far root selection — as a fully masked
(B rays x S spheres) computation returning a distance matrix with +inf
for misses. The per-ray closest sphere is then an argmin, replacing the
reference's linear scan in closest_hit (main.c:52-92).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from raytpu.core.vec3 import Vec3

INF = jnp.inf


def sphere_distances(
    origin: Vec3, direction: Vec3, center: Vec3, radius: Array, eps: float = 1e-4
) -> Array:
    """Distances (B, S); +inf where no acceptable root.

    Matches sphere.h:13-47: accept t1 = (-b - sqrt(disc)) / (2a) if
    t1 >= 1e-4, else t2 = (-b + sqrt(disc)) / (2a) if t2 >= 1e-4, only
    when disc > 0 (strict).
    """
    # broadcast (B, 1) ray components against (1, S) sphere components
    ox, oy, oz = origin.x[:, None], origin.y[:, None], origin.z[:, None]
    dx, dy, dz = direction.x[:, None], direction.y[:, None], direction.z[:, None]
    cx, cy, cz = center.x[None, :], center.y[None, :], center.z[None, :]
    r = radius[None, :]

    ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
    a = dx * dx + dy * dy + dz * dz
    b = 2.0 * (ocx * dx + ocy * dy + ocz * dz)
    c = ocx * ocx + ocy * ocy + ocz * ocz - r * r
    disc = b * b - 4.0 * a * c

    # grad-safe guards: misses are masked below so forward matches the C
    # code (sphere.h:27-44); the floors only keep autodiff NaN-free.
    sqrt_disc = jnp.sqrt(jnp.maximum(disc, 1e-30))
    inv_2a = 0.5 / jnp.maximum(a, 1e-20)
    t1 = (-b - sqrt_disc) * inv_2a
    t2 = (-b + sqrt_disc) * inv_2a

    hit = disc > 0.0
    t = jnp.where(
        hit & (t1 >= eps), t1, jnp.where(hit & (t2 >= eps), t2, INF)
    )
    return t


def sphere_normal(hit_point: Vec3, center: Vec3) -> Vec3:
    """Outward normal normalize(p - c) (sphere.h:33, 42)."""
    return (hit_point - center).normalize()


def sphere_distance_one(
    origin: Vec3, direction: Vec3, center: Vec3, radius: Array, eps: float = 1e-4
) -> Array:
    """Per-ray distance to ONE (already gathered) sphere: all args (B,).

    Same math as sphere_distances but elementwise — used to recompute the
    winning primitive's distance differentiably after a stop_gradient'd
    argmin selected it (so the backward pass needs no (B, S) residuals).
    """
    oc = origin - center
    a = direction.dot(direction)
    b = 2.0 * oc.dot(direction)
    c = oc.dot(oc) - radius * radius
    disc = b * b - 4.0 * a * c
    sqrt_disc = jnp.sqrt(jnp.maximum(disc, 1e-30))
    inv_2a = 0.5 / jnp.maximum(a, 1e-20)
    t1 = (-b - sqrt_disc) * inv_2a
    t2 = (-b + sqrt_disc) * inv_2a
    hit = disc > 0.0
    return jnp.where(
        hit & (t1 >= eps), t1, jnp.where(hit & (t2 >= eps), t2, INF)
    )
