"""Color utilities: HSL round-trip, gamma tone map, quantization.

Mirrors /root/reference/rtutility.h:
  - ``write_color`` / ``quantize_image``: sqrt (gamma=2) tone map of the
    sample mean, clamp to [0, 0.999], scale by 256 and truncate
    (rtutility.h:56-71). Unlike the reference, which quantizes *before*
    denoising (denoiser.h:41-46), callers here keep linear float images and
    quantize once at file-write time — a documented, strictly-better
    divergence (SURVEY.md §7 fidelity notes).
  - ``rgb_to_hsl`` / ``hsl_to_rgb``: branchless vectorized ports of
    rtutility.h:81-165, used for the emissive "HSL boost" on primary light
    hits (main.c:154-160; CUDA variant boosts L by 1.2, main_cuda.cu:89-98).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from raytpu.core.vec3 import Vec3


def rgb_to_hsl(rgb: Vec3) -> Vec3:
    """Vectorized rgb_to_hsl (/root/reference/rtutility.h:81-116).

    Returns Vec3(h, s, l). Branchless: the reference's if/else chain over
    which channel is max becomes nested ``where``s with the same
    tie-breaking order (r, then g, then b).
    """
    r, g, b = rgb.x, rgb.y, rgb.z
    cmax = jnp.maximum(r, jnp.maximum(g, b))
    cmin = jnp.minimum(r, jnp.minimum(g, b))
    l = (cmax + cmin) * 0.5
    d = cmax - cmin
    gray = cmax == cmin

    denom_lo = cmax + cmin
    denom_hi = 2.0 - cmax - cmin
    s = jnp.where(
        gray,
        0.0,
        jnp.where(l < 0.5, d / _safe(denom_lo), d / _safe(denom_hi)),
    )

    d_safe = _safe(d)
    h_r = (g - b) / d_safe + jnp.where(g < b, 6.0, 0.0)
    h_g = (b - r) / d_safe + 2.0
    h_b = (r - g) / d_safe + 4.0
    # reference order: max==r first, then max==g, then max==b
    h = jnp.where(cmax == r, h_r, jnp.where(cmax == g, h_g, h_b))
    h = jnp.where(gray, 0.0, h / 6.0)
    return Vec3(h, s, l)


def _safe(x: Array, eps: float = 1e-30) -> Array:
    return jnp.where(jnp.abs(x) > eps, x, eps)


def _hue_to_rgb(t1: Array, t2: Array, hue: Array) -> Array:
    """Branchless hue_to_rgb (/root/reference/rtutility.h:118-137)."""
    hue = jnp.where(hue < 0.0, hue + 1.0, hue)
    hue = jnp.where(hue > 1.0, hue - 1.0, hue)
    r1 = t1 + (t2 - t1) * 6.0 * hue
    r3 = t1 + (t2 - t1) * ((2.0 / 3.0) - hue) * 6.0
    return jnp.where(
        6.0 * hue < 1.0,
        r1,
        jnp.where(2.0 * hue < 1.0, t2, jnp.where(3.0 * hue < 2.0, r3, t1)),
    )


def hsl_to_rgb(hsl: Vec3) -> Vec3:
    """Vectorized hsl_to_rgb (/root/reference/rtutility.h:139-165)."""
    h, s, l = hsl.x, hsl.y, hsl.z
    t2 = jnp.where(l < 0.5, l * (1.0 + s), l + s - l * s)
    t1 = 2.0 * l - t2
    r = _hue_to_rgb(t1, t2, h + 1.0 / 3.0)
    g = _hue_to_rgb(t1, t2, h)
    b = _hue_to_rgb(t1, t2, h - 1.0 / 3.0)
    gray = s == 0.0
    return Vec3(
        jnp.where(gray, l, r), jnp.where(gray, l, g), jnp.where(gray, l, b)
    )


def hsl_boost(rgb: Vec3, l_factor: float = 1.0, s_factor: float = 1.0) -> Vec3:
    """Emissive boost through HSL space (main.c:154-160).

    The CPU reference multiplies L and S by 1.0 (identity values, but the
    round-trip itself is applied); the CUDA fork uses L*=1.2
    (main_cuda.cu:89-98). Factors are config knobs here. The RGB->HSL->RGB
    round-trip is mathematically the identity, so with both factors at
    their CPU-reference value of 1.0 the ~40-op round-trip is skipped
    (difference vs computing it: f32 rounding only).
    """
    if l_factor == 1.0 and s_factor == 1.0:
        return rgb
    hsl = rgb_to_hsl(rgb)
    boosted = Vec3(hsl.x, hsl.y * s_factor, hsl.z * l_factor)
    return hsl_to_rgb(boosted)


def tonemap(mean_radiance: Vec3) -> Vec3:
    """sqrt gamma + clamp to [0, 0.999] (write_color_canva, rtutility.h:56-71),
    on the *mean* radiance (the reference divides the sample sum by spp)."""
    g = Vec3(
        jnp.sqrt(jnp.maximum(mean_radiance.x, 0.0)),
        jnp.sqrt(jnp.maximum(mean_radiance.y, 0.0)),
        jnp.sqrt(jnp.maximum(mean_radiance.z, 0.0)),
    )
    return g.clamp(0.0, 0.999)


def quantize(toned: Vec3) -> Vec3:
    """[0,1) float -> {0..255} ints-as-floats, truncating like the C cast
    ``(int)(256 * clamp(c, 0, 0.999))`` (rtutility.h:70)."""
    return Vec3(
        jnp.floor(256.0 * toned.x),
        jnp.floor(256.0 * toned.y),
        jnp.floor(256.0 * toned.z),
    )
