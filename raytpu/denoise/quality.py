"""Denoiser quality metrics: PSNR / SSIM against a high-spp target.

The reference never measures its OIDN pass (no tests at all — SURVEY.md
§4); here denoiser quality is a number: render a (low-spp, high-spp)
pair of the same scene, score each denoiser's output against the
high-spp target, and regression-guard the result
(tests/test_denoise_quality.py, tools/denoise_quality.py).

Metrics operate on linear-float images but are computed after the
reference's sqrt tonemap (rtutility.h:56-71) so they weight errors the
way the written file shows them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array


def tonemapped(img: Array) -> Array:
    """sqrt gamma, clipped to [0, 1] (write_color_canva semantics)."""
    return jnp.sqrt(jnp.clip(img, 0.0, 1.0))


def psnr(img: Array, target: Array, tonemap: bool = True) -> float:
    """Peak signal-to-noise ratio in dB over the [0,1] tonemapped range."""
    a, b = (tonemapped(img), tonemapped(target)) if tonemap else (img, target)
    mse = jnp.mean((a - b) ** 2)
    return float(10.0 * jnp.log10(1.0 / jnp.maximum(mse, 1e-12)))


def _gauss_kernel(radius: int = 5, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-(x**2) / (2 * sigma**2))
    k2 = np.outer(k, k)
    return (k2 / k2.sum()).astype(np.float32)


def _filter2(img: Array, kernel: np.ndarray) -> Array:
    """Depthwise 2-D convolution, SAME padding (per channel)."""
    k = jnp.asarray(kernel)[:, :, None, None]
    x = jnp.moveaxis(img, -1, 0)[:, None]           # (C, 1, H, W)
    out = jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
    )
    return jnp.moveaxis(out[:, 0], 0, -1)


def ssim(img: Array, target: Array, tonemap: bool = True) -> float:
    """Mean SSIM (Wang et al. 2004) with the standard 11x11 Gaussian
    window, on the tonemapped [0,1] images, averaged over channels."""
    a = tonemapped(img) if tonemap else img
    b = tonemapped(target) if tonemap else target
    k = _gauss_kernel(5, 1.5)
    c1, c2 = 0.01**2, 0.03**2

    mu_a = _filter2(a, k)
    mu_b = _filter2(b, k)
    var_a = _filter2(a * a, k) - mu_a**2
    var_b = _filter2(b * b, k) - mu_b**2
    cov = _filter2(a * b, k) - mu_a * mu_b

    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a**2 + mu_b**2 + c1) * (var_a + var_b + c2)
    )
    return float(jnp.mean(s))


def render_pair(scene, cam, cfg, key, spp_lo: int, spp_hi: int):
    """(low-spp RenderOutput, high-spp RenderOutput) of the same frame.
    The high-spp render extends the low one's sample range, so the pair
    shares no samples only when spp_hi uses disjoint indices — here the
    target simply uses MORE samples including the low ones (standard
    practice; the target's residual noise floor is spp_lo/spp_hi
    correlated but tiny)."""
    from raytpu.integrator.render import render_image

    lo = render_image(scene, cam, cfg.replace(spp=spp_lo), key)
    hi = render_image(scene, cam, cfg.replace(spp=spp_hi), key)
    return lo, hi


def score_denoisers(lo, hi, denoisers: dict) -> dict:
    """Score each named denoiser fn(color, albedo, normal) -> color on a
    render pair; includes the identity ('noisy') baseline."""
    target = jnp.asarray(hi.image)
    out = {"noisy": {
        "psnr": psnr(jnp.asarray(lo.image), target),
        "ssim": ssim(jnp.asarray(lo.image), target),
    }}
    for name, fn in denoisers.items():
        img = fn(
            jnp.asarray(lo.image), jnp.asarray(lo.albedo),
            jnp.asarray(lo.normal),
        )
        out[name] = {"psnr": psnr(img, target), "ssim": ssim(img, target)}
    return out
