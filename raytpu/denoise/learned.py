"""Learned denoiser: a small kernel-predicting CNN (KPCN-style).

The reference ships Intel OIDN's pretrained "RT" CNN
(/root/reference/denoiser.h:31-91); the joint bilateral
(denoise/bilateral.py) is differentiable but a visibly weaker filter
class. This module closes the gap with the standard kernel-predicting
architecture (Bako et al. 2017, scaled down):

  features = [log1p(color), albedo, normal]            (H, W, 9)
  x -> Conv3x3 stack -> per-pixel (2r+1)^2 logits -> softmax
  out[p] = sum_q softmax_w[p, q] * color[q]            (linear color)

Kernel prediction (vs direct color regression) keeps the output inside
the convex hull of the noisy neighborhood: energy-bounded, no color
shifts, stable with little training data — and the apply step is the
same shifted-adds pattern as the bilateral, so the whole model is
convolutions + elementwise (MXU/VPU friendly) and differentiable
end-to-end for inverse rendering.

Training: tools/train_denoiser.py self-generates (low-spp, high-spp)
pairs with the renderer and minimizes L1 on tonemapped color; weights
ship in raytpu/denoise/weights/kpcn.npz and load via load_params().
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import Array

RADIUS = 3          # 7x7 predicted kernels, like the bilateral window
FEATURES = 24
DEPTH = 4

WEIGHTS_PATH = os.path.join(os.path.dirname(__file__), "weights", "kpcn.npz")


class KPCN(nn.Module):
    """Per-pixel kernel predictor over (color, albedo, normal)."""

    features: int = FEATURES
    depth: int = DEPTH
    radius: int = RADIUS

    @nn.compact
    def __call__(self, color: Array, albedo: Array, normal: Array) -> Array:
        n_taps = (2 * self.radius + 1) ** 2
        x = jnp.concatenate(
            [jnp.log1p(jnp.maximum(color, 0.0)), albedo, normal], axis=-1
        )
        for _ in range(self.depth):
            x = nn.Conv(self.features, (3, 3))(x)
            x = nn.relu(x)
        logits = nn.Conv(n_taps, (3, 3))(x)
        weights = jax.nn.softmax(logits, axis=-1)       # (H, W, taps)
        return apply_kernels(color, weights, self.radius)


def apply_kernels(color: Array, weights: Array, radius: int) -> Array:
    """out[p] = sum over the window of w[p, q] * color[q], with
    out-of-bounds taps renormalized away (their weight is discarded and
    the remainder rescaled, so edges stay energy-preserving)."""
    h, w = color.shape[:2]
    rows = jnp.arange(h)[:, None]
    cols = jnp.arange(w)[None, :]
    num = jnp.zeros_like(color)
    den = jnp.zeros(color.shape[:2] + (1,), color.dtype)
    tap = 0
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            shifted = jnp.roll(color, (dy, dx), axis=(0, 1))
            valid = (
                (rows - dy >= 0) & (rows - dy < h)
                & (cols - dx >= 0) & (cols - dx < w)
            )[..., None].astype(color.dtype)
            wq = weights[..., tap : tap + 1] * valid
            num = num + wq * shifted
            den = den + wq
            tap += 1
    return num / jnp.maximum(den, 1e-8)


def init_params(key: Array | None = None):
    model = KPCN()
    key = key if key is not None else jax.random.PRNGKey(0)
    dummy = jnp.zeros((16, 16, 3), jnp.float32)
    return model.init(key, dummy, dummy, dummy)


def save_params(params: Any, path: str = WEIGHTS_PATH) -> None:
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(
        path,
        **{jax.tree_util.keystr(k): np.asarray(v) for k, v in flat},
    )


def load_params(path: str = WEIGHTS_PATH):
    """Load trained weights; returns None when no checkpoint exists yet
    (callers fall back to the bilateral filter)."""
    if not os.path.exists(path):
        return None
    z = np.load(path)
    template = init_params()
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for k, v in flat:
        name = jax.tree_util.keystr(k)
        if name not in z:
            raise ValueError(f"weights file {path} is missing {name}")
        if z[name].shape != v.shape:
            raise ValueError(
                f"{name}: checkpoint shape {z[name].shape} != {v.shape}"
            )
        leaves.append(jnp.asarray(z[name]))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def denoise_learned(
    color: Array, albedo: Array, normal: Array, params: Any = None
) -> Array:
    """OIDN-call-site-compatible entry (like denoise/bilateral.denoise).
    ``params=None`` loads the shipped checkpoint."""
    if params is None:
        params = load_params()
        if params is None:
            raise FileNotFoundError(
                f"no trained denoiser weights at {WEIGHTS_PATH}; "
                "run tools/train_denoiser.py or use --denoise=bilateral"
            )
    return KPCN().apply(params, color, albedo, normal)
