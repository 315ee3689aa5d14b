"""Denoiser tests: variance reduction on flat regions, edge preservation
via the AOV guides, differentiability, and pipeline integration."""

import jax
import jax.numpy as jnp
import numpy as np

from raytpu.denoise import DenoiseParams, denoise


def _noisy_two_tone(key, h=32, w=32, noise=0.2):
    """Left half dark, right half bright, albedo/normal guides follow the
    same split exactly."""
    base = np.zeros((h, w, 3), np.float32)
    base[:, w // 2:] = 0.8
    base[:, : w // 2] = 0.2
    albedo = base.copy()
    normal = np.zeros((h, w, 3), np.float32)
    normal[:, : w // 2, 2] = 1.0
    normal[:, w // 2:, 0] = 1.0
    rng = np.random.default_rng(int(jax.random.randint(key, (), 0, 2**31 - 1)))
    color = base + rng.normal(0, noise, base.shape).astype(np.float32)
    return jnp.asarray(color), jnp.asarray(albedo), jnp.asarray(normal), base


def test_variance_reduced_on_flat_regions():
    c, a, n, base = _noisy_two_tone(jax.random.PRNGKey(0))
    out = np.asarray(denoise(c, a, n))
    raw_err = np.abs(np.asarray(c) - base)[:, :12].mean()
    den_err = np.abs(out - base)[:, :12].mean()
    assert den_err < raw_err * 0.45, (den_err, raw_err)


def test_edges_preserved_by_guides():
    c, a, n, base = _noisy_two_tone(jax.random.PRNGKey(1))
    out = np.asarray(denoise(c, a, n))
    # the two halves must stay separated: the step across the boundary
    # survives (no blur across the albedo/normal edge)
    left = out[:, : 16 - 1].mean()
    right = out[:, 16 + 1:].mean()
    assert right - left > 0.5, (left, right)


def test_differentiable():
    c, a, n, _ = _noisy_two_tone(jax.random.PRNGKey(2), h=8, w=8)

    def loss(c):
        return jnp.mean(denoise(c, a, n) ** 2)

    g = jax.grad(loss)(c)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_identity_when_sigmas_tiny():
    c, a, n, _ = _noisy_two_tone(jax.random.PRNGKey(3), h=8, w=8)
    p = DenoiseParams.default(
        sigma_spatial=1e-4, sigma_albedo=1e-4, sigma_normal=1e-4,
        sigma_color=1e-4, radius=2,
    )
    out = np.asarray(denoise(c, a, n, p))
    np.testing.assert_allclose(out, np.asarray(c), atol=1e-5)
