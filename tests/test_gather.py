"""Unit tests for the TPU-fast gather layouts (core/gather.py): all
three size regimes must agree with plain numpy indexing, forward and
backward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytpu.core.gather import ROW_LIMIT, SMALL, gather1d, gather_channels


@pytest.mark.parametrize("n", [5, SMALL, SMALL + 1, 700, ROW_LIMIT + 999])
def test_gather_channels_matches_numpy(n):
    rng = np.random.default_rng(n)
    tables = [rng.normal(size=n).astype(np.float32) for _ in range(3)]
    tables.append(rng.integers(0, 9, size=n).astype(np.int32))
    tables.append(rng.integers(0, 2, size=n).astype(bool))
    idx = rng.integers(0, n, size=257).astype(np.int32)

    out = gather_channels([jnp.asarray(t) for t in tables], jnp.asarray(idx))
    for t, o in zip(tables, out):
        assert np.asarray(o).dtype == t.dtype
        np.testing.assert_array_equal(np.asarray(o), t[idx])


@pytest.mark.parametrize("n", [SMALL + 1, 700, ROW_LIMIT + 999])
def test_gather_grad_matches_take_grad(n):
    rng = np.random.default_rng(n)
    tbl = jnp.asarray(rng.normal(size=n).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n, size=300).astype(np.int32))
    w = jnp.asarray(rng.normal(size=300).astype(np.float32))

    g_ours = jax.grad(lambda t: jnp.sum(gather1d(t, idx) * w))(tbl)
    g_ref = jax.grad(lambda t: jnp.sum(jnp.take(t, idx, axis=0) * w))(tbl)
    np.testing.assert_allclose(
        np.asarray(g_ours), np.asarray(g_ref), rtol=1e-5, atol=1e-5
    )


def test_many_channels_chunking():
    n, c = 200, 150  # > LANE channels forces recursion
    rng = np.random.default_rng(0)
    tables = [rng.normal(size=n).astype(np.float32) for _ in range(c)]
    idx = rng.integers(0, n, size=64).astype(np.int32)
    out = gather_channels([jnp.asarray(t) for t in tables], jnp.asarray(idx))
    assert len(out) == c
    for t, o in zip(tables, out):
        np.testing.assert_array_equal(np.asarray(o), t[idx])
