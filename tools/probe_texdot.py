"""Probe: in-kernel texture fetch via one-hot MXU dots.

The mesh megakernel needs per-ray texel fetches from a small atlas
without per-lane dynamic indexing (Mosaic has none). Candidate: keep the
atlas in VMEM as (n_chunks, 8, 128) channel-major chunks; per 128-ray
row, build a (128 texels, 128 rays) one-hot from the texel indices and
contract on the MXU: out(8, 128) = T_chunk(8, 128) @ A(128, 128),
accumulated over chunks. One-hot selection in f32 is EXACT (single
nonzero term), so results must be bit-identical to jnp.take.

Measures correctness + runtime vs the XLA row-gather at the same batch.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
ROWS = 16


def _kernel(atlas_ref, idx_ref, r_out, g_out, b_out, a_out, *, n_chunks, reps):
    def row_body(r, _):
        idx_row = idx_ref[pl.ds(r, 1), :]              # (1, 128) i32
        acc = jnp.zeros((8, LANE), jnp.float32)

        def chunk_body(c, acc):
            tbl = atlas_ref[c]                          # (8, 128) f32
            sub = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0)
            onehot = (sub == (idx_row - c * LANE)).astype(jnp.float32)
            return acc + jnp.dot(
                tbl, onehot, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGH,
            )

        acc = jax.lax.fori_loop(0, n_chunks, chunk_body, acc)
        r_out[pl.ds(r, 1), :] = acc[0:1]
        g_out[pl.ds(r, 1), :] = acc[1:2]
        b_out[pl.ds(r, 1), :] = acc[2:3]
        a_out[pl.ds(r, 1), :] = acc[3:4]
        return 0

    # reps > 1 re-runs the whole fetch to amortize fixed cost in timing
    def rep(_, x):
        return jax.lax.fori_loop(0, ROWS, row_body, x)

    jax.lax.fori_loop(0, reps, rep, 0)


@functools.partial(jax.jit, static_argnames=("n_chunks", "reps", "interpret"))
def texdot(atlas, idx, *, n_chunks, reps, interpret=False):
    rows = idx.shape[0]
    grid = (rows // ROWS,)
    out_spec = pl.BlockSpec((ROWS, LANE), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, n_chunks=n_chunks, reps=reps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((n_chunks, 8, LANE), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            out_spec,
        ],
        out_specs=[out_spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((rows, LANE), jnp.float32)] * 4,
        interpret=interpret,
    )(atlas, idx)


def main():
    n_texels = int(sys.argv[1]) if len(sys.argv) > 1 else 2816
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    n_chunks = -(-n_texels // LANE)
    rng = np.random.default_rng(0)
    tex = rng.random((4, n_chunks * LANE), np.float32)
    atlas = jnp.asarray(
        np.concatenate([tex, np.zeros((4, n_chunks * LANE), np.float32)])
        .reshape(8, n_chunks, LANE)
        .transpose(1, 0, 2)
    )  # (n_chunks, 8, 128)
    idx = jnp.asarray(
        rng.integers(0, n_texels, size=(B // LANE, LANE)).astype(np.int32)
    )

    interpret = jax.default_backend() == "cpu"
    out = texdot(atlas, idx, n_chunks=n_chunks, reps=1, interpret=interpret)
    want = [jnp.take(jnp.asarray(tex[c]), idx.reshape(-1)) for c in range(4)]
    for c in range(4):
        np.testing.assert_array_equal(
            np.asarray(out[c]).reshape(-1), np.asarray(want[c])
        )
    print("exactness: OK (bit-identical to take)")

    if interpret:
        return

    def sync(x):
        return float(jnp.sum(x))

    # timed: reps inside the kernel
    t0 = time.perf_counter()
    sync(texdot(atlas, idx, n_chunks=n_chunks, reps=reps)[0])
    print(f"compile+run: {time.perf_counter() - t0:.1f}s")
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        sync(texdot(atlas, idx, n_chunks=n_chunks, reps=reps)[0])
        best = min(best, time.perf_counter() - t0)
    per_fetch = best / reps
    print(f"texdot: {per_fetch*1e3:.3f} ms per {B}-ray fetch "
          f"({per_fetch/B*1e9:.2f} ns/ray, {n_chunks} chunks)")

    # XLA row-gather comparison (the current atlas_fetch cost), in-jit loop
    tbl = jnp.asarray(np.concatenate([tex.T, np.zeros((n_chunks*LANE, 124),
                                                      np.float32)], axis=1))

    @jax.jit
    def gather_loop(tbl, idx):
        def step(acc, i):
            rows = jnp.take(tbl, (idx.reshape(-1) + i) % n_texels, axis=0)
            return acc + jnp.sum(rows[:, 0]), None
        out, _ = jax.lax.scan(step, 0.0, jnp.arange(reps, dtype=jnp.int32))
        return out

    sync(gather_loop(tbl, idx))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        sync(gather_loop(tbl, idx))
        best = min(best, time.perf_counter() - t0)
    per = best / reps
    print(f"row-gather: {per*1e3:.3f} ms per {B}-ray fetch "
          f"({per/B*1e9:.2f} ns/ray)")


if __name__ == "__main__":
    main()
