"""Probe: texture-ROW one-hot MXU fetch for the mesh megakernel.

The shipped in-kernel fetch (trace_scene.py) contracts a per-texel
one-hot against (8, 128)-texel atlas chunks, gated by per-(row, chunk)
`need` conds — measured ~250ns per (ray-row, chunk) hit, which at
mcworld's 22 chunks costs ~43 ns/ray-bounce and forces the dispatch
policy to route many-chunk scenes to the XLA scan path.

Candidate replacement probed here: one-hot over the much smaller
texture-ROW space (tex_y + atlas_h * mat, e.g. 176 rows for mcworld vs
2816 texels), ONE unconditional HIGHEST-precision dot

    out(4*atlas_w, 128 rays) = A(4*atlas_w, R_pad) @ onehot(R_pad, 128)

pulling every x-position of the winner row for all 4 channels, then a
sublane mask-reduce (iota % atlas_w == tex_x) to pick the texel. Both
steps are exact in f32: the one-hot contraction has a single nonzero
term per output, and the reduce sums one texel against exact zeros.

Measures bit-exactness vs jnp.take and runtime vs the chunk scheme.
Result (v5e, mcworld-shaped 176 rows x 16 w, ROWS=8): row scheme
~0.11 ns/ray vs chunk scheme ~10.4 ns/ray with all chunks needed —
~95x; bit-exact. See trace_scene.py for the production integration.
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
ROWS = 8


def _row_kernel(atlas_ref, idx_ref, r_out, g_out, b_out, a_out,
                *, atlas_w, r_pad, reps, variant, n_tex):
    w4 = atlas_ref.shape[0]

    def row_body(r, shift):
        # shift (carried per rep) defeats loop-invariant hoisting of the
        # fetch; shift == 0 on the first rep keeps exactness checkable
        idx_row = (idx_ref[pl.ds(r, 1), :] + shift) % n_tex  # (1, 128)
        texrow = idx_row // atlas_w                     # (1, 128)
        tex_x = idx_row - texrow * atlas_w
        sub = jax.lax.broadcasted_iota(jnp.int32, (r_pad, LANE), 0)
        onehot = (sub == texrow).astype(jnp.float32)    # (r_pad, 128)
        out = jnp.dot(
            atlas_ref[:, :], onehot,
            preferred_element_type=jnp.float32,
            precision=(jax.lax.Precision.HIGHEST if variant != "default"
                       else jax.lax.Precision.DEFAULT),
        )                                               # (4w, 128)
        if variant == "nodot":
            out = atlas_ref[0:w4, 0:LANE] + onehot[0:w4, :]
        if variant in ("full", "default", "nodot"):
            xsub = jax.lax.broadcasted_iota(jnp.int32, (w4, LANE), 0)
            mask = (xsub % atlas_w == tex_x).astype(jnp.float32)
            prod = out * mask
            acc = prod.reshape(4, atlas_w, LANE).sum(axis=1)  # (4, 128)
        elif variant == "sliceadd":
            xsub = jax.lax.broadcasted_iota(jnp.int32, (w4, LANE), 0)
            mask = (xsub % atlas_w == tex_x).astype(jnp.float32)
            prod = out * mask
            # ch-major rows: sum x-slices per channel with static slices
            chs = []
            for c in range(4):
                a = prod[c * atlas_w : c * atlas_w + 1]
                for k in range(1, atlas_w):
                    a = a + prod[c * atlas_w + k : c * atlas_w + k + 1]
                chs.append(a)
            acc = jnp.concatenate(chs, axis=0)          # (4, 128)
        elif variant == "nomask":
            acc = out[0:4, :]
        r_out[pl.ds(r, 1), :] = acc[0:1]
        g_out[pl.ds(r, 1), :] = acc[1:2]
        b_out[pl.ds(r, 1), :] = acc[2:3]
        a_out[pl.ds(r, 1), :] = acc[3:4]
        return shift

    def batched_body(shift, x):
        # whole (ROWS, LANE) tile in ONE contraction: rays relaid to the
        # lane dim (1, ROWS*LANE), no dynamic row slicing, no row loop
        n = ROWS * LANE
        idx_all = (idx_ref[:, :].reshape(1, n) + shift) % n_tex
        texrow = idx_all // atlas_w
        tex_x = idx_all - texrow * atlas_w
        sub = jax.lax.broadcasted_iota(jnp.int32, (r_pad, n), 0)
        onehot = (sub == texrow).astype(jnp.float32)
        out = jnp.dot(
            atlas_ref[:, :], onehot,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                               # (4w, n)
        xsub = jax.lax.broadcasted_iota(jnp.int32, (w4, n), 0)
        mask = (xsub % atlas_w == tex_x).astype(jnp.float32)
        prod = out * mask
        for c, ref in ((0, r_out), (1, g_out), (2, b_out), (3, a_out)):
            a = prod[c * atlas_w : c * atlas_w + 1]
            for k in range(1, atlas_w):
                a = a + prod[c * atlas_w + k : c * atlas_w + k + 1]
            ref[:, :] = a.reshape(ROWS, LANE)
        return x

    def rep(i, x):
        if variant == "batched":
            batched_body(i, x)
            return x
        jax.lax.fori_loop(0, ROWS, functools.partial(row_body), i)
        return x

    jax.lax.fori_loop(0, reps, rep, 0)


def _chunk_kernel(atlas_ref, idx_ref, r_out, g_out, b_out, a_out,
                  *, n_chunks, reps, n_tex):
    """The shipped scheme (trace_scene.py texture fetch), for timing."""

    def row_body(r, shift):
        idx_row = (idx_ref[pl.ds(r, 1), :] + shift) % n_tex
        acc = jnp.zeros((8, LANE), jnp.float32)

        def chunk_body(c, acc):
            rel = idx_row - c * LANE
            need = jnp.any((rel >= 0) & (rel < LANE))

            def dot(acc):
                sub = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0)
                onehot = (sub == rel).astype(jnp.float32)
                return acc + jnp.dot(
                    atlas_ref[c], onehot,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )

            return jax.lax.cond(need, dot, lambda a: a, acc)

        acc = jax.lax.fori_loop(0, n_chunks, chunk_body, acc)
        r_out[pl.ds(r, 1), :] = acc[0:1]
        g_out[pl.ds(r, 1), :] = acc[1:2]
        b_out[pl.ds(r, 1), :] = acc[2:3]
        a_out[pl.ds(r, 1), :] = acc[3:4]
        return shift

    def rep(i, x):
        jax.lax.fori_loop(0, ROWS, row_body, i)
        return x

    jax.lax.fori_loop(0, reps, rep, 0)


def run(n_mats=11, atlas_w=16, atlas_h=16, reps=1, seed=0,
        variants=("full",)):
    n_tex = n_mats * atlas_w * atlas_h
    rng = np.random.default_rng(seed)
    texels = rng.random((4, n_tex), np.float32)
    idx = rng.integers(0, n_tex, (ROWS, LANE)).astype(np.int32)

    # row-scheme operand: (4*atlas_w, r_pad), rows ch*w + x
    n_rows = n_tex // atlas_w
    r_pad = -(-n_rows // LANE) * LANE
    a_rows = np.zeros((4 * atlas_w, r_pad), np.float32)
    for ch in range(4):
        # texel t = row * w + x  ->  A[ch*w + x, row]
        a_rows[ch * atlas_w:(ch + 1) * atlas_w, :n_rows] = (
            texels[ch].reshape(n_rows, atlas_w).T
        )

    # chunk-scheme operand: (n_chunks, 8, 128)
    n_chunks = -(-n_tex // LANE)
    p = n_chunks * LANE - n_tex
    chans = np.concatenate(
        [np.pad(texels, ((0, 0), (0, p))), np.zeros((4, n_tex + p), np.float32)]
    )
    a_chunks = chans.reshape(8, n_chunks, LANE).transpose(1, 0, 2)

    outs = [jax.ShapeDtypeStruct((ROWS, LANE), jnp.float32)] * 4
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)

    def make_row_call(variant, r):
        return jax.jit(lambda a, i: pl.pallas_call(
            functools.partial(_row_kernel, atlas_w=atlas_w, r_pad=r_pad,
                              reps=r, variant=variant, n_tex=n_tex),
            in_specs=[spec, spec], out_specs=[spec] * 4, out_shape=outs,
        )(a, i))

    def make_chunk_call(r):
        return jax.jit(lambda a, i: pl.pallas_call(
            functools.partial(_chunk_kernel, n_chunks=n_chunks, reps=r,
                              n_tex=n_tex),
            in_specs=[spec, spec], out_specs=[spec] * 4, out_shape=outs,
        )(a, i))

    ref = texels[:, idx]                                # (4, ROWS, LANE)

    runs = [(f"row:{v}", functools.partial(make_row_call, v), a_rows)
            for v in variants]
    runs.append(("chunk", make_chunk_call, a_chunks))
    for name, make, arg in runs:
        arg = jnp.asarray(arg)
        idx_d = jnp.asarray(idx)
        # exactness at reps=1 (the only rep runs at shift 0)
        got = make(1)(arg, idx_d)
        exact = all(
            np.array_equal(np.asarray(g), ref[c]) for c, g in enumerate(got)
        )
        # timing: slope between two reps counts removes the per-call
        # dispatch floor (~35 ms through the axon tunnel) and per-rep
        # index perturbation defeats loop-invariant hoisting
        times = []
        for r in (reps, 4 * reps):
            call = make(r)
            call(arg, idx_d)[0].block_until_ready()
            float(jnp.sum(call(arg, idx_d)[0]))         # warm path
            t0 = time.perf_counter()
            float(jnp.sum(call(arg, idx_d)[0]))         # tunnel-safe sync
            times.append(time.perf_counter() - t0)
        per_ray = (times[1] - times[0]) / (3 * reps * ROWS * LANE)
        print(f"{name:12s} exact={exact}  {per_ray*1e9:8.2f} ns/ray "
              f"(t{reps}={times[0]*1e3:.1f}ms t{4*reps}={times[1]*1e3:.1f}ms)")


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--mats", type=int, default=11)
    ap.add_argument("--w", type=int, default=16)
    ap.add_argument("--h", type=int, default=16)
    ap.add_argument("--reps", type=int, default=200)
    ap.add_argument("--variants", default="full")
    args = ap.parse_args()
    run(args.mats, args.w, args.h, args.reps,
        variants=tuple(args.variants.split(",")))
