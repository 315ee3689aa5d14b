"""Probe: what does a data-dependent lax.cond cost inside a Mosaic
kernel on the TPU?

The mesh megakernel takes one cond per cull chunk per bounce (19 for
mcworld at CULL_CHUNK=32); if a cond costs ~hundreds of ns the cull's
branch overhead rivals the triangle work it skips. Slope-measured
(reps perturbation defeats hoisting, two reps counts remove the ~35ms
dispatch floor) with the branch (a) always taken, (b) never taken.

Result (v5e): ~538 ns per TAKEN cond (tiny body), ~42 ns not taken.
The branch itself costs ~500 cycles when taken — Mosaic pipeline
refill, not the predicate (the any-reduce is part of both numbers). So
at 1024-ray tiles every taken chunk cond costs ~0.53 ns/ray-bounce:
with mcworld's ~8-11 taken chunks/bounce that is ~5 ns/ray-bounce of
pure branch overhead, comparable to the triangle work itself. Design
rule: a cond is only worth it if the skipped work exceeds ~550 ns
(~500 vector ops) times the skip probability; always-taken conds
(winner extraction, texture fetch on mesh tiles) must be unconditional.
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


def _kernel(x_ref, out_ref, *, n_conds, reps, taken):
    def rep(i, acc):
        def cond_body(c, acc):
            # data-dependent predicate (unknowable at compile time)
            pred = jnp.any(x_ref[:, :] + acc * 0.0 > (-1.0 if taken else 1e30))

            def yes(a):
                return a + 1.0

            return jax.lax.cond(pred, yes, lambda a: a, acc)

        return jax.lax.fori_loop(0, n_conds, cond_body, acc)

    acc = jax.lax.fori_loop(0, reps, rep, jnp.zeros((ROWS, LANE), jnp.float32))
    out_ref[:, :] = acc


def run(taken=True):
    x = jnp.ones((ROWS, LANE), jnp.float32)
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = jax.ShapeDtypeStruct((ROWS, LANE), jnp.float32)

    def make(n_conds, reps):
        return jax.jit(lambda a: pl.pallas_call(
            functools.partial(_kernel, n_conds=n_conds, reps=reps,
                              taken=taken),
            in_specs=[spec], out_specs=out and spec, out_shape=out,
        )(a))

    reps = 2000
    times = {}
    for n in (4, 32):
        call = make(n, reps)
        float(jnp.sum(call(x)))                          # compile+warm
        t0 = time.perf_counter()
        float(jnp.sum(call(x)))
        times[n] = time.perf_counter() - t0
    per_cond = (times[32] - times[4]) / ((32 - 4) * reps)
    print(f"taken={taken}: {per_cond*1e9:7.1f} ns/cond "
          f"(t4={times[4]*1e3:.1f}ms t32={times[32]*1e3:.1f}ms)")


if __name__ == "__main__":
    run(taken=True)
    run(taken=False)
