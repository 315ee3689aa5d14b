"""TPU-fast gathers.

Empirical Mosaic/XLA-TPU behavior (measured on v5e, jax 0.9, in-jit
loops so dispatch latency doesn't pollute the numbers, B=122880):

  | formulation                     | compile   | warm runtime        |
  |---------------------------------|-----------|---------------------|
  | take from (N<=64,)              | ~1s       | 0.3ms (select tree) |
  | take from (N,) 1-D, N large     | 1-6 MIN   | ~1ms                |
  | 2-D t[i//128, i%128]            | ~1s       | ~20ms (scalar path) |
  | row-gather take((N,4), axis=0)  | 344s      | 3.3ms               |
  | row-gather take((N,32), axis=0) | 124s      | 3.3ms               |
  | row-gather take((N,128),axis=0) | **1.4s**  | **3.4ms for ALL 128 cols** |

The ONLY formulation that both compiles fast and runs fast is a
row-gather whose gathered rows are exactly 128 lanes wide. Every gather
here is therefore routed to one of three layouts:

  1. N <= 64: plain take (fast select-tree path).
  2. N <= ROW_LIMIT: channel-lane layout — stack up to 128 channels as
     the lanes of an (N, 128) table, ONE row-gather fetches every
     channel, extraction is a free static slice.
  3. N > ROW_LIMIT (large textures): interleaved layout — pack
     ceil128(C) channels x (128 / ceil128(C)) entries per row; one
     row-gather + a one-hot lane extraction per channel (a handful of
     cheap vector ops). Memory stays ~C/ceil128(C) of layout 1.

All paths are plain take/where/multiply/sum — differentiable w.r.t. the
table values and fast-compiling.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax import Array

LANE = 128
SMALL = 64          # <= this: XLA's select-tree take is fastest
ROW_LIMIT = 65536   # channel-lane layout memory cap: 65536*128*4B = 32MB
_BWD_CHUNK = 32768  # rows per one-hot matmul chunk in the gather VJP
_SORT_BWD_ROWS = 8192   # rows below this always take the exact one-hot
                        # matmul VJP (O(B*N) work)
_SEG_CHUNK = 1024   # sorted rows per local-prefix chunk in the sort-path
                    # VJP: segments inside one chunk difference local
                    # prefixes only (ADVICE r4 precision fix)
_MATMUL_BWD_MACS = 2**31  # above _SORT_BWD_ROWS the matmul is still
                        # preferred (exactness) while B*N stays under
                        # this MAC budget (~20ms of MXU); past it the
                        # sort + prefix-sum path takes over — see
                        # _take_rows_bwd


# ---------------------------------------------------------------------------
# custom-VJP gathers: XLA's native take-transpose is a serial TPU scatter
# (~12x a forward render in practice); these backpropagate through an
# explicit one-hot matmul on the MXU / masked reductions instead.
# ---------------------------------------------------------------------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _take_small_n(n: int, tbl: Array, idx: Array) -> Array:
    return jnp.take(tbl, idx, axis=0)


def _take_small_fwd(n, tbl, idx):
    return jnp.take(tbl, idx, axis=0), idx


def _take_small_bwd(n, idx, g):
    # N <= SMALL masked reductions — vector-friendly, no scatter
    grad = jnp.stack(
        [jnp.sum(jnp.where(idx == i, g, 0.0)) for i in range(n)]
    )
    return grad, None


_take_small_n.defvjp(_take_small_fwd, _take_small_bwd)


def _take_small(tbl: Array, idx: Array) -> Array:
    return _take_small_n(tbl.shape[0], tbl, idx)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _take_rows_n(n: int, tbl: Array, idx: Array) -> Array:
    """tbl (N, 128) f32, idx (B,) -> (B, 128) row-gather."""
    return jnp.take(tbl, idx, axis=0)


def _take_rows_fwd(n, tbl, idx):
    return jnp.take(tbl, idx, axis=0), idx


def _take_rows_bwd(n, idx, g):
    b = idx.shape[0]
    if n > _SORT_BWD_ROWS and n * b > _MATMUL_BWD_MACS:
        # one-hot matmul work is O(B * N * 128) MACs — fine for atlas-
        # sized tables, catastrophic for equirect-sky-sized ones (the
        # 4096x2048 sky = 262144 interleaved rows: ~2.5e16 MACs per
        # pullback; in round 4 it took the TPU worker down on the
        # mesh+sky fwd+bwd bench). Sort-based segment sums are
        # O((B + N) * 128): sort cotangent rows by destination, prefix-
        # sum, and difference at each row's [first, last) occurrence
        # range via two searchsorteds. The combined threshold keeps the
        # EXACT matmul for every case it can afford (mid-size tables /
        # small batches) so its precision is only traded away where the
        # matmul is genuinely infeasible.
        #
        # TWO-LEVEL prefix (ADVICE r4): a single global f32 cumsum makes
        # the difference cs[hi]-cs[lo] lose bits proportional to the
        # RUNNING PREFIX magnitude — at production batch sizes a late
        # small segment can cancel away most of its significance. Here
        # the prefix is chunked (_SEG_CHUNK sorted rows per chunk):
        # a segment contained in one chunk differences LOCAL prefixes
        # (error bounded by chunk-local magnitudes, the chunk totals
        # cancel structurally, not numerically); a segment spanning
        # chunks — necessarily >= _SEG_CHUNK rows — combines its two
        # partial chunks with the coarse chunk-total prefix, whose
        # granularity matches the segment size.
        order = jnp.argsort(idx)
        si = jnp.take(idx, order)
        sg = jnp.take(g, order, axis=0)
        b_r = si.shape[0]
        nch = -(-b_r // _SEG_CHUNK)
        pad_r = nch * _SEG_CHUNK - b_r
        sg_p = jnp.pad(sg, ((0, pad_r), (0, 0))).reshape(
            nch, _SEG_CHUNK, LANE
        )
        lc = jnp.cumsum(sg_p, axis=1)                 # inclusive, local
        tot = lc[:, -1]                               # (nch, 128)
        # exclusive local prefix at flat position p (+1 virtual row for
        # p == nch*_SEG_CHUNK, whose chunk index is the virtual chunk)
        loc = jnp.concatenate([
            jnp.concatenate(
                [jnp.zeros((nch, 1, LANE), jnp.float32), lc[:, :-1]],
                axis=1,
            ).reshape(nch * _SEG_CHUNK, LANE),
            jnp.zeros((1, LANE), jnp.float32),
        ])
        # exclusive coarse prefix over chunk totals (+ virtual chunk)
        cpre = jnp.concatenate(
            [jnp.zeros((1, LANE), jnp.float32), jnp.cumsum(tot, axis=0)]
        )
        tot = jnp.concatenate([tot, jnp.zeros((1, LANE), jnp.float32)])
        # method='sort' (concatenate + sort) over the default binary-
        # search 'scan': measured 57.6 vs 108.7 ms for 262K targets in
        # 750K sorted keys on v5e — TPU sorts beat TPU dynamic gathers
        targets = jnp.arange(n, dtype=si.dtype)
        lo = jnp.searchsorted(si, targets, side="left", method="sort")
        hi = jnp.searchsorted(si, targets, side="right", method="sort")
        klo, khi = lo // _SEG_CHUNK, hi // _SEG_CHUNK
        loc_lo = jnp.take(loc, lo, axis=0)
        loc_hi = jnp.take(loc, hi, axis=0)
        same = (klo == khi)[:, None]
        cross = (
            (jnp.take(tot, klo, axis=0) - loc_lo)
            + (jnp.take(cpre, khi, axis=0) - jnp.take(cpre, klo + 1, axis=0))
            + loc_hi
        )
        grad = jnp.where(same, loc_hi - loc_lo, cross)
        return grad, None
    nchunks = -(-b // _BWD_CHUNK)
    pad = nchunks * _BWD_CHUNK - b
    # out-of-range index rows one-hot to zero, so padding drops out
    idx_p = jnp.pad(idx, (0, pad), constant_values=n).reshape(
        nchunks, _BWD_CHUNK
    )
    g_p = jnp.pad(g, ((0, pad), (0, 0))).reshape(nchunks, _BWD_CHUNK, LANE)

    def chunk(acc, xs):
        ic, gc = xs
        oh = jax.nn.one_hot(ic, n, dtype=jnp.float32)       # (CH, N)
        return acc + oh.T @ gc, None                         # MXU (N, 128)

    grad, _ = jax.lax.scan(
        chunk, jnp.zeros((n, LANE), jnp.float32), (idx_p, g_p)
    )
    return grad, None


_take_rows_n.defvjp(_take_rows_fwd, _take_rows_bwd)


def _take_rows(tbl: Array, idx: Array) -> Array:
    return _take_rows_n(tbl.shape[0], tbl, idx)


def _cast_f32(t: Array) -> tuple[Array, object]:
    dt = t.dtype
    if dt == jnp.float32:
        return t, None
    return t.astype(jnp.float32), dt


def _uncast(v: Array, dt) -> Array:
    if dt is None:
        return v
    if dt == jnp.bool_:
        return v > 0.5
    if jnp.issubdtype(dt, jnp.integer):
        # int values round-trip exactly through f32 below 2^24
        return jnp.round(v).astype(dt)
    return v.astype(dt)


def gather_channels(tables: Sequence[Array], idx: Array) -> list[Array]:
    """Gather C 1-D tables (same length N) at a shared index vector.

    Returns [tables[c][idx] for c], computed with ONE hardware gather
    for all channels whenever N > SMALL.
    """
    tables = list(tables)
    if not tables:
        return []
    n = tables[0].shape[0]
    c = len(tables)
    if n == 0:
        raise ValueError("gather from empty table")
    if n <= SMALL:
        # XLA's select-tree take path. NOTE (measured, round 2): routing
        # wide small-table lookups through one (N,128) row-gather looks
        # 10ns/ray FASTER in an isolated closest_hit microbenchmark but
        # is 15ns/ray SLOWER inside the real bounce/sample scans
        # (mcworld end-to-end 36 -> 51 ns/ray) — tiny-N row-gathers
        # defeat XLA's in-loop pipelining. Keep per-channel takes.
        return [
            _take_small(t, idx)
            if jnp.issubdtype(t.dtype, jnp.floating)
            else jnp.take(t, idx, axis=0)
            for t in tables
        ]
    if c > LANE:
        out = []
        for k in range(0, c, LANE):
            out.extend(gather_channels(tables[k : k + LANE], idx))
        return out

    cast = [_cast_f32(t) for t in tables]

    if n <= ROW_LIMIT:
        # layout 2: (N, 128), channels on lanes
        tbl = jnp.stack([t for t, _ in cast], axis=1)
        tbl = jnp.pad(tbl, ((0, 0), (0, LANE - c)))
        rows = _take_rows(tbl, idx)                # (B, 128) — ONE gather
        return [
            _uncast(rows[:, i], dt) for i, (_, dt) in enumerate(cast)
        ]

    # layout 3: interleaved — cpad channels x (128 // cpad) entries/row
    cpad = 1
    while cpad < c:
        cpad *= 2
    per_row = LANE // cpad
    n_rows = -(-n // per_row)
    stacked = jnp.stack([t for t, _ in cast], axis=1)  # (N, C)
    stacked = jnp.pad(
        stacked, ((0, n_rows * per_row - n), (0, cpad - c))
    )  # (n_rows*per_row, cpad)
    tbl = stacked.reshape(n_rows, LANE)
    row = idx // per_row
    slot = idx % per_row                                # entry within row
    rows = _take_rows(tbl, row)                         # (B, 128)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1)
    base = slot[:, None] * cpad
    out = []
    for i, (_, dt) in enumerate(cast):
        v = jnp.sum(jnp.where(lane_ids == base + i, rows, 0.0), axis=1)
        out.append(_uncast(v, dt))
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _take_packed_n(
    n: int, r: Array, g: Array, b: Array, a: Array,
    packed: Array, idx: Array,
):
    """Fetch (r, g, b, a)[idx] from the u8-packed uint32 atlas table.

    ``packed`` is the (n_rows, 128) table built by io.obj.pack_rgba_u8;
    the forward never touches the f32 channels — one uint32 row-gather
    + integer lane-select + byte unpack + a correctly-rounded
    ``n * f32(1/255)`` reconstructs them bit-exactly at a quarter of
    the f32 layout's bytes. That keeps very large atlases (pyramide_eau:
    9.2M texels = 147MB as f32, 37MB packed) inside the fast gather
    regime: measured on v5e, the f32 layout-3 path runs 344 ns/ray on
    that scene vs 14 with a VMEM-sized table.

    Differentiable w.r.t. the f32 channels (scatter-add backward; slow
    serial TPU scatter, acceptable because big-atlas texture training is
    off the hot path).
    """
    del r, g, b, a
    rows = jnp.take(packed, idx // LANE, axis=0)          # (B, 128)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1)
    slot = (idx % LANE)[:, None]
    v = jnp.sum(
        jnp.where(lane_ids == slot, rows, jnp.uint32(0)), axis=1
    )
    inv = jnp.float32(1.0 / 255.0)
    out = tuple(
        ((v >> jnp.uint32(8 * k)) & jnp.uint32(0xFF)).astype(jnp.float32)
        * inv
        for k in range(4)
    )
    return out


def _take_packed_fwd(n, r, g, b, a, packed, idx):
    return _take_packed_n(n, r, g, b, a, packed, idx), idx


def _take_packed_bwd(n, idx, ct):
    grads = tuple(
        jnp.zeros((n,), jnp.float32).at[idx].add(c) for c in ct
    )
    return (*grads, None, None)


_take_packed_n.defvjp(_take_packed_fwd, _take_packed_bwd)


def take_packed_rgba(
    r: Array, g: Array, b: Array, a: Array, packed: Array, idx: Array
):
    return _take_packed_n(r.shape[0], r, g, b, a, packed, idx)


def pack_rgba_u8_traced(
    r: Array, g: Array, b: Array, a: Array
) -> tuple[Array, Array]:
    """In-graph twin of io.obj.pack_rgba_u8: build the u8-packed uint32
    row-gather table from LIVE channel values, plus a scalar validity
    flag (all four channels exactly ``n * f32(1/255)``).

    This is how training loops keep the packed fast path without a stale
    cache (VERDICT r4 next #3): combine_scene drops the load-time packed
    twin (it would go stale after optimizer steps), and the fetch site
    rebuilds it HERE from the current rgb — an unmutated u8-exact sky
    packs to the identical table (bit-exact fetch, `valid` true), while
    a mutated sky fails the exactness check and the caller's lax.cond
    takes the exact f32 gather instead. The pack is O(texels) elementwise
    work on values the render already holds; XLA hoists it out of the
    per-sample scan because it depends only on the scene.
    """
    valid = jnp.bool_(True)
    codes = []
    inv = jnp.float32(1.0 / 255.0)
    for c in (r, g, b, a):
        n = jnp.clip(jnp.round(c * 255.0), 0.0, 255.0)
        # in-range + exact round-trip, matching the host-side packer's
        # rejection rules (NaN fails both equalities)
        valid = valid & jnp.all(jnp.round(c * 255.0) == n)
        valid = valid & jnp.all(n * inv == c)
        codes.append(n.astype(jnp.uint32))
    v = (
        codes[0]
        | (codes[1] << jnp.uint32(8))
        | (codes[2] << jnp.uint32(16))
        | (codes[3] << jnp.uint32(24))
    )
    n_rows = -(-v.shape[0] // LANE)
    v = jnp.pad(v, (0, n_rows * LANE - v.shape[0]))
    return v.reshape(n_rows, LANE), valid


def gather1d(table: Array, idx: Array) -> Array:
    """table (N,), idx (...,) int -> table[idx]; TPU-fast in compile AND
    runtime. Prefer gather_channels when several tables share the index."""
    if table.ndim != 1:
        return jnp.take(table, idx, axis=0)
    return gather_channels([table], idx)[0]
