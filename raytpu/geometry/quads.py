"""Parallelogram (quad) merging of coplanar triangle pairs.

Block-world exports — the reference's flagship meshes
(/root/reference/model3D/RTX_MAP/mcworld/mineways_tri.obj and friends,
loaded via mesh.h:96-218) — triangulate every rectangular face into two
coplanar triangles sharing a diagonal. The mesh megakernel's closest-hit
loop is VPU-compute-bound at ~60 vector-op slots per (ray, triangle)
pair (ROADMAP r2 ablation), so testing the *rectangle* once instead of
its two halves nearly halves the dominant cost: one plane equation, one
(alpha, beta) parallelogram-coordinate solve, validity = the unit
square, and the winning HALF recovered from the diagonal side
(alpha + beta <= 1) so the recorded winner stays an ORIGINAL TRIANGLE
INDEX — texturing, shading, and the index-replay backward pass are
untouched.

Detection is geometric and material-blind: materials/UVs live on the
recovered triangle, so two halves with different materials still merge.
(For such mixed-material pairs, hits inside the ~tri_eps diagonal crack
the per-triangle reference test leaves attribute to half i's material
via the pu+pv<=det split — a deliberate, tested divergence bounded by
the allclose tests' outlier budget; see trace_scene.py's quad_body.)
Measured pairing on the shipped scenes (tests/test_quad_merge.py):
mcworld 606 tris -> 266 rects + 74 leftovers, caverne 762 -> 380 + 2,
grass_block 12 -> 6 + 0, pyramide_eau 34 -> 9 + 16, pyramide 6 -> 1 + 4,
tree (organic mesh) 0 pairs.

Semantics note: the rectangle test accepts the ~1e-7-wide epsilon crack
the reference leaves along the shared diagonal (each half demands its
own barycentrics >= tri_eps, mesh.h:88, so a sliver between them hits
neither), and its t/validity arithmetic rounds differently at the last
ulp, so the merged path is validated by allclose + winner-agreement
tests against the scan integrator (tests/test_quad_merge.py), not by
bit-identity; `merge_quads = false` in a scene spec (or
RenderConfig.merge_quads=False) keeps the bit-identical per-triangle
loop.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np


def detect_quad_pairs(
    ax, ay, az, bx, by, bz, cx, cy, cz,
) -> tuple[tuple[int, int, int], ...]:
    """Find disjoint triangle pairs forming parallelograms.

    Inputs are concrete (numpy-able) per-triangle vertex coordinate
    arrays. Returns a tuple of ``(i, j, oi)`` where triangles ``i`` and
    ``j`` share an edge that is the parallelogram's diagonal, ``oi`` is
    the index (0..2) of triangle ``i``'s vertex opposite the shared
    edge, and both of:

      * closure: ``opp_i + opp_j == s1 + s2`` exactly in float64 (the
        midpoint of the shared diagonal is the midpoint of the other
        diagonal — the parallelogram condition), so the rectangle
        spans exactly the union of the two triangles;
      * consistent winding: ``n_i . n_j > 0`` — the reference backface-
        culls (det >= 1e-6, mesh.h:88), so halves facing opposite ways
        must not merge into one single-sided rectangle.

    Pairing is greedy per shared edge; each triangle joins at most one
    pair. Runs on the host at scene-load time (raytpu/config.py) — the
    result is a static tuple carried on RenderConfig so the kernel can
    slice scene arrays with constant indices under jit.
    """
    V = np.stack(
        [
            np.stack([np.asarray(ax, np.float64), np.asarray(ay, np.float64),
                      np.asarray(az, np.float64)], -1),
            np.stack([np.asarray(bx, np.float64), np.asarray(by, np.float64),
                      np.asarray(bz, np.float64)], -1),
            np.stack([np.asarray(cx, np.float64), np.asarray(cy, np.float64),
                      np.asarray(cz, np.float64)], -1),
        ],
        axis=1,
    )  # (T, 3 verts, 3)
    n_tris = V.shape[0]
    normals = np.cross(V[:, 1] - V[:, 0], V[:, 2] - V[:, 0])

    edges: dict = defaultdict(list)
    for i in range(n_tris):
        vs = [tuple(V[i, k]) for k in range(3)]
        for e in range(3):
            v1, v2 = vs[(e + 1) % 3], vs[(e + 2) % 3]
            key = (min(v1, v2), max(v1, v2))
            edges[key].append((i, e))  # e = opposite-vertex slot

    used = np.zeros(n_tris, bool)
    pairs = []
    for (s1, s2), lst in edges.items():
        if len(lst) < 2:
            continue
        mid2 = np.asarray(s1) + np.asarray(s2)
        for x in range(len(lst)):
            i, oi = lst[x]
            if used[i]:
                continue
            for y in range(x + 1, len(lst)):
                j, oj = lst[y]
                if used[j] or j == i:
                    continue
                if not np.array_equal(V[i, oi] + V[j, oj], mid2):
                    continue
                if float(np.dot(normals[i], normals[j])) <= 0.0:
                    continue
                used[i] = used[j] = True
                pairs.append((i, j, oi))
                break
    return tuple(sorted(pairs))


def leftover_indices(n_tris: int, pairs) -> tuple[int, ...]:
    """Triangle indices not absorbed into any pair, in original order."""
    used = set()
    for i, j, _ in pairs:
        used.add(i)
        used.add(j)
    return tuple(k for k in range(n_tris) if k not in used)


def classify_axis_aligned(
    ax, ay, az, bx, by, bz, cx, cy, cz, pairs,
) -> tuple[tuple, tuple]:
    """Static host-side classification for the kernel's axis-aligned
    fast loops (block-world exports are overwhelmingly axis-aligned:
    mcworld 256/266 rects + 43/74 leftover tris, caverne 379/380).

    Returns ``(rect_classes, tri_classes)``:

      * rect_classes: tuple parallel to ``pairs`` — ``()`` for a general
        parallelogram, or ``(k, s, m)`` for an axis-aligned rectangle:
        normal along axis ``k`` with sign ``s`` (±1), ``e1`` along
        in-plane axis slot ``m`` (0 = the lower-numbered in-plane axis,
        1 = the higher). Axis-aligned means the normal AND both edges
        each have exactly one nonzero component (exact f32 zeros — true
        for Mineways/Minecraft exports).
      * tri_classes: tuple of ``(tri_index, k, s)`` for UNPAIRED
        triangles whose normal is axis-aligned (edges arbitrary
        in-plane).

    Like detect_quad_pairs this runs on concrete arrays at scene-load
    time; the result is static on RenderConfig so the kernel can build
    per-(k, s) groups with static loop bounds.
    """
    V = np.stack(
        [
            np.stack([np.asarray(ax, np.float64), np.asarray(ay, np.float64),
                      np.asarray(az, np.float64)], -1),
            np.stack([np.asarray(bx, np.float64), np.asarray(by, np.float64),
                      np.asarray(bz, np.float64)], -1),
            np.stack([np.asarray(cx, np.float64), np.asarray(cy, np.float64),
                      np.asarray(cz, np.float64)], -1),
        ],
        axis=1,
    )
    rect_classes = []
    for (i, j, oi) in pairs:
        a = V[i, oi]
        e1 = V[i, (oi + 1) % 3] - a
        e2 = V[i, (oi + 2) % 3] - a
        n = np.cross(e1, e2)
        nz = np.nonzero(n)[0]
        if (
            len(nz) == 1
            and np.count_nonzero(e1) == 1
            and np.count_nonzero(e2) == 1
        ):
            k = int(nz[0])
            s = 1 if n[k] > 0 else -1
            i1 = [a_ for a_ in range(3) if a_ != k][0]
            rect_classes.append((k, s, 0 if e1[i1] != 0 else 1))
        else:
            rect_classes.append(())
    tri_classes = []
    for t in leftover_indices(V.shape[0], pairs):
        n = np.cross(V[t, 1] - V[t, 0], V[t, 2] - V[t, 0])
        nz = np.nonzero(n)[0]
        if len(nz) == 1:
            tri_classes.append((t, int(nz[0]), 1 if n[nz[0]] > 0 else -1))
    return tuple(rect_classes), tuple(tri_classes)
