"""OBJ/MTL mesh loading into SoA scene arrays.

Python reimplementation of the reference's asset pipeline (a native C++
fast path with identical semantics lives in raytpu/native — see
raytpu.io.native):
  * list_of_mesh (/root/reference/mesh.h:96-218): four-pass OBJ parse —
    count faces/usemtl, count v/vt, read vertices+UVs, read faces with
    1-based ``f v/t/n`` indices; each ``usemtl`` occurrence opens a new
    material slot (duplicate names get duplicate slots, exactly like the
    reference's nbMaterial = usemtl line count).
  * tex_path_from_mtl (/root/reference/rtutility.h:233-290): looks up
    ``map_Kd`` under ``newmtl <name>``, resolves relative to the MTL's
    directory, strips a leading "./".
  * create_mat_list_mtl (/root/reference/texture.h:175-354): loads each
    material's texture + alpha companion into one shared-size atlas.
  * move_mesh (/root/reference/mesh.h:220-234): whole-mesh translation.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from raytpu.core.types import (
    MatTable,
    Scene,
    SkyTexture,
    Spheres,
    TextureAtlas,
    Triangles,
)
from raytpu.core.vec3 import Vec3
from raytpu.io.image import load_texture_pair


class ObjMesh(NamedTuple):
    vertices: np.ndarray    # (V, 3) f32
    uvs: np.ndarray         # (VT, 2) f32
    face_v: np.ndarray      # (T, 3) int32, 0-based vertex indices
    face_t: np.ndarray      # (T, 3) int32, 0-based uv indices (-1 = none)
    face_mat: np.ndarray    # (T,) int32 material slot per face
    mat_names: list         # usemtl name per slot (duplicates preserved)


def parse_obj(path: str, use_native: bool = True) -> ObjMesh:
    """list_of_mesh's parse (mesh.h:96-218), single pass.

    Uses the C++ fast path (raytpu.native) when available; set
    RAYTPU_NO_NATIVE=1 or use_native=False to force this pure-Python
    reference implementation. Both are tested for exact agreement.
    """
    if use_native and os.environ.get("RAYTPU_NO_NATIVE") != "1":
        from raytpu.native import parse_obj_native

        mesh = parse_obj_native(path)
        if mesh is not None:
            return mesh
    vertices, uvs = [], []
    face_v, face_t, face_mat = [], [], []
    mat_names: list = []
    cur_mat = -1  # faces before any usemtl get -1, like path_mat_ind (mesh.h:167)

    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                p = line.split()
                vertices.append((float(p[1]), float(p[2]), float(p[3])))
            elif line.startswith("vt"):
                p = line.split()
                uvs.append((float(p[1]), float(p[2])))
            elif line.startswith("usemtl"):
                mat_names.append(line[6:].strip())
                cur_mat += 1
            elif line.startswith("f "):
                p = line.split()[1:]
                if len(p) < 3:
                    continue
                # reference supports triangles only ("le mesh doit etre
                # triangulaire", README.md:81); fan-triangulate defensively
                idx = []
                for tok in p:
                    parts = tok.split("/")
                    vi = int(parts[0])
                    ti = (
                        int(parts[1])
                        if len(parts) > 1 and parts[1] != ""
                        else 0
                    )
                    idx.append((vi - 1, ti - 1))
                for k in range(1, len(idx) - 1):
                    tri = (idx[0], idx[k], idx[k + 1])
                    face_v.append(tuple(t[0] for t in tri))
                    face_t.append(tuple(t[1] for t in tri))
                    face_mat.append(cur_mat)

    return ObjMesh(
        vertices=np.asarray(vertices, np.float32).reshape(-1, 3),
        uvs=np.asarray(uvs, np.float32).reshape(-1, 2),
        face_v=np.asarray(face_v, np.int32).reshape(-1, 3),
        face_t=np.asarray(face_t, np.int32).reshape(-1, 3),
        face_mat=np.asarray(face_mat, np.int32),
        mat_names=mat_names,
    )


def tex_path_from_mtl(mtl_path: str, material_name: str) -> Optional[str]:
    """rtutility.h:233-290: find map_Kd under newmtl <name>, resolve
    relative to the mtl's directory, strip a leading './'."""
    return parse_mtl(mtl_path).get(material_name, {}).get("map_kd")


def parse_mtl(mtl_path: str) -> dict:
    """Full MTL material table: name -> {map_kd, kd, ns, d}.

    The CPU reference only reads map_Kd (rtutility.h:233-290); the CUDA
    fork additionally consumes the material's diffuse color and
    shininess via assimp (triangle.hu:104-130: aiGetMaterialColor
    DIFFUSE, SHININESS/100 -> reflectionStrength). Parsing Kd/Ns/d here
    unifies both: untextured materials render with their MTL diffuse
    (as solid atlas tiles) instead of a hardcoded default.
    """
    mtl_dir = os.path.dirname(mtl_path)
    mats: dict = {}
    cur = None
    with open(mtl_path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "newmtl":
                cur = {"map_kd": None, "kd": None, "ns": None, "d": None}
                mats[line[7:].strip()] = cur
            elif cur is None:
                continue
            elif parts[0] == "map_Kd":
                tex = line.split(None, 1)[1].strip()
                if tex.startswith("./"):
                    tex = tex[2:]
                cur["map_kd"] = os.path.join(mtl_dir, tex)
            elif parts[0] == "Kd" and len(parts) >= 4:
                cur["kd"] = (float(parts[1]), float(parts[2]), float(parts[3]))
            elif parts[0] == "Ns" and len(parts) >= 2:
                cur["ns"] = float(parts[1])
            elif parts[0] == "d" and len(parts) >= 2:
                cur["d"] = float(parts[1])
    return mats


def collapse_factor(tiles: Sequence[np.ndarray], h: int, w: int) -> int:
    """Largest k dividing both (h, w) such that every array in ``tiles``
    (shape (h, w) or (h, w, C)) is constant on k x k blocks — i.e. the
    textures are nearest-neighbor upscales of an (h/k, w/k) original
    (common for pixel-art assets: the reference's grass_block PNG is
    1920x1440 but constant on 30x30 blocks, a 16x16-per-face Minecraft
    texture). Collapsing by k is BIT-EXACT under nearest sampling:
    x = floor(u*w) then texel x maps to collapsed texel x//k, and
    floor(floor(u*w)/k) == floor(u*(w/k)) for integer k | w."""
    import math

    k = math.gcd(h, w)
    while k > 1:
        if h % k == 0 and w % k == 0:
            ok = True
            for t in tiles:
                v = t.reshape(h // k, k, w // k, k, -1)
                if not (v == v[:, :1, :, :1]).all():
                    ok = False
                    break
            if ok:
                return k
        # next smaller divisor of gcd(h, w)
        k -= 1
        while k > 1 and (h % k or w % k):
            k -= 1
    return 1


def build_atlas(
    tex_paths: Sequence[Optional[str]],
    fallback_colors: Optional[Sequence] = None,
    fallback_alphas: Optional[Sequence] = None,
    collapse: bool = True,
) -> TextureAtlas:
    """create_mat_list_mtl (texture.h:175-354): one flat atlas; all
    textures must share one (W, H) (texture.h:221). Materials without a
    texture get a solid tile of their MTL Kd color (``fallback_colors``)
    — the CUDA fork's per-material diffuse (triangle.hu:104-117) —
    defaulting to the SKY-ish constant the CPU path would produce.

    ``collapse``: drop nearest-upscaled textures to their true resolution
    (collapse_factor) — bit-exact for the nearest fetch and often the
    difference between the megakernel's in-VMEM texture bounds and the
    scan path (grass_block: 2.76M texels -> 3072). Pass False when
    bilinear filtering is enabled (filtering at collapsed resolution
    widens the interpolation footprint)."""
    rgbs, alphas = [], []
    pending: list[int] = []
    shape = None
    def q8(v):
        # solid tiles quantize to the u8 lattice so the whole atlas
        # stays exactly u8-representable (enables the packed table
        # below); <= 1/510 from the raw MTL float, invisible at 8-bit
        # output depth
        return float(
            np.float32(round(min(max(float(v), 0.0), 1.0) * 255))
            * np.float32(1.0 / 255.0)
        )

    for i, p in enumerate(tex_paths):
        if p is None:
            fc = fallback_colors[i] if fallback_colors else None
            color = (
                tuple(q8(c) for c in fc)
                if fc is not None
                else (q8(0.784),) * 3
            )
            fa = fallback_alphas[i] if fallback_alphas else None
            a_val = q8(fa) if fa is not None else 1.0
            if shape is None:
                pending.append(len(rgbs))
                rgbs.append(color)       # placeholder, expanded below
                alphas.append(a_val)
                continue
            rgb = np.full(shape + (3,), color, np.float32)
            alpha = np.full(shape, a_val, np.float32)
        else:
            rgb, alpha = load_texture_pair(p)
            if shape is None:
                shape = rgb.shape[:2]
                for j in pending:
                    rgbs[j] = np.full(shape + (3,), rgbs[j], np.float32)
                    alphas[j] = np.full(shape, alphas[j], np.float32)
                pending.clear()
            elif rgb.shape[:2] != shape:
                raise ValueError(
                    f"atlas textures must share one size (texture.h:221): "
                    f"{p} is {rgb.shape[:2]}, expected {shape}"
                )
        rgbs.append(rgb)
        alphas.append(alpha)
    if shape is None:
        # no textures at all: 1x1 solid tiles
        shape = (1, 1)
        for j in pending:
            rgbs[j] = np.asarray(rgbs[j], np.float32).reshape(1, 1, 3)
            alphas[j] = np.asarray(alphas[j], np.float32).reshape(1, 1)
        pending.clear()
    h, w = shape
    if collapse and (h > 1 or w > 1):
        k = collapse_factor(rgbs + alphas, h, w)
        if k > 1:
            rgbs = [t[::k, ::k] for t in rgbs]
            alphas = [t[::k, ::k] for t in alphas]
            h, w = h // k, w // k
    rgb_flat = np.concatenate([t.reshape(-1, 3) for t in rgbs], 0)
    alpha_flat = np.concatenate([t.reshape(-1) for t in alphas], 0)
    return TextureAtlas(
        rgb=Vec3(
            jnp.asarray(rgb_flat[:, 0]),
            jnp.asarray(rgb_flat[:, 1]),
            jnp.asarray(rgb_flat[:, 2]),
        ),
        alpha=jnp.asarray(alpha_flat),
        width=w,
        height=h,
        packed=pack_rgba_u8(
            rgb_flat[:, 0], rgb_flat[:, 1], rgb_flat[:, 2], alpha_flat
        ),
    )


def pack_rgba_u8(r, g, b, a):
    """u8-pack four f32 channels into a (ceil(N/128), 128) uint32
    row-gather table (r | g<<8 | b<<16 | a<<24), or None if any value is
    not exactly ``n * f32(1/255)`` (see TextureAtlas.packed). Host-side
    numpy; called once at scene load."""
    chans = [np.asarray(c, np.float32) for c in (r, g, b, a)]
    codes = []
    for c in chans:
        n = np.rint(c * 255.0).astype(np.int64)
        if (n < 0).any() or (n > 255).any():
            return None
        if not (n.astype(np.float32) * np.float32(1.0 / 255.0) == c).all():
            return None
        codes.append(n.astype(np.uint32))
    v = codes[0] | (codes[1] << 8) | (codes[2] << 16) | (codes[3] << 24)
    n_rows = -(-v.size // 128)
    v = np.pad(v, (0, n_rows * 128 - v.size))
    return jnp.asarray(v.reshape(n_rows, 128))


def mesh_to_triangles(
    mesh: ObjMesh, translate=(0.0, 0.0, 0.0)
) -> Triangles:
    """Assemble Triangles SoA (mesh.h:197-207) + move_mesh translation
    (mesh.h:220-234). Faces before any usemtl clamp to slot 0 (the
    reference would index with -1 — undefined behavior we don't copy)."""
    off = np.asarray(translate, np.float32)
    v = mesh.vertices + off
    tri_v = v[mesh.face_v]        # (T, 3, 3)
    has_uv = mesh.uvs.shape[0] > 0
    if has_uv:
        uv_idx = np.clip(mesh.face_t, 0, mesh.uvs.shape[0] - 1)
        tri_uv = mesh.uvs[uv_idx]  # (T, 3, 2)
        tri_uv = np.where(mesh.face_t[..., None] >= 0, tri_uv, 0.0)
    else:
        tri_uv = np.zeros(mesh.face_v.shape + (2,), np.float32)
    mat_id = np.maximum(mesh.face_mat, 0)

    def vec(i):
        return Vec3(
            jnp.asarray(tri_v[:, i, 0]),
            jnp.asarray(tri_v[:, i, 1]),
            jnp.asarray(tri_v[:, i, 2]),
        )

    return Triangles(
        a=vec(0), b=vec(1), c=vec(2),
        ua=jnp.asarray(tri_uv[:, 0, 0]), va=jnp.asarray(tri_uv[:, 0, 1]),
        ub=jnp.asarray(tri_uv[:, 1, 0]), vb=jnp.asarray(tri_uv[:, 1, 1]),
        uc=jnp.asarray(tri_uv[:, 2, 0]), vc=jnp.asarray(tri_uv[:, 2, 1]),
        mat_id=jnp.asarray(mat_id, jnp.int32),
    )


def load_obj_scene(
    obj_path: str,
    mtl_path: Optional[str] = None,
    translate=(0.0, 0.0, 0.0),
    spheres: Optional[Spheres] = None,
    mat_table: Optional[MatTable] = None,
    with_textures: bool = True,
) -> Scene:
    """The init() of this framework (SURVEY.md §3.3): OBJ + MTL + textures
    -> Scene. ``mat_table=None`` uses neutral defaults;
    MatTable.reference_overrides reproduces texture.h:71-88."""
    mesh = parse_obj(obj_path)
    tris = mesh_to_triangles(mesh, translate)

    n_mat = max(len(mesh.mat_names), 1)
    if with_textures and mtl_path is not None and mesh.mat_names:
        mtl = parse_mtl(mtl_path)
        entries = [mtl.get(n, {}) for n in mesh.mat_names]
        atlas = build_atlas(
            [e.get("map_kd") for e in entries],
            fallback_colors=[e.get("kd") for e in entries],
            fallback_alphas=[e.get("d") for e in entries],
        )
    else:
        atlas = TextureAtlas.empty()

    if mat_table is None:
        mat_table = MatTable.default(n_mat)

    return Scene(
        spheres=spheres if spheres is not None else Spheres.empty(),
        triangles=tris,
        atlas=atlas,
        mat_table=mat_table,
        sky=SkyTexture.empty(),
    )


def load_sky(path: str) -> SkyTexture:
    """Equirect sky texture (create_mat_list on the sky file, main.c:374)."""
    from raytpu.io.image import load_rgb

    rgb = load_rgb(path)
    h, w = rgb.shape[:2]
    flat = rgb.reshape(-1, 3)
    # packed u8 twin for the fast sky fetch (SkyTexture.packed): PNG/PPM
    # sources are u8-exact, so this is bit-identical to the f32 gather
    packed = pack_rgba_u8(
        flat[:, 0], flat[:, 1], flat[:, 2], np.ones(flat.shape[0], np.float32)
    )
    return SkyTexture(
        rgb=Vec3(
            jnp.asarray(flat[:, 0]), jnp.asarray(flat[:, 1]), jnp.asarray(flat[:, 2])
        ),
        packed=jnp.asarray(packed) if packed is not None else None,
        width=w,
        height=h,
    )
