"""PLY/STL importers (the CUDA fork's assimp surface,
/root/reference/triangle.hu:61-167) against generated fixtures and the
OBJ parser on equivalent geometry."""

import struct

import numpy as np
import pytest

from raytpu.io.mesh_formats import parse_mesh, parse_ply, parse_stl
from raytpu.io.obj import mesh_to_triangles

TRI = [(0, 0, 0), (1, 0, 0), (0, 1, 0)]
QUAD = [(0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1)]


def test_stl_ascii(tmp_path):
    p = tmp_path / "t.stl"
    p.write_text(
        "solid tri\n facet normal 0 0 1\n  outer loop\n"
        + "".join(f"   vertex {x} {y} {z}\n" for x, y, z in TRI)
        + "  endloop\n endfacet\nendsolid tri\n"
    )
    m = parse_stl(str(p))
    assert m.face_v.shape == (1, 3)
    np.testing.assert_allclose(m.vertices, np.float32(TRI))
    assert (m.face_mat == -1).all() and m.mat_names == []


def test_stl_binary(tmp_path):
    p = tmp_path / "b.stl"
    tris = [TRI, [(2, 0, 0), (3, 0, 0), (2, 1, 0)]]
    blob = b"\x00" * 80 + struct.pack("<I", len(tris))
    for t in tris:
        blob += struct.pack("<3f", 0, 0, 1)
        for v in t:
            blob += struct.pack("<3f", *v)
        blob += struct.pack("<H", 0)
    p.write_bytes(blob)
    m = parse_stl(str(p))
    assert m.face_v.shape == (2, 3)
    np.testing.assert_allclose(m.vertices.reshape(2, 3, 3), np.float32(tris))


def test_stl_binary_with_solid_prefix(tmp_path):
    """Binary STLs written with a 'solid' header string must not be
    misparsed as ASCII."""
    p = tmp_path / "s.stl"
    blob = b"solid but binary" + b"\x00" * 64 + struct.pack("<I", 1)
    blob += struct.pack("<3f", 0, 0, 1)
    for v in TRI:
        blob += struct.pack("<3f", *v)
    blob += struct.pack("<H", 0)
    p.write_bytes(blob)
    m = parse_stl(str(p))
    assert m.face_v.shape == (1, 3)


def _ply_ascii(with_uv: bool) -> str:
    props = "property float x\nproperty float y\nproperty float z\n"
    if with_uv:
        props += "property float s\nproperty float t\n"
    verts = ""
    for i, (x, y, z) in enumerate(QUAD):
        verts += f"{x} {y} {z}"
        if with_uv:
            verts += f" {i * 0.25} {1 - i * 0.25}"
        verts += "\n"
    return (
        "ply\nformat ascii 1.0\ncomment generated\n"
        f"element vertex {len(QUAD)}\n{props}"
        "element face 1\nproperty list uchar int vertex_indices\n"
        "end_header\n" + verts + "4 0 1 2 3\n"
    )


def test_ply_ascii_quad_fan(tmp_path):
    p = tmp_path / "q.ply"
    p.write_text(_ply_ascii(with_uv=True))
    m = parse_ply(str(p))
    # the quad fan-triangulates exactly like the OBJ parser
    np.testing.assert_array_equal(m.face_v, [[0, 1, 2], [0, 2, 3]])
    np.testing.assert_allclose(m.uvs[:, 0], [0, 0.25, 0.5, 0.75])
    tris = mesh_to_triangles(m)
    assert tris.a.x.shape == (2,)


def test_ply_binary_matches_ascii(tmp_path):
    pa = tmp_path / "a.ply"
    pa.write_text(_ply_ascii(with_uv=False))
    ma = parse_ply(str(pa))

    pb = tmp_path / "b.ply"
    blob = (
        b"ply\nformat binary_little_endian 1.0\n"
        b"element vertex 4\n"
        b"property float x\nproperty float y\nproperty float z\n"
        b"element face 1\nproperty list uchar int vertex_indices\n"
        b"end_header\n"
    )
    for v in QUAD:
        blob += struct.pack("<3f", *v)
    blob += struct.pack("<B4i", 4, 0, 1, 2, 3)
    pb.write_bytes(blob)
    mb = parse_ply(str(pb))
    np.testing.assert_array_equal(ma.vertices, mb.vertices)
    np.testing.assert_array_equal(ma.face_v, mb.face_v)


def test_parse_mesh_routes_by_extension(tmp_path):
    p = tmp_path / "t.stl"
    p.write_text(
        "solid s\nfacet normal 0 0 1\nouter loop\n"
        + "".join(f"vertex {x} {y} {z}\n" for x, y, z in TRI)
        + "endloop\nendfacet\nendsolid s\n"
    )
    assert parse_mesh(str(p)).face_v.shape == (1, 3)
    # .obj routes to the existing parser
    o = tmp_path / "t.obj"
    o.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    assert parse_mesh(str(o)).face_v.shape == (1, 3)


def test_ply_scene_spec_end_to_end(tmp_path):
    """A TOML scene spec can point [mesh].obj at a .ply and render."""
    import jax

    from raytpu.config import load_scene_file
    from raytpu.integrator.render import render_image

    (tmp_path / "m.ply").write_text(_ply_ascii(with_uv=False))
    (tmp_path / "s.toml").write_text(
        '[render]\nwidth = 10\nheight = 8\nspp = 2\nbounces = 2\n'
        '[camera]\norigin = [0.5, 0.5, 4.0]\ntarget = [0.5, 0.5, 0.0]\n'
        '[mesh]\nobj = "m.ply"\n'
        '[[spheres]]\ncenter = [0, 0, 0]\nradius = 1e4\n'
        'emission = [1, 1, 1]\nemission_strength = 1.0\n'
    )
    scene, cam, cfg = load_scene_file(str(tmp_path / "s.toml"))
    assert scene.triangles.count == 2
    out = render_image(scene, cam, cfg, jax.random.PRNGKey(0))
    assert np.isfinite(out.image).all()


# ---------------------------------------------------------------------------
# glTF (COMPONENTS.md 2.21: the assimp surface's remaining format)
# ---------------------------------------------------------------------------
def _gltf_quad_json(data_uri: bool = True):
    """Two-triangle quad: positions, UVs, u16 indices, one material, and a
    node translation of (1, 2, 3) so the transform chain is exercised."""
    import base64
    import json

    pos = np.float32([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]])
    uv = np.float32([[0, 0], [1, 0], [1, 1], [0, 1]])
    idx = np.uint16([0, 1, 2, 0, 2, 3])
    blob = pos.tobytes() + uv.tobytes() + idx.tobytes()
    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0, "translation": [1, 2, 3]}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "TEXCOORD_0": 1},
            "indices": 2, "material": 0,
        }]}],
        "materials": [{"name": "base"}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4,
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 4,
             "type": "VEC2"},
            {"bufferView": 2, "componentType": 5123, "count": 6,
             "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 48},
            {"buffer": 0, "byteOffset": 48, "byteLength": 32},
            {"buffer": 0, "byteOffset": 80, "byteLength": 12},
        ],
        "buffers": [{"byteLength": len(blob)}],
    }
    if data_uri:
        gltf["buffers"][0]["uri"] = (
            "data:application/octet-stream;base64,"
            + base64.b64encode(blob).decode()
        )
        return json.dumps(gltf), blob
    return json.dumps(gltf), blob


def test_gltf_json(tmp_path):
    from raytpu.io.mesh_formats import parse_gltf

    js, _ = _gltf_quad_json()
    p = tmp_path / "q.gltf"
    p.write_text(js)
    m = parse_gltf(str(p))
    assert m.face_v.shape == (2, 3)
    # node translation applied to positions
    np.testing.assert_allclose(m.vertices[0], [1, 2, 3])
    np.testing.assert_allclose(m.vertices[2], [2, 3, 3])
    np.testing.assert_allclose(m.uvs[2], [1, 1])
    assert (m.face_mat == 0).all() and m.mat_names == ["base"]
    # fan winding preserved: (0,1,2) and (0,2,3)
    np.testing.assert_array_equal(m.face_v, [[0, 1, 2], [0, 2, 3]])
    tris = mesh_to_triangles(m)
    assert int(tris.count) == 2


def test_glb_binary(tmp_path):
    from raytpu.io.mesh_formats import parse_gltf

    js, blob = _gltf_quad_json(data_uri=False)
    jb = js.encode()
    jb += b" " * (-len(jb) % 4)
    bb = blob + b"\0" * (-len(blob) % 4)
    glb = (
        struct.pack("<4sII", b"glTF", 2, 12 + 8 + len(jb) + 8 + len(bb))
        + struct.pack("<II", len(jb), 0x4E4F534A) + jb
        + struct.pack("<II", len(bb), 0x004E4942) + bb
    )
    p = tmp_path / "q.glb"
    p.write_bytes(glb)
    m = parse_gltf(str(p))
    assert m.face_v.shape == (2, 3)
    np.testing.assert_allclose(m.vertices[0], [1, 2, 3])
    # parse_mesh routes .glb
    assert parse_mesh(str(p)).face_v.shape == (2, 3)


def test_gltf_scene_spec_end_to_end(tmp_path):
    """A TOML scene spec can point [mesh].obj at a .gltf and render."""
    import jax

    from raytpu.config import load_scene_file
    from raytpu.integrator.render import render_image

    js, _ = _gltf_quad_json()
    (tmp_path / "q.gltf").write_text(js)
    (tmp_path / "s.toml").write_text(
        '[render]\nwidth = 10\nheight = 8\nspp = 2\nbounces = 2\n'
        '[camera]\norigin = [1.5, 2.5, 7.0]\ntarget = [1.5, 2.5, 3.0]\n'
        '[mesh]\nobj = "q.gltf"\n'
        '[[spheres]]\ncenter = [0, 0, 0]\nradius = 1e4\n'
        'emission = [1, 1, 1]\nemission_strength = 1.0\n'
    )
    scene, cam, cfg = load_scene_file(str(tmp_path / "s.toml"))
    assert scene.triangles.count == 2
    out = render_image(scene, cam, cfg, jax.random.PRNGKey(0))
    assert np.isfinite(out.image).all()
