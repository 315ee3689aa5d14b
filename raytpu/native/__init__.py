"""ctypes bindings + on-demand build for the C++ asset loaders.

``load()`` returns the shared library, compiling it with g++ the first
time (cached next to the source). Returns None when no toolchain is
available — callers (raytpu.io.obj / raytpu.io.ppm) fall back to the
pure-Python parsers, which are the semantic reference.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "raytpu_native.cpp")
_SO = os.path.join(_DIR, "_raytpu_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
        "-o", _SO, _SRC,
    ]
    try:
        subprocess.run(
            cmd, check=True, capture_output=True, timeout=120
        )
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        fresh = os.path.exists(_SO) and (
            os.path.getmtime(_SO) >= os.path.getmtime(_SRC)
        )
        if not fresh and not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None

        i64p = ctypes.POINTER(ctypes.c_int64)
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.obj_parse.restype = ctypes.c_int64
        lib.obj_parse.argtypes = [ctypes.c_char_p, i64p]
        lib.obj_fill.restype = None
        lib.obj_fill.argtypes = [
            ctypes.c_int64, f32p, f32p, i32p, i32p, i32p, ctypes.c_char_p
        ]
        lib.ppm_parse.restype = ctypes.c_int64
        lib.ppm_parse.argtypes = [ctypes.c_char_p, i64p]
        lib.ppm_fill.restype = None
        lib.ppm_fill.argtypes = [ctypes.c_int64, f32p]
        _lib = lib
        return _lib


def parse_obj_native(path: str):
    """Native ObjMesh-compatible parse, or None if unavailable."""
    lib = load()
    if lib is None:
        return None
    import numpy as np

    counts = (ctypes.c_int64 * 6)()
    h = lib.obj_parse(path.encode(), counts)
    if h == 0:
        return None
    nv, nuv, nf, nm, nb, _ = list(counts)
    vertices = np.empty((nv, 3), np.float32)
    uvs = np.empty((nuv, 2), np.float32)
    face_v = np.empty((nf, 3), np.int32)
    face_t = np.empty((nf, 3), np.int32)
    face_mat = np.empty((nf,), np.int32)
    names_buf = ctypes.create_string_buffer(int(nb) + 1)
    lib.obj_fill(
        h,
        vertices.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        uvs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        face_v.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        face_t.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        face_mat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        names_buf,
    )
    raw = names_buf.raw[:nb].decode()
    mat_names = raw.split("\n") if raw else []
    from raytpu.io.obj import ObjMesh

    return ObjMesh(
        vertices=vertices, uvs=uvs, face_v=face_v, face_t=face_t,
        face_mat=face_mat, mat_names=mat_names,
    )


def read_ppm_native(path: str, bottom_up: bool = True):
    """Native (H, W, 3) f32 PPM read, or None if unavailable."""
    lib = load()
    if lib is None:
        return None
    import numpy as np

    dims = (ctypes.c_int64 * 2)()
    h = lib.ppm_parse(path.encode(), dims)
    if h == 0:
        return None
    w, ht = int(dims[0]), int(dims[1])
    rgb = np.empty((ht, w, 3), np.float32)
    lib.ppm_fill(h, rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if bottom_up:
        rgb = np.ascontiguousarray(rgb[::-1])
    return rgb
