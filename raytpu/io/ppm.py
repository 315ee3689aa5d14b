"""PPM (P3 ASCII) read/write.

Mirrors the reference's formats: the output writer (main.c:457-465,
rtutility.h:52-79 — header + one "r g b" int triplet per line, rows
top-down) and the texture reader (create_tex_list / create_mat_list,
texture.h:114-173 — ASCII P3, rows stored bottom-up, values normalized by
maxVal).
"""

from __future__ import annotations

import numpy as np


def write_ppm(path: str, canvas: np.ndarray) -> None:
    """canvas: (H, W, 3) ints in 0..255, row 0 = top (main.c:457-465)."""
    h, w, _ = canvas.shape
    flat = canvas.reshape(-1, 3).astype(np.int64)
    with open(path, "w") as f:
        f.write(f"P3\n{w} {h}\n255\n")
        np.savetxt(f, flat, fmt="%d")


def read_ppm(path: str, bottom_up: bool = True, use_native: bool = True) -> np.ndarray:
    """Read ASCII P3 -> (H, W, 3) float32 in [0, 1].

    bottom_up=True stores rows bottom-up like the reference texture
    loaders (texture.h:126: ``for i = height-1 .. 0``), which is the
    layout the UV mapping indexes into.

    Uses the C++ fast path (raytpu.native) when available; set
    RAYTPU_NO_NATIVE=1 or use_native=False for this pure-Python
    reference implementation (tested for exact agreement).
    """
    import os

    if use_native and os.environ.get("RAYTPU_NO_NATIVE") != "1":
        from raytpu.native import read_ppm_native

        rgb = read_ppm_native(path, bottom_up=bottom_up)
        if rgb is not None:
            return rgb
    with open(path, "rb") as f:
        data = f.read()
    # spec-legal '#' comments run to end-of-line; the native parser and
    # this fallback must agree on them (tests/test_native.py)
    if b"#" in data:
        import re

        data = re.sub(rb"#[^\n\r]*", b" ", data)
    tokens = data.split()
    if tokens[0] != b"P3":
        raise ValueError(f"{path}: not an ASCII P3 PPM (got {tokens[0]!r})")
    w, h, maxval = int(tokens[1]), int(tokens[2]), int(tokens[3])
    vals = np.array(tokens[4 : 4 + w * h * 3], dtype=np.float32)
    if vals.size != w * h * 3:
        raise ValueError(f"{path}: expected {w*h*3} samples, got {vals.size}")
    # n * f32(1/maxval), the repo-wide quantization convention (see
    # io/image.py module docstring); the native parser matches bit-for-bit
    img = vals.reshape(h, w, 3) * np.float32(1.0 / maxval)
    if bottom_up:
        img = img[::-1]
    return np.ascontiguousarray(img)
