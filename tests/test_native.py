"""Native C++ loaders vs the pure-Python reference implementations:
exact agreement on the reference's shipped assets."""

import glob
import os

import numpy as np
import pytest

from raytpu.io.obj import parse_obj
from raytpu.io.ppm import read_ppm
from raytpu.native import load

REF = "/root/reference/model3D"

pytestmark = pytest.mark.skipif(
    load() is None, reason="no native toolchain available"
)

OBJS = [
    f"{REF}/pyramide_tri.obj",
    f"{REF}/pyramide/pyramide_tri.obj",
    f"{REF}/grass_block/block_tri.obj",
    f"{REF}/mcworld_tiltedtex_water/mineways_tri.obj",
    f"{REF}/1tree_little.obj",
]


@pytest.mark.parametrize("path", OBJS)
def test_obj_native_matches_python(path):
    a = parse_obj(path, use_native=True)
    b = parse_obj(path, use_native=False)
    np.testing.assert_array_equal(a.vertices, b.vertices)
    np.testing.assert_array_equal(a.uvs, b.uvs)
    np.testing.assert_array_equal(a.face_v, b.face_v)
    np.testing.assert_array_equal(a.face_t, b.face_t)
    np.testing.assert_array_equal(a.face_mat, b.face_mat)
    assert a.mat_names == b.mat_names


def test_ppm_native_matches_python():
    ppms = sorted(glob.glob(f"{REF}/**/*.ppm", recursive=True))[:6]
    assert ppms, "no ppm assets found"
    for p in ppms:
        a = read_ppm(p, use_native=True)
        b = read_ppm(p, use_native=False)
        np.testing.assert_array_equal(a, b)


def test_ppm_header_comments(tmp_path):
    """'#' comments are PPM-spec-legal; both parsers must accept them
    and agree (the reference's own writer never emits them, but GIMP
    and ImageMagick do)."""
    p = tmp_path / "c.ppm"
    p.write_text(
        "P3\n# made by gimp\n2 2 # inline dims comment\n255\n"
        "# row 0\n255 0 0  0 255 0\n0 0 255  255 255 255\n"
    )
    a = read_ppm(str(p), use_native=True)
    b = read_ppm(str(p), use_native=False)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (2, 2, 3)
    # bottom-up storage: file row 0 lands at array row 1
    np.testing.assert_allclose(a[1, 0], [1.0, 0.0, 0.0])


def test_missing_file_falls_back():
    with pytest.raises(FileNotFoundError):
        parse_obj("/nonexistent/x.obj", use_native=True)
