"""Tests for the native C++ runtime (decode / prefetch loader / VTK writer).

Skipped when the shared library cannot be built (no g++/libpng).
"""

import os
import tempfile

import numpy as np
import pytest

from sobfu_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native runtime not built"
)


def _write_png16(path, arr):
    from PIL import Image

    Image.fromarray(arr.astype(np.int32), mode="I").convert("I;16").save(path)


def test_decode_depth_roundtrip(tmp_path):
    d = np.random.default_rng(0).integers(0, 5000, (48, 64)).astype(np.uint16)
    p = str(tmp_path / "d.png")
    _write_png16(p, d)
    out = native.decode_depth(p)
    assert out.dtype == np.uint16
    np.testing.assert_array_equal(out, d)


def test_loader_preserves_order_and_content(tmp_path):
    base = np.random.default_rng(1).integers(0, 1000, (32, 40)).astype(np.uint16)
    paths = []
    for i in range(7):
        p = str(tmp_path / f"f{i}.png")
        _write_png16(p, base + i)
        paths.append(p)
    frames = list(native.FrameLoader(paths, capacity=2, n_threads=3))
    assert len(frames) == 7
    for i, f in enumerate(frames):
        np.testing.assert_array_equal(f, base + i)


def test_loader_applies_masks(tmp_path):
    d = np.full((16, 16), 777, np.uint16)
    m = np.zeros((16, 16), np.uint16)
    m[:8] = 255
    dp, mp = str(tmp_path / "d.png"), str(tmp_path / "m.png")
    _write_png16(dp, d)
    _write_png16(mp, m)
    (frame,) = list(native.FrameLoader([dp], [mp]))
    assert (frame[:8] == 777).all()
    assert (frame[8:] == 0).all()


def test_native_vtk_matches_python_reader(tmp_path):
    from sobfu_tpu.io import load_mesh_vtk

    v = np.random.default_rng(2).standard_normal((12, 3)).astype(np.float32)
    p = str(tmp_path / "m.vtk")
    native.write_mesh_vtk(p, v)
    mesh = load_mesh_vtk(p)
    np.testing.assert_allclose(mesh.vertices, v, rtol=1e-4, atol=1e-5)
