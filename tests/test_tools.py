"""Tests for the tools/ scripts importable pieces."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_compare_meshes_detects_offset(tmp_path):
    import jax.numpy as jnp

    from sobfu_tpu import mc
    from sobfu_tpu.io import save_mesh_vtk
    from sobfu_tpu.tsdf import init_sphere
    from tools.compare_meshes import compare

    t, w = init_sphere((24, 24, 24), (0.01,) * 3, (0.12, 0.12, 0.12),
                       0.05, 0.02, 0.02)
    m = mc.extract_mesh(t, w, (0.01,) * 3)
    a = str(tmp_path / "a.vtk")
    b = str(tmp_path / "b.vtk")
    save_mesh_vtk(m, a)
    m.vertices = m.vertices + np.array([0.004, 0.0, 0.0], np.float32)
    save_mesh_vtk(m, b)
    r = compare(a, b, samples=2000)
    assert 0.0005 < r["rmse"] < 0.006


def test_synthetic_scene_generator(tmp_path):
    from tools.make_synthetic_scene import main

    out = str(tmp_path / "scene")
    assert main([out, "--frames", "3", "--width", "64", "--height", "48"]) == 0
    assert len(os.listdir(os.path.join(out, "depth"))) == 3
    assert os.path.exists(os.path.join(out, "params.ini"))
