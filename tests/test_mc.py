"""Marching cubes tests: table consistency, sphere surface extraction."""

import jax.numpy as jnp
import numpy as np

from sobfu_tpu import mc
from sobfu_tpu.config import Params
from sobfu_tpu.tsdf import TsdfVolume


def make_vol(dim=32, size=0.25):
    p = Params()
    p.volume_dims = (dim, dim, dim)
    p.volume_size = (size, size, size)
    p.tsdf_trunc_dist = 10.0 * size / dim
    p.eta = 100.0  # weight 1 everywhere for clean MC
    return TsdfVolume(p)


def test_tables_consistent():
    assert mc.TRI_TABLE.shape == (256, 16)
    assert mc.NUM_VERTS_TABLE.shape == (256,)
    for ci in range(256):
        row = mc.TRI_TABLE[ci]
        n = int(np.argmax(row < 0)) if (row < 0).any() else 16
        assert n == mc.NUM_VERTS_TABLE[ci]
        assert n % 3 == 0
    assert mc.NUM_VERTS_TABLE[0] == 0 and mc.NUM_VERTS_TABLE[255] == 0
    assert mc.NUM_VERTS_TABLE.max() == 15


def test_sphere_mesh_radius():
    """Extracted vertices of a sphere SDF lie on the sphere."""
    vol = make_vol()
    c, r = (0.125, 0.125, 0.125), 0.06
    vol.init_sphere(c, r)
    mesh = mc.extract_mesh(
        vol.tsdf, vol.weight, vol.voxel_sizes(), flip_yz=False,
        max_occupied=1 << 14, max_vertices=1 << 16,
    )
    assert mesh.vertices.shape[0] > 300
    assert mesh.vertices.shape[0] % 3 == 0
    d = np.linalg.norm(mesh.vertices - np.asarray(c), axis=1)
    vs = vol.voxel_sizes()[0]
    np.testing.assert_allclose(d, r, atol=1.5 * vs)
    # normals are unit and point outward
    n = mesh.normals
    np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-4)
    outward = np.sum(n * (mesh.vertices - np.asarray(c)), axis=1) / np.maximum(d, 1e-9)
    assert (outward > 0).mean() > 0.95


def test_zero_weight_suppresses_triangles():
    vol = make_vol()
    vol.init_sphere((0.125, 0.125, 0.125), 0.06)
    mesh_full = mc.extract_mesh(
        vol.tsdf, vol.weight, vol.voxel_sizes(), flip_yz=False,
        max_occupied=1 << 14, max_vertices=1 << 16,
    )
    mesh_none = mc.extract_mesh(
        vol.tsdf, jnp.zeros_like(vol.weight), vol.voxel_sizes(), flip_yz=False,
        max_occupied=1 << 14, max_vertices=1 << 16,
    )
    assert mesh_full.vertices.shape[0] > 0
    assert mesh_none.vertices.shape[0] == 0


def test_flip_yz_and_pose():
    vol = make_vol()
    vol.init_sphere((0.125, 0.125, 0.125), 0.06)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = (1.0, 2.0, 3.0)
    mesh = mc.extract_mesh(
        vol.tsdf, vol.weight, vol.voxel_sizes(), pose=pose, flip_yz=True,
        max_occupied=1 << 14, max_vertices=1 << 16,
    )
    # store convention: (x, -y, -z) after pose (marching_cubes.cu:273-276)
    v = mesh.vertices
    assert v[:, 0].mean() > 1.0  # x shifted by +1
    assert v[:, 1].mean() < -1.5  # y ~ -(2 + small)
    assert v[:, 2].mean() < -2.5


def test_capacity_overflow_is_clamped():
    vol = make_vol()
    vol.init_sphere((0.125, 0.125, 0.125), 0.06)
    mesh = mc.extract_mesh(
        vol.tsdf, vol.weight, vol.voxel_sizes(), flip_yz=False,
        max_occupied=64, max_vertices=99,
    )
    assert mesh.vertices.shape[0] <= 99


def test_mc_empty_volume_yields_no_triangles():
    tsdf = jnp.ones((16, 16, 16), jnp.float32)
    weight = jnp.ones_like(tsdf)
    from sobfu_tpu.mc import extract_mesh
    m = extract_mesh(tsdf, weight, (0.01, 0.01, 0.01))
    assert m.n_triangles == 0


def test_mc_zero_weight_gates_triangles():
    """Weight-zero corners must suppress triangles even across the surface
    (reference computeCubeIndex early-out, marching_cubes.cu:40-79)."""
    from sobfu_tpu.tsdf import init_sphere
    from sobfu_tpu.mc import extract_mesh
    dims = (24, 24, 24)
    vs = 0.01
    t, w = init_sphere(dims, (vs, vs, vs), (0.12, 0.12, 0.12), 0.05, 0.02, 0.02)
    full = extract_mesh(t, w, (vs, vs, vs))
    assert full.n_triangles > 0
    none = extract_mesh(t, jnp.zeros_like(w), (vs, vs, vs))
    assert none.n_triangles == 0


def test_mc_capacity_clamp():
    """Vertex output must clamp to max_vertices without corruption."""
    from sobfu_tpu.tsdf import init_sphere
    from sobfu_tpu.mc import marching_cubes
    dims = (24, 24, 24)
    vs = 0.01
    t, w = init_sphere(dims, (vs, vs, vs), (0.12, 0.12, 0.12), 0.05, 0.02, 0.02)
    v, n, count, occ = marching_cubes(
        t, w, jnp.asarray([vs] * 3), jnp.eye(4), max_vertices=30
    )
    assert int(count) == 30
    assert np.isfinite(np.asarray(v)).all()
