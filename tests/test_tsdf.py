"""TSDF volume tests: analytic inits, projective integration, fusion."""

import jax.numpy as jnp
import numpy as np

from sobfu_tpu import fields
from sobfu_tpu.config import Intr, Params, translation_pose
from sobfu_tpu.tsdf import TsdfVolume, fuse_volumes


def make_params(dim=32, size=0.25):
    p = Params()
    p.volume_dims = (dim, dim, dim)
    p.volume_size = (size, size, size)
    p.tsdf_trunc_dist = 10.0 * size / dim
    p.eta = 2.0 * size / dim
    p.tsdf_max_weight = 64.0
    return p


def test_sphere_init_values():
    p = make_params()
    vol = TsdfVolume(p)
    c, r = (0.125, 0.125, 0.125), 0.05
    vol.init_sphere(c, r)
    tsdf = np.asarray(vol.tsdf)
    w = np.asarray(vol.weight)

    vs = p.voxel_sizes()[0]
    # centre voxel: sdf ~= -r -> about -r/trunc_dist; weight 0 (sdf <= -eta)
    ci = int(0.125 / vs - 0.5)
    assert abs(tsdf[ci, ci, ci] - (-r / p.tsdf_trunc_dist)) < 0.15
    assert w[ci, ci, ci] == 0.0
    # far corner: outside -> +1, weight 1
    assert tsdf[0, 0, 0] == 1.0
    assert w[0, 0, 0] == 1.0
    # zero crossing near radius
    crossing = np.abs(tsdf) < 0.2
    assert crossing.sum() > 0


def test_plane_init_monotonic_in_z():
    p = make_params()
    vol = TsdfVolume(p)
    vol.init_plane(0.125)
    tsdf = np.asarray(vol.tsdf)
    assert tsdf[0, 5, 5] == -1.0
    assert tsdf[-1, 5, 5] == 1.0
    col = tsdf[:, 5, 5]
    assert np.all(np.diff(col) >= 0)


def test_box_torus_ellipsoid_have_zero_crossings():
    p = make_params()
    for init in [
        lambda v: v.init_box((0.05, 0.05, 0.05)),
        lambda v: v.init_torus(0.07, 0.02),
        lambda v: v.init_ellipsoid((0.06, 0.04, 0.05)),
    ]:
        vol = TsdfVolume(p)
        init(vol)
        tsdf = np.asarray(vol.tsdf)
        assert tsdf.min() < 0.0 < tsdf.max()
        assert tsdf.max() == 1.0  # far field always truncates
        assert (np.abs(tsdf) < 0.5).sum() > 0


def test_projective_integration_of_flat_depth():
    """A constant-depth image integrates into a plane-like TSDF."""
    p = make_params(dim=32, size=1.0)
    p.intr = Intr(100.0, 100.0, 32.0, 24.0)
    # volume centred on optical axis, front face 0.5m from the camera
    p.volume_pose = translation_pose((-0.5, -0.5, 0.5))
    vol = TsdfVolume(p)

    H, W = 48, 64
    depth_m = 1.0  # plane 1m from the camera -> z = 0.5 in volume coords
    # dists = depth * sqrt(xl^2 + yl^2 + 1) (reference imgproc.cu:233-254)
    u, v = np.meshgrid(np.arange(W), np.arange(H))
    xl = (u - p.intr.cx) / p.intr.fx
    yl = (v - p.intr.cy) / p.intr.fy
    dists = (depth_m * np.sqrt(xl**2 + yl**2 + 1)).astype(np.float32)

    vol.integrate(jnp.asarray(dists), np.eye(4, dtype=np.float32), p.intr)
    tsdf = np.asarray(vol.tsdf)
    w = np.asarray(vol.weight)

    # Voxels on the optical axis: in front of the plane -> positive,
    # behind -> negative (within eta band) or weight 0.
    ci = 16  # optical axis passes through volume centre in x/y
    vs = p.voxel_sizes()[2]
    z_plane_vox = (1.0 - 0.5) / vs - 0.5  # z voxel index where sdf = 0
    col = tsdf[:, ci, ci]
    assert col[int(z_plane_vox) - 3] > 0.0
    assert col[int(z_plane_vox) + 3] < 0.0
    # weight 0 deep behind the surface
    deep = int(z_plane_vox + p.eta / vs + 2)
    if deep < 32:
        assert w[deep, ci, ci] == 0.0
    # ray-length correction: off-axis voxels at same z have correct psdf too
    assert abs(tsdf[int(z_plane_vox) - 3, ci + 6, ci + 6] - col[int(z_plane_vox) - 3]) < 0.2


def test_fusion_running_average_and_skips():
    g_t = jnp.asarray([[[0.5, 0.5, 0.5, 0.5]]], jnp.float32)
    g_w = jnp.asarray([[[2.0, 2.0, 2.0, 2.0]]], jnp.float32)
    # incoming: normal, skip w=0, skip w=1&t=0, skip w=1&t=-1
    n_t = jnp.asarray([[[1.0, 1.0, 0.0, -1.0]]], jnp.float32)
    n_w = jnp.asarray([[[1.0, 0.0, 1.0, 1.0]]], jnp.float32)
    t, w = fuse_volumes(g_t, g_w, n_t, n_w, jnp.float32(64.0))
    t, w = np.asarray(t)[0, 0], np.asarray(w)[0, 0]
    np.testing.assert_allclose(t[0], (2 * 0.5 + 1.0) / 3.0, rtol=1e-6)
    assert w[0] == 3.0
    np.testing.assert_allclose(t[1:], 0.5)
    np.testing.assert_allclose(w[1:], 2.0)


def test_fusion_weight_clamps_at_max():
    g_t = jnp.full((1, 1, 1), 0.0, jnp.float32)
    g_w = jnp.full((1, 1, 1), 64.0, jnp.float32)
    n_t = jnp.full((1, 1, 1), 1.0, jnp.float32)
    n_w = jnp.full((1, 1, 1), 1.0, jnp.float32)
    _, w = fuse_volumes(g_t, g_w, n_t, n_w, jnp.float32(64.0))
    assert float(w[0, 0, 0]) == 64.0


def test_apply_affine_and_swap():
    p = Params()
    p.volume_dims = (8, 8, 8)
    p.volume_size = (0.1, 0.1, 0.1)
    p.tsdf_trunc_dist = 0.01
    p.eta = 0.01
    a, b = TsdfVolume(p), TsdfVolume(p)
    a.init_sphere((0.05, 0.05, 0.05), 0.03)
    ta = np.asarray(a.tsdf).copy()
    a.swap(b)
    assert float(jnp.abs(a.tsdf).sum()) == 0.0
    np.testing.assert_array_equal(np.asarray(b.tsdf), ta)

    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = (0.0, 0.0, 0.5)
    pose0 = a.pose.copy()
    a.apply_affine(T)
    np.testing.assert_allclose(a.pose, T @ pose0)
