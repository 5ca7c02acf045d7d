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


def test_integrate_axis_aligned_matches_general():
    """The separable MXU projection path (axis_aligned=True, rotation-free
    vol2cam) == the general gather path, on a realistic noisy depth map."""
    from sobfu_tpu.tsdf import integrate_dists

    rng = np.random.default_rng(5)
    H, W = 48, 64
    dims = (32, 32, 32)
    dists = jnp.asarray(
        0.4 + 0.8 * rng.random((H, W)), jnp.float32
    )
    # punch some invalid (zero) pixels through it
    mask = rng.random((H, W)) < 0.1
    dists = dists * jnp.asarray(~mask, jnp.float32)
    intr = jnp.asarray([100.0, 100.0, 32.0, 24.0], jnp.float32)
    vol2cam = jnp.asarray(
        np.array(
            [[1, 0, 0, -0.5], [0, 1, 0, -0.5], [0, 0, 1, 0.45], [0, 0, 0, 1]],
            np.float32,
        )
    )
    vs = jnp.asarray([1.0 / 32, 1.0 / 32, 1.0 / 32], jnp.float32)
    zeros = jnp.zeros(dims, jnp.float32)
    args = (zeros, zeros, dists, vol2cam, intr, vs,
            jnp.float32(0.1), jnp.float32(0.04), dims)
    t_gen, w_gen = integrate_dists(*args, axis_aligned=False)
    t_sep, w_sep = integrate_dists(*args, axis_aligned=True)
    # identical pixel selection except possibly at exact floor boundaries
    # (xs*inv_z vs xs/zs differ in the last ulp); require bitwise equality
    # on >99.9% of voxels and full equality of the valid masks
    diff_t = np.asarray(t_gen != t_sep).mean()
    diff_w = np.asarray(w_gen != w_sep).mean()
    assert diff_t < 1e-3 and diff_w < 1e-3
    np.testing.assert_allclose(
        np.asarray(t_sep), np.asarray(t_gen), atol=0.05
    )
    # the z-offset plumbing (sharded blocks) matches too
    t_gen_o, w_gen_o = integrate_dists(
        zeros[:16], zeros[:16], dists, vol2cam, intr, vs,
        jnp.float32(0.1), jnp.float32(0.04), (16, 32, 32),
        z_offset=8, axis_aligned=False,
    )
    t_sep_o, w_sep_o = integrate_dists(
        zeros[:16], zeros[:16], dists, vol2cam, intr, vs,
        jnp.float32(0.1), jnp.float32(0.04), (16, 32, 32),
        z_offset=8, axis_aligned=True,
    )
    assert np.asarray(t_gen_o != t_sep_o).mean() < 1e-3
    assert np.asarray(w_gen_o != w_sep_o).mean() < 1e-3


def test_integrate_auto_detects_axis_aligned_pose():
    """TsdfVolume.integrate routes rotation-free poses through the
    separable path and rotated poses through the general fallback, with
    matching results for the identity case."""
    p = make_params(dim=32, size=1.0)
    p.intr = Intr(100.0, 100.0, 32.0, 24.0)
    p.volume_pose = translation_pose((-0.5, -0.5, 0.5))
    H, W = 48, 64
    u, v = np.meshgrid(np.arange(W), np.arange(H))
    xl = (u - p.intr.cx) / p.intr.fx
    yl = (v - p.intr.cy) / p.intr.fy
    dists = jnp.asarray(1.0 * np.sqrt(xl**2 + yl**2 + 1), jnp.float32)

    vol = TsdfVolume(p)
    vol.integrate(dists, np.eye(4, dtype=np.float32), p.intr)

    # a slightly rotated camera pose must take the general path and not
    # crash (the separable precondition does not hold)
    th = 0.03
    R = np.array(
        [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0],
         [0, 0, 1]], np.float32,
    )
    pose_rot = np.eye(4, dtype=np.float32)
    pose_rot[:3, :3] = R
    vol_rot = TsdfVolume(p)
    vol_rot.integrate(dists, pose_rot, p.intr)
    t0, t1 = np.asarray(vol.tsdf), np.asarray(vol_rot.tsdf)
    assert np.isfinite(t1).all()
    assert (t0 != t1).any()  # rotation genuinely changed the projection


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


def test_fusion_gated_new_surface():
    """fuse_volumes_gated: NEW canonical surface (weight_g == 0) is
    accepted only where |psi - id| <= gate; existing-support voxels fuse
    regardless of displacement; everything else matches fuse_volumes."""
    from sobfu_tpu.tsdf import fuse_volumes_gated

    # 4 voxels: [new+near-id, new+far, supported+far, skip(wn=0)]
    g_t = jnp.asarray([[[1.0, 1.0, 0.5, 0.5]]], jnp.float32)
    g_w = jnp.asarray([[[0.0, 0.0, 2.0, 2.0]]], jnp.float32)
    n_t = jnp.asarray([[[0.2, 0.2, 1.0, 1.0]]], jnp.float32)
    n_w = jnp.asarray([[[2.0, 2.0, 2.0, 0.0]]], jnp.float32)
    disp = jnp.asarray([[[0.3, 4.0, 4.0, 0.0]]], jnp.float32)
    t, w = fuse_volumes_gated(
        g_t, g_w, n_t, n_w, jnp.float32(64.0), disp, jnp.float32(1.5)
    )
    t, w = np.asarray(t)[0, 0], np.asarray(w)[0, 0]
    np.testing.assert_allclose(t[0], 0.2, rtol=1e-6)  # created
    assert w[0] == 1.0
    assert t[1] == 1.0 and w[1] == 0.0  # gated: far psi, no support
    np.testing.assert_allclose(t[2], (2 * 0.5 + 1.0) / 3.0, rtol=1e-6)
    assert w[2] == 3.0  # supported: fuses despite far psi
    assert t[3] == 0.5 and w[3] == 2.0  # wn=0 skip rule intact


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
