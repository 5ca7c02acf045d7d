"""Raycaster tests: analytic sphere depth oracle."""

import jax.numpy as jnp
import numpy as np

from sobfu_tpu.config import Intr, Params, translation_pose
from sobfu_tpu.raycast import raycast_volume
from sobfu_tpu.tsdf import TsdfVolume

H, W = 48, 64
INTR = Intr(60.0, 60.0, W / 2 - 0.5, H / 2 - 0.5)


def _sphere_volume():
    p = Params()
    p.volume_dims = (64, 64, 64)
    p.volume_size = (0.4, 0.4, 0.4)
    p.volume_pose = translation_pose((-0.2, -0.2, 0.25))
    p.tsdf_trunc_dist = 8.0 * 0.4 / 64
    p.eta = 4.0 * 0.4 / 64
    vol = TsdfVolume(p)
    # sphere at volume centre -> camera coords (0, 0, 0.45)
    vol.init_sphere((0.2, 0.2, 0.2), 0.08)
    return vol


def test_raycast_sphere_depth_matches_analytic():
    vol = _sphere_volume()
    depth, points, normals = raycast_volume(
        vol, np.eye(4), INTR, H, W, step_factor=0.5
    )
    depth = np.asarray(depth)
    cy, cx = H // 2, W // 2
    # central ray hits the near surface of the sphere: z = 0.45 - 0.08
    assert abs(depth[cy, cx] - 0.37) < 0.01, depth[cy, cx]
    # off-object rays miss
    assert depth[0, 0] == 0.0
    # hit mask is a filled disc of reasonable size
    hits = depth > 0
    assert 50 < hits.sum() < H * W / 2

    # normals on the camera-facing cap point toward the camera (-z)
    n_c = np.asarray(normals)[cy, cx]
    assert n_c[2] < -0.9, n_c

    # points = depth * ray
    pts = np.asarray(points)
    np.testing.assert_allclose(pts[cy, cx, 2], depth[cy, cx], rtol=1e-5)


def test_raycast_respects_weight_gating():
    vol = _sphere_volume()
    vol.weight = jnp.zeros_like(vol.weight)  # nothing observed
    depth, _, _ = raycast_volume(vol, np.eye(4), INTR, H, W)
    assert float(jnp.sum(depth)) == 0.0
