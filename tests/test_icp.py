"""Rigid projective ICP tests (reference src/kfusion/projective_icp.cpp).

Oracle: a synthetically rendered plane-plus-step scene under a known small
rigid transform — ICP must recover (the inverse of) it.
"""

import jax.numpy as jnp
import numpy as np

from sobfu_tpu.config import Intr
from sobfu_tpu.icp import ProjectiveICP, rodrigues

H, W = 64, 80
INTR = Intr(70.0, 70.0, W / 2 - 0.5, H / 2 - 0.5)


def render_scene_depth(T_world2cam) -> np.ndarray:
    """Depth of a bumpy surface z = f(x, y) rendered by ray marching.

    The surface is static in world coords; T moves the camera.
    """
    u = np.arange(W)[None, :].repeat(H, 0)
    v = np.arange(H)[:, None].repeat(W, 1)
    dirs = np.stack(
        [(u - INTR.cx) / INTR.fx, (v - INTR.cy) / INTR.fy, np.ones_like(u, float)],
        axis=-1,
    )
    R = T_world2cam[:3, :3]
    t = T_world2cam[:3, 3]
    Rinv = R.T
    origin = -Rinv @ t
    dirs_w = dirs @ Rinv.T

    # ray-march the height field z_w = 1.0 + 0.05*sin(8x)+0.04*cos(6y)
    depth = np.zeros((H, W), np.uint16)
    s = np.full((H, W), 0.2)
    for _ in range(200):
        p = origin[None, None] + s[..., None] * dirs_w
        f = 1.0 + 0.05 * np.sin(8 * p[..., 0]) + 0.04 * np.cos(6 * p[..., 1]) - p[..., 2]
        step = np.clip(f * 0.9, -0.02, 0.02)
        s = s + np.abs(dirs_w[..., 2]) * 0 + step  # advance along ray by f
        s = np.clip(s, 0.05, 5.0)
    p = origin[None, None] + s[..., None] * dirs_w
    z_cam = (p @ R.T + t)[..., 2]
    return np.clip(z_cam * 1000.0, 0, 65535).astype(np.uint16)


def test_rodrigues_roundtrip():
    rvec = jnp.asarray([0.02, -0.015, 0.03])
    R = np.asarray(rodrigues(rvec))
    # float32 backend math leaves ~4e-6 orthogonality error; 1e-5 is the
    # tightest tolerance that is robust across CPU/TPU backends.
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-5)
    # angle equals |rvec|; arccos is ill-conditioned for small angles
    # (d/dx arccos ~ 1/angle here), so float32 trace noise inflates ~25x.
    angle = np.arccos((np.trace(R) - 1) / 2)
    np.testing.assert_allclose(angle, np.linalg.norm(rvec), rtol=1e-2)


def test_icp_identity_on_same_frame():
    T0 = np.eye(4)
    d = render_scene_depth(T0)
    icp = ProjectiveICP()
    icp.set_iterations([5, 3, 0, 0])
    T, ok = icp.estimate_transform_from_depth(INTR, jnp.asarray(d), jnp.asarray(d))
    assert ok
    # identity-frame residual is ~4e-4 in float32; 1e-3 is still far below
    # the millimetre scale that matters for the pose.
    np.testing.assert_allclose(T, np.eye(4), atol=1e-3)


def test_icp_recovers_small_translation():
    T0 = np.eye(4)
    T1 = np.eye(4)
    T1[:3, 3] = (0.004, -0.003, 0.006)  # camera moved a few mm
    d0 = render_scene_depth(T0)
    d1 = render_scene_depth(T1)

    icp = ProjectiveICP()
    icp.set_iterations([10, 5, 0, 0])
    Tinc, ok = icp.estimate_transform_from_depth(
        INTR, jnp.asarray(d1), jnp.asarray(d0)
    )
    assert ok
    # Tinc maps current-frame points onto the previous frame; for a pure
    # camera translation t the increment's translation approaches -t
    est = -Tinc[:3, 3]
    np.testing.assert_allclose(est, T1[:3, 3], atol=2e-3)
