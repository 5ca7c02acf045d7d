"""Tests for the parity-surface components: ScalarField, Reductor, KinFu,
ProjectiveICP, and config loading.

Oracles follow the reference test strategy (SURVEY.md §4): analytic
fixtures with closed-form expected values.
"""

import os
import tempfile

import jax.numpy as jnp
import numpy as np

from sobfu_tpu import fields, solver
from sobfu_tpu.config import Intr, Params, load_params
from sobfu_tpu.reductor import Reductor
from sobfu_tpu.scalar_fields import ScalarField


# ---------------------------------------------------------------------------
# ScalarField
# ---------------------------------------------------------------------------


def test_scalar_field_sum():
    f = ScalarField((8, 8, 8))
    assert f.sum() == 0.0
    f.data = jnp.ones((8, 8, 8), jnp.float32)
    np.testing.assert_allclose(f.sum(), 512.0)
    f.clear()
    assert f.sum() == 0.0


# ---------------------------------------------------------------------------
# Reductor (object wrapper over the solver reductions)
# ---------------------------------------------------------------------------


def test_reductor_energies_match_solver():
    n = 8
    rng = np.random.default_rng(0)
    tg = jnp.asarray(rng.standard_normal((n, n, n)), jnp.float32)
    tnp = jnp.asarray(rng.standard_normal((n, n, n)), jnp.float32)
    psi = fields.identity_field((n, n, n)) + 0.1 * jnp.asarray(
        rng.standard_normal((3, n, n, n)), jnp.float32
    )
    r = Reductor((n, n, n))
    np.testing.assert_allclose(
        r.data_energy(tg, tnp), float(solver.data_energy(tg, tnp)), rtol=1e-6
    )
    np.testing.assert_allclose(
        r.reg_energy_sobolev(psi), float(solver.reg_energy_sobolev(psi)), rtol=1e-6
    )


def test_reductor_max_update_norm_argmax():
    n = 8
    updates = jnp.zeros((3, n, n, n), jnp.float32)
    updates = updates.at[:, 2, 3, 4].set(jnp.asarray([3.0, 4.0, 0.0]))
    r = Reductor((n, n, n))
    norm, idx = r.max_update_norm(updates)
    np.testing.assert_allclose(norm, 5.0, rtol=1e-6)
    assert idx == (2 * n + 3) * n + 4


def test_reductor_voxel_max_energy_pure_data_term():
    n = 8
    tg = jnp.zeros((n, n, n), jnp.float32)
    tnp = jnp.zeros((n, n, n), jnp.float32).at[1, 2, 3].set(2.0)
    psi = fields.identity_field((n, n, n))
    r = Reductor((n, n, n))
    e, idx = r.voxel_max_energy(tg, tnp, psi, w_reg=0.5)
    np.testing.assert_allclose(e, 0.5 * 4.0, rtol=1e-6)
    assert idx == (1 * n + 2) * n + 3


# ---------------------------------------------------------------------------
# KinFu rigid pipeline
# ---------------------------------------------------------------------------


def _synthetic_depth(H, W, z_mm=800):
    """Flat wall at z_mm with a centered square bump."""
    d = np.full((H, W), z_mm, np.uint16)
    d[H // 4 : 3 * H // 4, W // 4 : 3 * W // 4] = z_mm - 150
    return d


def test_kinfu_default_params_match_reference():
    from sobfu_tpu.kinfu import KinFuParams

    p = KinFuParams.default_params()
    # reference kinfu.cpp:10-44
    assert (p.cols, p.rows) == (640, 480)
    np.testing.assert_allclose(
        [p.intr.fx, p.intr.fy, p.intr.cx, p.intr.cy],
        [525.0, 525.0, 319.5, 239.5],
    )
    assert p.volume_dims == (512, 512, 512)
    assert p.volume_size == (3.0, 3.0, 3.0)
    assert p.icp_iter_num == (10, 5, 4, 0)
    np.testing.assert_allclose(p.tsdf_trunc_dist, 0.04)


def test_kinfu_tracks_static_scene():
    from sobfu_tpu.kinfu import KinFu, KinFuParams

    H, W = 48, 64
    p = KinFuParams.default_params()
    p.cols, p.rows = W, H
    p.intr = Intr(60.0, 60.0, W / 2 - 0.5, H / 2 - 0.5)
    p.volume_dims = (32, 32, 32)
    p.volume_size = (1.2, 1.2, 1.2)
    from sobfu_tpu.config import translation_pose

    p.volume_pose = translation_pose((-0.6, -0.6, 0.4))
    p.tsdf_trunc_dist = 0.15
    p.icp_iter_num = (4, 2, 0, 0)

    kf = KinFu(p)
    depth = _synthetic_depth(H, W)
    assert kf(jnp.asarray(depth))
    assert kf(jnp.asarray(depth))  # identical frame -> ~identity increment
    pose = kf.get_camera_pose()
    np.testing.assert_allclose(pose[:3, 3], 0.0, atol=5e-3)
    np.testing.assert_allclose(pose[:3, :3], np.eye(3), atol=5e-3)
    assert kf.frame_counter_ == 2
    # integration happened: some weight is set
    assert float(jnp.sum(kf.tsdf().weight)) > 0

    kf.reset()
    assert kf.frame_counter_ == 0
    assert float(jnp.sum(kf.tsdf().weight)) == 0.0


# ---------------------------------------------------------------------------
# config: .ini round-trip with reference key semantics
# ---------------------------------------------------------------------------


def test_load_params_ini_semantics():
    ini = """
# scene config
VOL_DIMS_X = 64
VOL_DIMS_Y = 64
VOL_DIMS_Z = 64
VOL_SIZE_X = 0.5
VOL_SIZE_Y = 0.5
VOL_SIZE_Z = 0.5
TSDF_TRUNC_DIST = 10.0   # voxels
ETA = 2.0                # voxels
INTR_FX = 500.0
INTR_FY = 510.0
INTR_CX = 320.0
INTR_CY = 240.0
VOL_POSE_T_Z = 0.75
MAX_ITER = 512
S = 7
LAMBDA = 0.1
ALPHA = 0.05
W_REG = 0.3
MAX_UPDATE_NORM = 0.001
START_FRAME = 2
"""
    with tempfile.NamedTemporaryFile("w", suffix=".ini", delete=False) as f:
        f.write(ini)
        path = f.name
    try:
        p = load_params(path)
    finally:
        os.unlink(path)

    assert p.volume_dims == (64, 64, 64)
    vs = 0.5 / 64
    np.testing.assert_allclose(p.tsdf_trunc_dist, 10.0 * vs, rtol=1e-6)
    np.testing.assert_allclose(p.eta, 2.0 * vs, rtol=1e-6)
    np.testing.assert_allclose(
        [p.intr.fx, p.intr.fy, p.intr.cx, p.intr.cy], [500, 510, 320, 240]
    )
    # volume pose: centred in x/y, camera VOL_POSE_T_Z away in z (demo.cpp:71-74)
    np.testing.assert_allclose(p.volume_pose[:3, 3], [-0.25, -0.25, 0.75])
    assert (p.max_iter, p.s, p.start_frame) == (512, 7, 2)
    np.testing.assert_allclose([p.lambda_, p.alpha, p.w_reg], [0.1, 0.05, 0.3])


def test_ini_tpu_extension_keys(tmp_path):
    ini = tmp_path / "p.ini"
    ini.write_text("VOL_DIMS_X=32\nWARP_WINDOW=3\nUSE_PALLAS=false\n")
    p = load_params(str(ini))
    assert p.warp_window == 3
    assert p.use_pallas is False


def test_shipped_scene_configs_load():
    """All five published scene configs parse with correct conversions."""
    import glob

    root = os.path.join(os.path.dirname(__file__), "..", "params")
    files = sorted(glob.glob(os.path.join(root, "params_*.ini")))
    assert len(files) >= 7  # 5 scenes + default + ours (6/6 reference set)
    for f in files:
        p = load_params(f)
        assert p.volume_dims[0] in (64, 128)
        assert p.tsdf_trunc_dist > 0  # converted to metres
        assert p.s == 7
    # params_ours carries the SR300 depth intrinsics (reference
    # params/params_ours.ini camera notes)
    p = load_params(os.path.join(root, "params_ours.ini"))
    np.testing.assert_allclose(p.intr.fx, 474.567)
    # spot-check umbrella values
    p = load_params(os.path.join(root, "params_umbrella.ini"))
    np.testing.assert_allclose(p.tsdf_trunc_dist, 8.0 * 1.0 / 128)
    assert p.max_iter == 2048 and p.start_frame == 1


def test_kinfu_frame_to_model_tracking():
    """Frame-to-model mode: ICP against the raycasted TSDF tracks a static
    SMOOTH scene (projective-TSDF integration smears depth discontinuities,
    so the oracle scene must be continuous) within voxel-scale accuracy."""
    from sobfu_tpu.config import translation_pose
    from sobfu_tpu.kinfu import KinFu, KinFuParams
    from tests.test_pipeline import render_sphere_depth

    H, W = 48, 64
    p = KinFuParams.default_params()
    p.cols, p.rows = W, H
    p.intr = Intr(60.0, 60.0, W / 2 - 0.5, H / 2 - 0.5)
    p.volume_dims = (48, 48, 48)
    p.volume_size = (0.6, 0.6, 0.6)
    p.volume_pose = translation_pose((-0.3, -0.3, 0.25))
    p.tsdf_trunc_dist = 0.05
    p.icp_iter_num = (4, 0, 0, 0)
    p.track_against_model = True

    kf = KinFu(p)
    depth = render_sphere_depth((0.0, 0.0, 0.45), 0.12)
    assert kf(jnp.asarray(depth))
    assert kf(jnp.asarray(depth))
    pose = kf.get_camera_pose()
    # voxel size 12.5 mm; require within ~1.5 voxels of identity
    assert np.linalg.norm(pose[:3, 3]) < 0.02, pose[:3, 3]
    np.testing.assert_allclose(pose[:3, :3], np.eye(3), atol=0.03)
