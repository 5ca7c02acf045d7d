"""KinFu: the rigid-fusion pipeline shell.

Parity surface with the reference ``kfusion::KinFu``
(include/kfusion/kinfu.hpp, src/kfusion/kinfu.cpp). In the reference this
class is vestigial — ``KinFu::operator()`` and ``renderImage`` are declared
(kinfu.hpp:84-87) but never defined, and the demo app only uses SobFusion
(SURVEY.md §2 "KinFu"). Here the shell is completed into a WORKING rigid
tracking front-end built from the same ops the non-rigid pipeline uses:

  depth -> bilateral filter -> truncation -> dists + point/normal pyramids
        -> projective ICP against the previous frame's pyramids
        -> TSDF integration at the tracked pose

which is strictly more than the reference ships while keeping its exact
parameter surface (KinFuParams::default_params, kinfu.cpp:10-44) and state
layout (pose history, frame counter, prev/curr frame pyramids,
kinfu.cpp:62-115).
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from sobfu_tpu.config import Intr, translation_pose
from sobfu_tpu.icp import ProjectiveICP
from sobfu_tpu.ops import imgproc


@dataclasses.dataclass
class KinFuParams:
    """Field-for-field parity with reference KinFuParams (kinfu.hpp:21-53)."""

    cols: int = 640
    rows: int = 480
    intr: Intr = Intr(525.0, 525.0, 640 / 2 - 0.5, 480 / 2 - 0.5)

    volume_dims: Tuple[int, int, int] = (512, 512, 512)
    volume_size: Tuple[float, float, float] = (3.0, 3.0, 3.0)
    volume_pose: np.ndarray = dataclasses.field(
        default_factory=lambda: translation_pose((-1.5, -1.5, 0.5))
    )

    bilateral_sigma_depth: float = 0.04
    bilateral_sigma_spatial: float = 4.5
    bilateral_kernel_size: int = 7

    icp_truncate_depth_dist: float = 0.0
    icp_dist_thres: float = 0.1
    icp_angle_thres: float = np.deg2rad(30.0)
    icp_iter_num: Tuple[int, ...] = (10, 5, 4, 0)

    tsdf_min_camera_movement: float = 0.0
    tsdf_trunc_dist: float = 0.04
    tsdf_max_weight: float = 64.0

    raycast_step_factor: float = 0.75
    gradient_delta_factor: float = 0.5

    light_pose: Tuple[float, float, float] = (0.0, 0.0, 0.0)

    # True = classic KinectFusion frame-to-MODEL tracking: ICP against the
    # raycasted TSDF (drift-free at fine grids; accuracy is voxel-bounded,
    # so coarse grids favour frame-to-frame). The reference declares the
    # raycast machinery but never wires it (KinFu::operator() undefined).
    track_against_model: bool = False

    @staticmethod
    def default_params() -> "KinFuParams":
        """Reference defaults (kinfu.cpp:10-44)."""
        return KinFuParams()


class KinFu:
    """Rigid KinectFusion-style pipeline over our TSDF + ICP ops."""

    def __init__(self, params: KinFuParams = None):
        self.params_ = params if params is not None else KinFuParams.default_params()
        p = self.params_

        # Build a sobfu Params shim so TsdfVolume can consume it.
        from sobfu_tpu.config import Params

        vol_params = Params(
            cols=p.cols,
            rows=p.rows,
            volume_dims=p.volume_dims,
            volume_size=p.volume_size,
            volume_pose=p.volume_pose,
            intr=p.intr,
            tsdf_trunc_dist=p.tsdf_trunc_dist,
            eta=p.tsdf_trunc_dist,  # rigid path has no eta; reuse trunc band
            tsdf_max_weight=p.tsdf_max_weight,
            gradient_delta_factor=p.gradient_delta_factor,
        )
        from sobfu_tpu.tsdf import TsdfVolume

        self.volume_ = TsdfVolume(vol_params)
        self.icp_ = ProjectiveICP()
        self.icp_.dist_thres = p.icp_dist_thres
        self.icp_.angle_thres = p.icp_angle_thres
        self.icp_.set_iterations(p.icp_iter_num)

        self.frame_counter_ = 0
        self.poses_: List[np.ndarray] = [np.eye(4, dtype=np.float32)]
        self._prev_points = None
        self._prev_normals = None

    # -- accessors (kinfu.cpp:47-62) ----------------------------------------
    def params(self) -> KinFuParams:
        return self.params_

    def tsdf(self):
        return self.volume_

    def icp(self) -> ProjectiveICP:
        return self.icp_

    def reset(self) -> None:
        """Reference KinFu::reset (kinfu.cpp:100-109)."""
        if self.frame_counter_:
            print("Reset")
        self.frame_counter_ = 0
        self.poses_ = [np.eye(4, dtype=np.float32)]
        self.volume_.clear()
        self._prev_points = None
        self._prev_normals = None

    def get_camera_pose(self, time: int = -1) -> np.ndarray:
        """Reference KinFu::getCameraPose (kinfu.cpp:111-117)."""
        # `>=` (not the reference's `>`): time == len(poses_) would fall
        # through the guard in kinfu.cpp:111-117 and index out of range.
        if time >= len(self.poses_) or time < 0:
            time = len(self.poses_) - 1
        return self.poses_[time]

    # -- per-frame step ------------------------------------------------------
    def __call__(self, depth: jnp.ndarray) -> bool:
        """Process one uint16 depth frame (mm): track rigidly + integrate.

        Returns True when tracking succeeded (always True for frame 0).
        """
        p = self.params_
        filtered = imgproc.bilateral_filter(
            jnp.asarray(depth),
            p.bilateral_kernel_size,
            p.bilateral_sigma_spatial,
            p.bilateral_sigma_depth,
        )
        if p.icp_truncate_depth_dist > 0:
            filtered = imgproc.truncate_depth(
                filtered, jnp.float32(p.icp_truncate_depth_dist)
            )

        levels = self.icp_.used_levels()
        _, points, normals = self.icp_.build_pyramid(
            filtered, p.intr, max(levels, 1), p.bilateral_sigma_depth
        )

        if self.frame_counter_ == 0:
            dists = imgproc.compute_dists(
                filtered,
                jnp.asarray([p.intr.fx, p.intr.fy, p.intr.cx, p.intr.cy], jnp.float32),
            )
            self.volume_.integrate(dists, self.poses_[-1], p.intr)
            self._prev_points, self._prev_normals = points, normals
            self.frame_counter_ += 1
            return True

        if p.track_against_model:
            # frame-to-model: render the fused TSDF from the last pose and
            # track against that (classic KinectFusion; drift-free surface)
            from sobfu_tpu.raycast import raycast_volume

            H, W = p.rows, p.cols
            prev_points, prev_normals = [], []
            for lvl in range(self.icp_.used_levels()):
                i = p.intr.level(lvl)
                _, pts, nrm = raycast_volume(
                    self.volume_, self.poses_[-1], i,
                    H >> lvl, W >> lvl, p.raycast_step_factor,
                )
                invalid = jnp.abs(pts[..., 2]) <= 0
                prev_points.append(jnp.where(invalid[..., None], jnp.nan, pts))
                prev_normals.append(jnp.where(invalid[..., None], jnp.nan, nrm))
        else:
            prev_points, prev_normals = self._prev_points, self._prev_normals

        Tinc, ok = self.icp_.estimate_transform(
            p.intr, points, normals, prev_points, prev_normals
        )
        if not ok:
            self.reset()
            return False

        pose = self.poses_[-1] @ np.linalg.inv(Tinc)
        self.poses_.append(pose.astype(np.float32))

        movement = np.linalg.norm(Tinc[:3, 3])
        if movement >= p.tsdf_min_camera_movement:
            dists = imgproc.compute_dists(
                filtered,
                jnp.asarray([p.intr.fx, p.intr.fy, p.intr.cx, p.intr.cy], jnp.float32),
            )
            self.volume_.integrate(dists, pose, p.intr)

        self._prev_points, self._prev_normals = points, normals
        self.frame_counter_ += 1
        return True
