"""Rigid projective ICP (point-to-plane, coarse-to-fine).

TPU-native rework of the reference ProjectiveICP
(src/kfusion/projective_icp.cpp, src/kfusion/cuda/proj_icp.cu): the
correspondence search, the 6x6 normal-equation reduction AND the SVD solve
all stay on device inside a `lax.fori_loop` — the reference round-tripped
the 27 partial sums through pinned host memory and solved with OpenCV every
iteration (projective_icp.cpp:115-156).

Per candidate pixel (proj_icp.cu:72-98):
  s = T * backproject(curr)            (current point into prev frame)
  project s -> prev pixel; reject if behind camera / out of image
  d = prev point at that pixel;        reject if invalid
  reject if ||s - d||^2 > dist_thres^2
  reject if |<R n_curr, n_prev>| < cos(angle_thres)
accepted rows (proj_icp.cu:344-347):
  row = [cross(s, n_prev), n_prev | dot(n_prev, d - s)]
solve (A = sum rr^T, b = sum r*r6) with lstsq; T <- Tinc(r) * T.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sobfu_tpu.config import Intr
from sobfu_tpu.ops import imgproc

MAX_PYRAMID_LEVELS = 4  # reference projective_icp.hpp:9
DEFAULT_ITERS = (10, 5, 4, 0)  # reference projective_icp.cpp:63-66


def rodrigues(rvec: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle -> rotation matrix (cv::Affine3f(rvec, t) semantics)."""
    theta = jnp.linalg.norm(rvec)
    safe = jnp.maximum(theta, 1e-12)
    k = rvec / safe
    K = jnp.array(
        [
            [0.0, -k[2], k[1]],
            [k[2], 0.0, -k[0]],
            [-k[1], k[0], 0.0],
        ]
    )
    R = (
        jnp.eye(3)
        + jnp.sin(theta) * K
        + (1.0 - jnp.cos(theta)) * (K @ K)
    )
    return jnp.where(theta < 1e-12, jnp.eye(3), R)


def _affine(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    T = jnp.eye(4)
    T = T.at[:3, :3].set(R)
    T = T.at[:3, 3].set(t)
    return T


@functools.partial(jax.jit, static_argnames=("iters",))
def _icp_level(
    affine: jnp.ndarray,
    points_curr: jnp.ndarray,
    normals_curr: jnp.ndarray,
    points_prev: jnp.ndarray,
    normals_prev: jnp.ndarray,
    intr: jnp.ndarray,
    dist2_thresh: jnp.ndarray,
    min_cosine: jnp.ndarray,
    iters: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run `iters` point-to-plane iterations at one pyramid level.

    Returns (affine, ok) — ok becomes False if the normal system ever
    degenerates (reference nullspace check, projective_icp.cpp:142-148).
    """
    H, W = points_curr.shape[:2]
    fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]

    def body(_, carry):
        T, ok = carry
        R, t = T[:3, :3], T[:3, 3]

        s = points_curr @ R.T + t  # [H, W, 3]
        ns = normals_curr @ R.T

        u = fx * s[..., 0] / s[..., 2] + cx
        v = fy * s[..., 1] / s[..., 2] + cy
        in_img = (s[..., 2] > 0) & (u >= 0) & (v >= 0) & (u < W) & (v < H)
        # nearest-pixel correspondence (the reference point-samples a CUDA
        # texture at the projected coordinate, proj_icp.cu:49-57); rounding
        # keeps self-correspondence exact under float projection noise
        ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, W - 1)
        vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, H - 1)
        flat = vi * W + ui

        d = jnp.take(points_prev.reshape(-1, 3), flat, axis=0)
        nd = jnp.take(normals_prev.reshape(-1, 3), flat, axis=0)

        dist2 = jnp.sum((s - d) ** 2, axis=-1)
        cosine = jnp.abs(jnp.sum(ns * nd, axis=-1))
        valid = (
            ~jnp.isnan(points_curr[..., 0])
            & in_img
            & ~jnp.isnan(d[..., 0])
            & (dist2 <= dist2_thresh)
            & (cosine >= min_cosine)
        )

        r03 = jnp.cross(s, nd)
        r36 = nd
        r6 = jnp.sum(nd * (d - s), axis=-1)
        rows = jnp.concatenate([r03, r36, r6[..., None]], axis=-1)  # [H,W,7]
        rows = jnp.where(valid[..., None], rows, 0.0).reshape(-1, 7)

        G = rows.T @ rows  # [7, 7] normal system (one matmul on the MXU)
        A, b = G[:6, :6], G[:6, 6]

        det_ok = jnp.abs(jnp.linalg.det(A)) >= 1e-15
        sol = jnp.linalg.lstsq(A, b)[0]
        sol = jnp.where(jnp.isfinite(sol), sol, 0.0)
        Tinc = _affine(rodrigues(sol[:3]), sol[3:])
        T_new = jnp.where(det_ok, Tinc @ T, T)
        return T_new, ok & det_ok

    return jax.lax.fori_loop(0, iters, body, (affine, jnp.bool_(True)))


class ProjectiveICP:
    """Parity surface with reference kfusion::cuda::ProjectiveICP."""

    def __init__(self):
        self.angle_thres = np.deg2rad(20.0)
        self.dist_thres = 0.1
        self.iters: List[int] = list(DEFAULT_ITERS)

    def set_iterations(self, iters: Sequence[int]) -> None:
        it = list(iters)[:MAX_PYRAMID_LEVELS]
        it += [0] * (MAX_PYRAMID_LEVELS - len(it))
        self.iters = it

    def used_levels(self) -> int:
        n = MAX_PYRAMID_LEVELS
        while n > 0 and self.iters[n - 1] == 0:
            n -= 1
        return n

    # -- pyramid builders ---------------------------------------------------
    @staticmethod
    def build_pyramid(depth: jnp.ndarray, intr: Intr, levels: int, sigma_depth: float = 0.04):
        """Depth + point + normal pyramids from a uint16 depth map."""
        depths, points, normals = [], [], []
        d = depth
        for lvl in range(levels):
            i = intr.level(lvl)
            arr = jnp.asarray([i.fx, i.fy, i.cx, i.cy], jnp.float32)
            p, n = imgproc.compute_points_normals(d, arr)
            depths.append(d)
            points.append(p)
            normals.append(n)
            if lvl + 1 < levels:
                d = imgproc.depth_pyramid_down(d, jnp.float32(sigma_depth))
        return depths, points, normals

    # -- main solve (reference projective_icp.cpp:115-156) ------------------
    def estimate_transform(
        self,
        intr: Intr,
        points_curr: List[jnp.ndarray],
        normals_curr: List[jnp.ndarray],
        points_prev: List[jnp.ndarray],
        normals_prev: List[jnp.ndarray],
    ) -> Tuple[np.ndarray, bool]:
        """Coarse-to-fine point-to-plane ICP. Returns (4x4 affine, success)."""
        levels = self.used_levels()
        T = jnp.eye(4)
        ok_all = True
        for lvl in range(levels - 1, -1, -1):
            if self.iters[lvl] == 0:
                continue
            i = intr.level(lvl)
            T, ok = _icp_level(
                T,
                points_curr[lvl],
                normals_curr[lvl],
                points_prev[lvl],
                normals_prev[lvl],
                jnp.asarray([i.fx, i.fy, i.cx, i.cy], jnp.float32),
                jnp.float32(self.dist_thres**2),
                jnp.float32(np.cos(self.angle_thres)),
                int(self.iters[lvl]),
            )
            ok_all = ok_all and bool(ok)
        return np.asarray(T), ok_all

    def estimate_transform_from_depth(
        self,
        intr: Intr,
        depth_curr: jnp.ndarray,
        depth_prev: jnp.ndarray,
    ) -> Tuple[np.ndarray, bool]:
        levels = self.used_levels()
        _, pc, nc = self.build_pyramid(depth_curr, intr, levels)
        _, pp, np_ = self.build_pyramid(depth_prev, intr, levels)
        return self.estimate_transform(intr, pc, nc, pp, np_)
