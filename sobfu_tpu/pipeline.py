"""The SobFusion pipeline: depth stream -> deforming TSDF reconstruction.

Parity with the reference SobFusion class (src/sobfu/sob_fusion.cpp):

  frame 0:   bilateral filter -> depth truncation -> dists ->
             integrate into phi_global; allocate phi_*, psi, psi_inv, solver
  frame n:   ... -> clear+integrate phi_n;
             if n < start_frame: rigidly fuse phi_n into phi_global
             else: estimate psi (Sobolev GD), fuse phi_n o psi, and
                   keep phi_global o psi_inv warped for visualisation
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from sobfu_tpu import solver as solver_mod
from sobfu_tpu.config import Params
from sobfu_tpu.fields import DeformationField
from sobfu_tpu.ops import imgproc
from sobfu_tpu.tsdf import TsdfVolume


class SobFusion:
    """Stateful frame-loop driver (reference include/sobfu/sob_fusion.hpp:21-74)."""

    def __init__(self, params: Params):
        self.params = params
        self.frame_counter = 0
        self.poses = [np.eye(4, dtype=np.float32)]

        self.phi_global: Optional[TsdfVolume] = None
        self.phi_global_psi_inv: Optional[TsdfVolume] = None
        self.phi_n: Optional[TsdfVolume] = None
        self.phi_n_psi: Optional[TsdfVolume] = None
        self.psi: Optional[DeformationField] = None
        self.psi_inv: Optional[DeformationField] = None
        self.solver: Optional[solver_mod.Solver] = None
        self.last_solve = None

        self._intr_arr = jnp.asarray(
            [params.intr.fx, params.intr.fy, params.intr.cx, params.intr.cy],
            jnp.float32,
        )

    # -- per-frame entry (reference sob_fusion.cpp:71-145) -------------------
    def __call__(self, depth: jnp.ndarray, image=None) -> bool:
        """Process one uint16 depth frame (mm). Returns True."""
        p = self.params
        if p.verbosity > 0:
            print(f"--- FRAME NO. {self.frame_counter} ---")

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
        dists = imgproc.compute_dists(filtered, self._intr_arr)

        if self.frame_counter == 0:
            self.phi_global = TsdfVolume(p)
            self.phi_global.integrate(dists, self.poses[-1], p.intr)

            self.phi_global_psi_inv = TsdfVolume(p)
            self.phi_n = TsdfVolume(p)
            self.phi_n_psi = TsdfVolume(p)

            self.psi = DeformationField(p.volume_dims)
            self.psi_inv = DeformationField(p.volume_dims)
            self.solver = solver_mod.Solver(p)

            self.frame_counter += 1
            return True

        self.phi_n.clear()
        self.phi_n.integrate(dists, self.poses[-1], p.intr)

        if self.frame_counter < p.start_frame:
            self.phi_global.integrate_volume(self.phi_n)
            self.frame_counter += 1
            return True

        self.last_solve = self.solver.estimate_psi(
            self.phi_global,
            self.phi_global_psi_inv,
            self.phi_n,
            self.phi_n_psi,
            self.psi,
            self.psi_inv,
        )
        self.phi_global.integrate_volume(self.phi_n_psi)

        self.frame_counter += 1
        return True

    # -- mesh getters (reference sob_fusion.cpp:43-49, 147-158) --------------
    def _get_mesh(self, vol: TsdfVolume):
        from sobfu_tpu import mc

        return mc.extract_mesh(
            vol.tsdf, vol.weight, vol.voxel_sizes(), pose=vol.pose
        )

    def get_phi_global_mesh(self):
        return self._get_mesh(self.phi_global)

    def get_phi_global_psi_inv_mesh(self):
        return self._get_mesh(self.phi_global_psi_inv)

    def get_phi_n_mesh(self):
        return self._get_mesh(self.phi_n)

    def get_phi_n_psi_mesh(self):
        return self._get_mesh(self.phi_n_psi)

    def get_deformation_field(self) -> DeformationField:
        return self.psi
