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

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sobfu_tpu import solver as solver_mod
from sobfu_tpu.config import Params
from sobfu_tpu.fields import DeformationField
from sobfu_tpu.ops import imgproc
from sobfu_tpu.tsdf import TsdfVolume


@functools.partial(
    jax.jit,
    static_argnames=(
        "dims_zyx",
        "bilateral_kernel_size",
        "bilateral_sigma_spatial",
        "bilateral_sigma_depth",
        "trunc_depth",
        "warp_window",
        "inverse_iters",
        "momentum",
        "n_chunks",
        "conv_mxu",
        "fused_db",
        "taps_static",
        "pyramid_levels",
        "x_pad_to",
        "fine_window",
        "stall_window",
        "stall_rel",
        "skip_inv_warps",
        "inv_multigrid",
        "inner_steps",
        "inv_coarse",
        "fold_xmats",
        "solver_mode",
        "axis_aligned",
        "skip_weight_warp",
        "new_surface_gate",
    ),
)
def fused_frame_step(
    depth,
    tsdf_g,
    weight_g,
    psi,
    taps,
    vol2cam,
    intr_arr,
    voxel_sizes,
    trunc_dist,
    eta,
    max_weight,
    alpha,
    w_reg,
    max_iter,
    thresh,
    psi_inv0=None,
    *,
    dims_zyx,
    bilateral_kernel_size=7,
    bilateral_sigma_spatial=4.5,
    bilateral_sigma_depth=0.04,
    trunc_depth=0.0,
    warp_window=None,
    inverse_iters=48,
    momentum=None,
    n_chunks=0,
    conv_mxu=False,
    fused_db=False,
    taps_static=None,
    pyramid_levels=1,
    x_pad_to=0,
    fine_window=None,
    stall_window=0,
    stall_rel=1e-3,
    skip_inv_warps=False,
    inv_multigrid=False,
    inner_steps=0,
    inv_coarse=False,
    fold_xmats=False,
    solver_mode="additive",
    axis_aligned=False,
    skip_weight_warp=False,
    new_surface_gate=0.0,
):
    """One COMPLETE non-rigid frame under a single jit: preprocess ->
    integrate phi_n -> Sobolev solve -> fuse into phi_global.

    The reference dispatched each stage as separate kernel launches
    (sob_fusion.cpp:71-145); a multi-dispatch Python loop additionally pays
    a host->device round-trip per stage on a tunneled TPU — fusing the
    whole frame into one compiled program removes that overhead entirely.

    Returns (tsdf_g', weight_g', SolveResult).
    """
    filtered = imgproc.bilateral_filter(
        depth, bilateral_kernel_size, bilateral_sigma_spatial, bilateral_sigma_depth
    )
    if trunc_depth > 0:
        filtered = imgproc.truncate_depth(filtered, jnp.float32(trunc_depth))
    dists = imgproc.compute_dists(filtered, intr_arr)

    from sobfu_tpu.tsdf import fuse_volumes, integrate_dists

    zeros = jnp.zeros(dims_zyx, jnp.float32)
    tn, wn = integrate_dists(
        zeros, zeros, dists, vol2cam, intr_arr, voxel_sizes,
        trunc_dist, eta, dims_zyx, axis_aligned=axis_aligned,
    )

    if solver_mode == "compositive":
        # UNBOUNDED-drift mode under the same single jit (round-4 VERDICT
        # item 3): the increment solve is window-bounded by construction,
        # the T0 warp / final composition / incremental inverse use exact
        # gathers, so arbitrary ACCUMULATED deformation is handled — the
        # TPU counterpart of the reference's texture-gather warps
        # (vector_fields.cu:81-109). Mirrors Solver.estimate_psi's staged
        # compositive call, minus energy recording (verbose runs stay on
        # the staged path).
        res = solver_mod.estimate_psi_compositive(
            psi, tsdf_g, weight_g, tn, wn, taps, alpha, w_reg, max_iter,
            thresh, psi_inv0,
            warp_window=warp_window or 2,
            n_chunks=0 if fused_db else n_chunks,
            momentum=momentum,
            conv_mxu=conv_mxu,
            fused_db=fused_db,
            taps_static=taps_static if fused_db else None,
            x_pad_to=x_pad_to,
            stall_window=stall_window if (fused_db or not n_chunks) else 0,
            stall_rel=stall_rel,
            skip_inv_warps=skip_inv_warps,
            # no-log loop: psi_inv's only consumer would be its own next-
            # frame warm start — skip maintaining it (the pipeline's
            # _refresh_inv_warps recomputes the exact cold inverse on
            # demand)
            skip_inverse=skip_inv_warps,
            inner_steps=inner_steps,
            fold_xmats=fold_xmats,
            # the increment pyramid is monolithic/fused only
            pyramid_levels=(
                pyramid_levels if (fused_db or not n_chunks) else 1
            ),
        )
    elif pyramid_levels > 1:
        res = solver_mod.estimate_psi_pyramid(
            psi, tsdf_g, weight_g, tn, wn, taps, alpha, w_reg, max_iter,
            thresh, psi_inv0, levels=pyramid_levels,
            inverse_iters=inverse_iters, warp_window=warp_window,
            momentum=momentum, conv_mxu=conv_mxu, fused_db=fused_db,
            taps_static=taps_static, x_pad_to=x_pad_to,
            fine_window=fine_window,
            stall_window=stall_window, stall_rel=stall_rel,
            skip_inv_warps=skip_inv_warps,
            skip_weight_warp=skip_weight_warp,
            inv_multigrid=inv_multigrid,
            inv_coarse=inv_coarse and skip_inv_warps,
            fold_xmats=fold_xmats,
        )
    elif n_chunks:
        res = solver_mod.estimate_psi_chunked(
            psi, tsdf_g, weight_g, tn, wn, taps, alpha, w_reg, max_iter,
            thresh, psi_inv0, n_chunks=n_chunks, warp_window=warp_window or 2,
            inverse_iters=inverse_iters, momentum=momentum,
            conv_mxu=conv_mxu,
        )
    else:
        res = solver_mod.estimate_psi(
            psi, tsdf_g, weight_g, tn, wn, taps, alpha, w_reg, max_iter,
            thresh, psi_inv0, warp_window=warp_window,
            inverse_iters=inverse_iters, momentum=momentum,
            conv_mxu=conv_mxu, fused_db=fused_db, taps_static=taps_static,
            x_pad_to=x_pad_to,
            stall_window=stall_window, stall_rel=stall_rel,
            skip_inv_warps=skip_inv_warps,
            skip_weight_warp=skip_weight_warp,
            inner_steps=inner_steps,
            fold_xmats=fold_xmats,
        )

    # surface-confidence gate on NEW canonical surface (tsdf.
    # fuse_volumes_gated): voxels the canonical knows nothing about only
    # accept newly-seen surface where psi is near-identity
    if new_surface_gate > 0:
        from sobfu_tpu import fields

        disp_norm = jnp.max(
            jnp.abs(res.psi - fields.identity_field(dims_zyx)), axis=0
        )

        def fuse(tg, wg, tnp, wnp, mw):
            from sobfu_tpu.tsdf import fuse_volumes_gated

            return fuse_volumes_gated(
                tg, wg, tnp, wnp, mw, disp_norm,
                jnp.float32(new_surface_gate),
            )
    else:
        fuse = fuse_volumes

    # the chunked branch above has no skip_weight_warp plumbing: only the
    # pyramid / plain estimate_psi branches can have skipped the tail
    skipped = (
        skip_weight_warp
        and solver_mode == "additive"
        and (pyramid_levels > 1 or not n_chunks)
    )
    if skipped:
        # the solver skipped its weight-warp tail (res.weight_n_psi is the
        # UNWARPED weight_n); the warp rides the fuse pass instead — on the
        # Pallas path a single pipeline kernel, on CPU the XLA window ops
        K = warp_window or 2
        if fused_db and new_surface_gate <= 0:
            from sobfu_tpu.ops.pallas_kernels import window_warp_fuse_pallas

            tg2, wg2 = window_warp_fuse_pallas(
                tsdf_g, weight_g, res.tsdf_n_psi, wn, res.psi, max_weight,
                K=K,
            )
        else:
            from sobfu_tpu import fields

            wnp = fields.sample_nearest_floor_window(wn, res.psi, max_disp=K)
            tg2, wg2 = fuse(
                tsdf_g, weight_g, res.tsdf_n_psi, wnp, max_weight
            )
            # the XLA fallback materialised wnp anyway — hand it back so
            # phi_n_psi.weight stays correct (only the Pallas one-pass
            # kernel leaves it stale; SobFusion._n_psi_weight_stale)
            res = res._replace(weight_n_psi=wnp)
    else:
        tg2, wg2 = fuse(
            tsdf_g, weight_g, res.tsdf_n_psi, res.weight_n_psi, max_weight
        )
    return tg2, wg2, tn, wn, res


class SobFusion:
    """Stateful frame-loop driver (reference include/sobfu/sob_fusion.hpp:21-74)."""

    def __init__(self, params: Params):
        self.params = params
        self.frame_counter = 0
        self.poses = [np.eye(4, dtype=np.float32)]
        # phi_global o psi_inv is a VISUALISATION product (the reference
        # extracts its mesh for display, sob_fusion.cpp:43-49). When no
        # per-frame consumer exists (no --enable-log / viewer), the CLI
        # sets this False and the two warps are skipped in the frame step
        # (~9 ms at 256^3); get_phi_global_psi_inv_mesh recomputes them on
        # demand.
        self.need_inv_warps = True
        self._inv_warps_stale = False
        # phi_n_psi.weight is likewise a per-frame product with no no-log
        # consumer: on the Pallas production path the floor warp of
        # weight_n rides the fuse kernel (window_warp_fuse_pallas) and the
        # standalone warped copy is never materialised; consumers refresh
        # it on demand (_refresh_n_psi_weight).
        self._n_psi_weight_stale = False

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

    def _coarse_inv_carry(self) -> bool:
        """True when the frame loop will carry psi_inv at HALF resolution:
        the fused no-log production path with Solver.inv_coarse active.
        Must mirror the use_fused gate in __call__ plus the conditions
        under which estimate_psi's multigrid inverse actually runs with
        return_coarse (pyramid path, even dims)."""
        s, p = self.solver, self.params
        return bool(
            s.inv_coarse
            and s.inverse_warm
            and not self.need_inv_warps
            and p.verbosity == 0
            and getattr(p, "solver_mode", "additive") == "additive"
            and not s.use_pallas
            and s.pyramid_levels > 1
            and all(d % 2 == 0 for d in p.volume_dims)
        )

    def _preprocess(self, depth):
        p = self.params
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
        return imgproc.compute_dists(filtered, self._intr_arr)

    # -- per-frame entry (reference sob_fusion.cpp:71-145) -------------------
    def __call__(self, depth: jnp.ndarray, image=None) -> bool:
        """Process one uint16 depth frame (mm). Returns True."""
        p = self.params
        if p.verbosity > 0:
            print(f"--- FRAME NO. {self.frame_counter} ---")

        if self.frame_counter == 0:
            self.phi_global = TsdfVolume(p)
            self.phi_global.integrate(self._preprocess(depth), self.poses[-1], p.intr)

            self.phi_global_psi_inv = TsdfVolume(p)
            self.phi_n = TsdfVolume(p)
            self.phi_n_psi = TsdfVolume(p)

            self.psi = DeformationField(p.volume_dims)
            self.solver = solver_mod.Solver(p)
            # psi_inv is allocated AT ITS CARRY RESOLUTION: with the
            # half-res inverse carry active (Solver.inv_coarse on the
            # no-log fused loop) the solve returns psi_inv half-res from
            # frame 1 on — seeding it full-res here would flip the
            # psi_inv0 operand shape between frame 1 and frame 2 and
            # re-trace fused_frame_step (a second full Mosaic+XLA compile
            # of the whole frame landing mid-run; round-4 VERDICT item 1).
            inv_dims = p.volume_dims
            if self._coarse_inv_carry():
                inv_dims = tuple(d // 2 for d in p.volume_dims)
            self.psi_inv = DeformationField(inv_dims)

            self.frame_counter += 1
            return True

        if self.frame_counter < p.start_frame:
            self.phi_n.clear()
            self.phi_n.integrate(self._preprocess(depth), self.poses[-1], p.intr)
            self.phi_global.integrate_volume(self.phi_n)
            self.frame_counter += 1
            return True

        # single-dispatch fast path: whole frame (preprocess -> integrate ->
        # solve -> fuse) under one jit, for both the additive and the
        # compositive (unbounded-drift) solver modes. Verbose mode and the
        # use_pallas variant use the staged path instead.
        mode = getattr(p, "solver_mode", "additive")
        use_fused = (
            p.verbosity == 0
            and mode in ("additive", "compositive")
            and not self.solver.use_pallas
        )
        if use_fused:
            vol2cam = (
                np.linalg.inv(np.asarray(self.poses[-1], np.float32))
                @ self.phi_global.pose
            )
            # rotation-free pose (the reference app's own regime: static
            # camera + pure-translation volume pose, demo.cpp:71-74) ->
            # separable MXU projection in integrate_dists. Static arg;
            # constant across a run, so no re-trace.
            axis_aligned = bool(
                np.allclose(vol2cam[:3, :3], np.eye(3), atol=1e-6)
            )
            # no-log loop: fold the weight_n floor warp into the fuse
            # stage (Pallas: one pipeline pass; XLA: same two ops, with
            # weight_n_psi handed back). phi_n_psi.weight consumers
            # refresh on demand, mirroring need_inv_warps.
            skip_weight_warp = (
                not self.need_inv_warps
                and mode == "additive"
                and (
                    self.solver.pyramid_levels > 1
                    or not self.solver.z_chunks
                )
            )
            tg2, wg2, tn, wn, res = fused_frame_step(
                jnp.asarray(depth),
                self.phi_global.tsdf,
                self.phi_global.weight,
                self.psi.data,
                self.solver.taps,
                jnp.asarray(vol2cam, jnp.float32),
                self._intr_arr,
                jnp.asarray(self.phi_global.voxel_sizes(), jnp.float32),
                jnp.float32(self.phi_global.trunc_dist),
                jnp.float32(self.phi_global.eta),
                jnp.float32(self.phi_global.max_weight),
                jnp.float32(p.alpha),
                jnp.float32(p.w_reg),
                jnp.int32(p.max_iter),
                jnp.float32(p.max_update_norm),
                self.psi_inv.data
                if (
                    self.solver.incremental_inverse
                    if mode == "compositive"
                    else self.solver.inverse_warm
                )
                else None,
                dims_zyx=self.phi_global.dims_zyx,
                bilateral_kernel_size=p.bilateral_kernel_size,
                bilateral_sigma_spatial=p.bilateral_sigma_spatial,
                bilateral_sigma_depth=p.bilateral_sigma_depth,
                trunc_depth=p.icp_truncate_depth_dist,
                warp_window=self.solver.warp_window,
                momentum=self.solver.momentum,
                n_chunks=self.solver.z_chunks,
                inverse_iters=self.solver.inverse_iters,
                conv_mxu=self.solver.conv_mxu,
                fused_db=self.solver.fused_pallas,
                taps_static=(
                    self.solver.taps_static
                    if self.solver.fused_pallas
                    else None
                ),
                pyramid_levels=self.solver.pyramid_levels,
                x_pad_to=self.solver.x_pad_to,
                fine_window=self.solver.fine_window,
                stall_window=self.solver.stall_window,
                stall_rel=self.solver.stall_rel,
                skip_inv_warps=not self.need_inv_warps,
                inv_multigrid=self.solver.inv_multigrid,
                inner_steps=self.solver.inner_steps,
                inv_coarse=self.solver.inv_coarse,
                fold_xmats=self.solver.fold_xmats,
                solver_mode=mode,
                axis_aligned=axis_aligned,
                skip_weight_warp=skip_weight_warp,
                new_surface_gate=float(
                    getattr(p, "new_surface_gate", 0.0) or 0.0
                ),
            )
            self.phi_n.tsdf, self.phi_n.weight = tn, wn
            self.psi.data = res.psi
            self.psi_inv.data = res.psi_inv
            self.phi_n_psi.tsdf = res.tsdf_n_psi
            self.phi_n_psi.weight = res.weight_n_psi
            # only the Pallas one-pass fuse leaves weight_n_psi unwarped
            # (the XLA fallback hands the materialised warp back; the
            # surface-confidence gate routes through the XLA fuse too)
            self._n_psi_weight_stale = bool(
                skip_weight_warp
                and self.solver.fused_pallas
                and not getattr(p, "new_surface_gate", 0.0)
            )
            if self.need_inv_warps:
                self.phi_global_psi_inv.tsdf = res.tsdf_global_psi_inv
                self.phi_global_psi_inv.weight = res.weight_global_psi_inv
            else:
                self._inv_warps_stale = True
            self.phi_global.tsdf, self.phi_global.weight = tg2, wg2
            self.last_solve = res
        else:
            self.phi_n.clear()
            self.phi_n.integrate(self._preprocess(depth), self.poses[-1], p.intr)
            self.last_solve = self.solver.estimate_psi(
                self.phi_global,
                self.phi_global_psi_inv,
                self.phi_n,
                self.phi_n_psi,
                self.psi,
                self.psi_inv,
            )
            gate = float(getattr(p, "new_surface_gate", 0.0) or 0.0)
            if gate > 0:
                from sobfu_tpu import fields
                from sobfu_tpu.tsdf import fuse_volumes_gated

                disp_norm = jnp.max(
                    jnp.abs(
                        self.psi.data
                        - fields.identity_field(self.phi_global.dims_zyx)
                    ),
                    axis=0,
                )
                self.phi_global.tsdf, self.phi_global.weight = (
                    fuse_volumes_gated(
                        self.phi_global.tsdf, self.phi_global.weight,
                        self.phi_n_psi.tsdf, self.phi_n_psi.weight,
                        jnp.float32(self.phi_global.max_weight),
                        disp_norm, jnp.float32(gate),
                    )
                )
            else:
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

    def _refresh_inv_warps(self):
        """Recompute phi_global o psi_inv on demand (skipped in the frame
        step when no per-frame consumer exists — see need_inv_warps)."""
        from sobfu_tpu import fields

        K = self.solver.warp_window
        tg, wg = self.phi_global.tsdf, self.phi_global.weight
        if self.solver.mode == "compositive":
            # the no-log compositive loop skips inverse maintenance
            # entirely (solver skip_inverse) and the accumulated field is
            # UNBOUNDED: recompute the exact cold inverse (reference
            # semantics, 48-step fixed point from identity,
            # vector_fields.cu:111-138) and warp with exact gathers.
            inv = fields.estimate_inverse(self.psi.data, 48)
            self.psi_inv.data = inv
            self.phi_global_psi_inv.tsdf = fields.sample_trilinear(tg, inv)
            self.phi_global_psi_inv.weight = fields.sample_nearest_floor(
                wg, inv
            )
            self._inv_warps_stale = False
            return
        inv = self.psi_inv.data
        if inv.shape[1:] != tg.shape:
            # half-res inverse carry (Solver.inv_coarse): materialise the
            # full-res inverse on demand — upsample the coarse fixed point
            # and anchor with one full-res step against the current psi
            # (the step estimate_inverse_multigrid's fine_iters=1 runs)
            dims_c = inv.shape[1:]
            ident_c = fields.identity_field(dims_c)
            ident_f = fields.identity_field(tg.shape)
            q0 = ident_f + solver_mod._resample_disp(
                inv - ident_c, tg.shape, 2.0
            )
            inv = fields.estimate_inverse_window(
                self.psi.data, iters=1, max_disp=K or 2, init=q0
            )
        if K is not None:
            self.phi_global_psi_inv.tsdf = fields.sample_trilinear_window(
                tg, inv, max_disp=K
            )
            self.phi_global_psi_inv.weight = (
                fields.sample_nearest_floor_window(wg, inv, max_disp=K)
            )
        else:
            self.phi_global_psi_inv.tsdf = fields.sample_trilinear(tg, inv)
            self.phi_global_psi_inv.weight = fields.sample_nearest_floor(
                wg, inv
            )
        self._inv_warps_stale = False

    def get_phi_global_psi_inv_mesh(self):
        if self._inv_warps_stale:
            self._refresh_inv_warps()
        return self._get_mesh(self.phi_global_psi_inv)

    def get_phi_n_mesh(self):
        return self._get_mesh(self.phi_n)

    def _refresh_n_psi_weight(self):
        """Recompute phi_n_psi.weight on demand: the Pallas production
        fuse pass warps weight_n in-kernel and never materialises the
        standalone warped copy (see skip_weight_warp in __call__)."""
        from sobfu_tpu import fields

        K = self.solver.warp_window or 2
        self.phi_n_psi.weight = fields.sample_nearest_floor_window(
            self.phi_n.weight, self.psi.data, max_disp=K
        )
        self._n_psi_weight_stale = False

    def get_phi_n_psi_mesh(self):
        if self._n_psi_weight_stale:
            self._refresh_n_psi_weight()
        return self._get_mesh(self.phi_n_psi)

    def get_deformation_field(self) -> DeformationField:
        return self.psi
