"""Sobolev-gradient warp-field solver.

The reference hot loop (src/sobfu/cuda/solver.cu:85-205) launches ~10 kernels
per gradient-descent iteration and round-trips the convergence norm to the
host every iteration. Here the WHOLE solve is one jit-compiled
``lax.while_loop`` whose convergence predicate lives on device; XLA fuses the
per-iteration elementwise chains and stencils.

Per iteration (solver.cu:114-193):
  1. grad   = central-difference gradient of (phi_n o psi)
  2. L      = negated 6-neighbour Laplacian of psi
  3. dU     = (phi_n_psi - phi_global) * grad + w_reg * L
  4. dU_S   = conv_x(dU) + conv_y(dU) + conv_z(dU)
              — a SUM of three 1-D convolutions of the same source, NOT a
              separable tensor-product filter (solver.cu:290 assigns, :366
              and :443 accumulate). Reproducing this exactly matters for
              output parity.
  5. update = alpha * dU_S ; psi -= update
  6. phi_n_psi = warp(phi_n, psi)
  7. max ||update|| <= max_update_norm -> stop

Afterwards (solver.cu:195-200): psi_inv by 48 fixed-point iterations, then
phi_global_psi_inv = warp(phi_global, psi_inv).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sobfu_tpu import fields
from sobfu_tpu.config import Params


# ---------------------------------------------------------------------------
# Sobolev filter
# ---------------------------------------------------------------------------

# Published 1-D decompositions of the Sobolev filter for the (s, lambda)
# pairs shipped with the method (reference src/sobfu/solver.cpp:160-262).
# Each is the leading singular vector (unit L2 norm) of the unfolded 3-D
# solution of (Id - lambda*L) S = e_center; `sobolev_filter_1d` normalises
# to unit sum exactly as the reference does before use.
_FILTER_TABLE = {
    (3, 0.1): [0.06537, 0.99572, 0.06537],
    (7, 0.05): [0.00006, 0.00015, 0.03917, 0.99846, 0.03917, 0.00015, 0.00006],
    (7, 0.1): [0.00030, 0.00441, 0.06571, 0.99565, 0.06571, 0.00441, 0.00030],
    (7, 0.2): [0.00120, 0.01094, 0.10204, 0.98941, 0.10204, 0.01094, 0.00120],
    (7, 0.4): [0.00169, 0.01312, 0.10927, 0.98781, 0.10927, 0.01312, 0.00169],
    (9, 0.05): [0.000003, 0.00006, 0.00155, 0.03917, 0.99846,
                0.03917, 0.00155, 0.00006, 0.000003],
    (9, 0.1): [0.00002, 0.00030, 0.00441, 0.06571, 0.99565,
               0.06571, 0.00441, 0.00030, 0.00002],
    (11, 0.1): [0.0000015, 0.00002, 0.00030, 0.00441, 0.06571, 0.99565,
                0.06571, 0.00441, 0.00030, 0.00002, 0.0000015],
}


def solve_sobolev_filter_3d(s: int, lam: float) -> np.ndarray:
    """Solve (Id - lambda * L) S = e_center on an s^3 grid -> f32[s,s,s].

    L is the 6-neighbour Laplacian matrix with -6 diagonals and zero-Neumann
    truncation at the patch boundary (reference get_3d_sobolev_filter,
    solver.cpp:107-158 — present there but only printed; here it is actually
    used so arbitrary (s, lambda) work).
    """
    n = s ** 3
    idx = np.arange(n)
    ix = idx % s
    iy = (idx // s) % s
    iz = idx // (s * s)
    L = -6.0 * np.eye(n)
    for dx, dy, dz in [(1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, 1), (0, 0, -1)]:
        jx, jy, jz = ix + dx, iy + dy, iz + dz
        ok = (jx >= 0) & (jx < s) & (jy >= 0) & (jy < s) & (jz >= 0) & (jz < s)
        src = idx[ok]
        dst = (jx + jy * s + jz * s * s)[ok]
        L[src, dst] = 1.0
    e = np.zeros(n)
    e[int(np.floor(n / 2.0))] = 1.0
    S = np.linalg.solve(np.eye(n) - lam * L, e)
    return S.reshape(s, s, s).astype(np.float32)  # index order [z, y, x]


def decompose_filter_1d(S3: np.ndarray) -> np.ndarray:
    """Leading rank-1 factor of a (near-separable) 3-D filter -> unit-L2 1-D taps."""
    s = S3.shape[0]
    U, sv, _ = np.linalg.svd(S3.reshape(s, s * s), full_matrices=False)
    v = U[:, 0]
    if v[s // 2] < 0:
        v = -v
    return v.astype(np.float32)


def sobolev_filter_1d(s: int, lam: float) -> np.ndarray:
    """Unit-sum 1-D Sobolev filter taps for kernel size s and parameter lambda.

    Uses the published table when available (bit-parity with the reference's
    decompose_sobolev_filter, solver.cpp:160-262), otherwise derives the taps
    from the principled (Id - lambda L) solve. Normalised to unit sum.
    """
    key = (int(s), round(float(lam), 6))
    if key in _FILTER_TABLE:
        taps = np.asarray(_FILTER_TABLE[key], dtype=np.float32)
    else:
        taps = decompose_filter_1d(solve_sobolev_filter_3d(int(s), float(lam)))
    return (taps / taps.sum()).astype(np.float32)


# ---------------------------------------------------------------------------
# energies / reductions (reference src/sobfu/reductor.cpp, fully on device)
# ---------------------------------------------------------------------------


def data_energy(tsdf_global: jnp.ndarray, tsdf_n_psi: jnp.ndarray) -> jnp.ndarray:
    """0.5 * sum (phi_global - phi_n_psi)^2 (reductor.cpp:38-43)."""
    d = tsdf_global - tsdf_n_psi
    return 0.5 * jnp.sum(d * d)


@functools.partial(jax.jit, static_argnames=("K",))
def window_guard_margin(psi: jnp.ndarray, K: int = 1) -> jnp.ndarray:
    """Scalar margin (voxels) by which psi's displacement stays INSIDE the
    window-K sampler's exactness interval (-K, K+1) per component.

    The bounded-window warp (:func:`fields.sample_trilinear_window`) is
    exactly trilinear iff every displacement component lies in (-K, K+1);
    outside it silently clamps. This guard makes a window-K solve SAFE
    for arbitrary scenes: solve at the cheap window, check the margin,
    and redo the frame at K+1 when it is <= 0 (bench.py's guarded 64^3
    headline; the fallback costs one extra solve only on frames whose
    motion actually left the window). Positive = exact; negative = the
    warp clamped somewhere.

    Use a CONSERVATIVE threshold, not 0: a clamp-limited solve cannot end
    far outside the window — the data force vanishes once the warp
    saturates, so the field stalls just past the boundary and the
    regulariser pulls it back IN (measured: a 2.4-voxel-motion scene
    solved at K=1 ends with margin +0.15 — wrong, but inside). Production
    recipe: fall back iff margin < 0.5; a genuinely sub-voxel scene ends
    with margin > 1 (tests/test_solver.py::test_window_guard_detects_
    out_of_window_solve), while any legitimate near-boundary scene that
    trips the threshold just pays one conservative K=2 redo.
    """
    disp = psi - fields.identity_field(psi.shape[1:], psi.dtype)
    lo = jnp.min(disp) - jnp.float32(-K)        # distance above -K
    hi = jnp.float32(K + 1) - jnp.max(disp)     # distance below K+1
    return jnp.minimum(lo, hi)


def reg_energy_sobolev(psi: jnp.ndarray) -> jnp.ndarray:
    """0.5 * sum ||J(disp(psi))||_F^2 (reductor.cpp:45-50)."""
    J = fields.deformation_jacobian(psi)
    return 0.5 * jnp.sum(J * J)


def max_update_norm(updates: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(max ||update||, flat argmax index) over f32[3,Z,Y,X] (reductor.cu:342-455)."""
    norm_sq = jnp.sum(updates * updates, axis=0).reshape(-1)
    idx = jnp.argmax(norm_sq)
    return jnp.sqrt(norm_sq[idx]), idx


# ---------------------------------------------------------------------------
# the solve
# ---------------------------------------------------------------------------


class SolverState(NamedTuple):
    psi: jnp.ndarray          # f32[3,Z,Y,X] absolute coords (voxel units)
    tsdf_n_psi: jnp.ndarray   # f32[Z,Y,X]   warped live tsdf
    iter: jnp.ndarray         # i32          iterations completed
    max_norm: jnp.ndarray     # f32          last max-update norm
    energy: jnp.ndarray       # f32[cap, 3]  (e_data, e_reg, max_norm) history
    vel: jnp.ndarray          # f32[3,Z,Y,X] heavy-ball velocity (or scalar 0
                              # when momentum is disabled — no state cost)
    # data-energy stall detector (TPU extension, see estimate_psi docstring):
    # e_ref = data energy at the last checkpoint; stalled latches True when
    # a checkpoint shows no meaningful improvement. Plain python defaults
    # keep every existing constructor call-site valid (scalars carry no
    # state cost through the while_loop).
    e_ref: jnp.ndarray = np.inf
    stalled: jnp.ndarray = False


class SolveResult(NamedTuple):
    psi: jnp.ndarray
    psi_inv: jnp.ndarray
    tsdf_n_psi: jnp.ndarray
    weight_n_psi: jnp.ndarray
    tsdf_global_psi_inv: jnp.ndarray
    weight_global_psi_inv: jnp.ndarray
    iters: jnp.ndarray
    max_norm: jnp.ndarray
    energy: jnp.ndarray


def sobolev_smooth(
    dU: jnp.ndarray, taps: jnp.ndarray, mxu: bool = False
) -> jnp.ndarray:
    """Sum of three axis-wise 1-D replicate-pad convolutions of the SAME input.

    Matches the reference's rows-assign / columns-accumulate / depth-
    accumulate behaviour (solver.cu:290,366,443) — a SUM of 1-D filters,
    not a separable tensor product. Kept as three per-axis replicate-pad
    convolutions: measured FASTER on TPU than a pad-once-all-axes variant
    (whose off-by-r lane slices defeat XLA's aligned vector loads).

    mxu=True evaluates each axis conv as a banded-matrix contraction on the
    MXU (:func:`sobfu_tpu.fields.conv1d_replicate_mxu`) instead of ``s``
    shifted VPU passes — same numbers to f32 round-off.
    """
    conv = fields.conv1d_replicate_mxu if mxu else fields.conv1d_replicate
    return (
        conv(dU, taps, axis=-1)
        + conv(dU, taps, axis=-2)
        + conv(dU, taps, axis=-3)
    )


# NOTE: no donate_argnums — input-buffer donation deadlocks through the
# axon PJRT tunnel used on single-chip TPU pools (verified empirically:
# identical code with donate_argnums=(0,) never returns from its first
# compile). psi is 3 floats/voxel; the copy is cheap relative to the solve.
@functools.partial(
    jax.jit,
    static_argnames=(
        "record_energy",
        "energy_cap",
        "inverse_iters",
        "warp_window",
        "use_pallas",
        "pallas_block_z",
        "pallas_tile_y",
        "taps_static",
        "momentum",
        "conv_mxu",
        "warp_pallas",
        "fused_db",
        "db_interpret",
        "x_pad_to",
        "inner_steps",
        "stall_window",
        "stall_rel",
        "skip_tails",
        "skip_inv_warps",
        "skip_weight_warp",
        "inv_multigrid",
        "inv_coarse",
        "fold_xmats",
    ),
)
def estimate_psi(
    psi: jnp.ndarray,
    tsdf_global: jnp.ndarray,
    weight_global: jnp.ndarray,
    tsdf_n: jnp.ndarray,
    weight_n: jnp.ndarray,
    taps: jnp.ndarray,
    alpha: jnp.ndarray,
    w_reg: jnp.ndarray,
    max_iter: jnp.ndarray,
    max_update_norm_thresh: jnp.ndarray,
    psi_inv0: Optional[jnp.ndarray] = None,
    *,
    record_energy: bool = False,
    energy_cap: int = 0,
    inverse_iters: int = 48,
    warp_window: Optional[int] = None,
    use_pallas: bool = False,
    pallas_block_z: int = 8,
    pallas_tile_y: int = 0,
    taps_static: Optional[Tuple[float, ...]] = None,
    momentum: Optional[float] = None,
    conv_mxu: bool = False,
    warp_pallas: bool = False,
    fused_db: bool = False,
    db_interpret: bool = False,
    x_pad_to: int = 0,
    inner_steps: int = 0,
    stall_window: int = 0,
    stall_rel: float = 1e-3,
    skip_tails: bool = False,
    skip_inv_warps: bool = False,
    skip_weight_warp: bool = False,
    inv_multigrid: bool = False,
    inv_coarse: bool = False,
    fold_xmats: bool = False,
) -> SolveResult:
    """Run the full warp-field solve for one frame; everything stays on device.

    fold_xmats: on the Y-folded multi-iteration path, evaluate the
    lane-axis Sobolev conv + x stencils as block-diagonal (128,128) MXU
    matmuls at HIGHEST precision (:func:`..ops.pallas_kernels._x_matrices_fold`)
    — measured ~7% faster at 64^3 under contention (the x roll+edge-fix
    chain moves off the VPU), max 3e-5 voxel divergence from the FMA tap
    loop over 128 iterations (pure f32 reassociation).

    Matches reference sobfu::device::estimate_psi (solver.cu:85-205), with the
    convergence check in the while_loop predicate instead of a host sync.

    warp_window: when set, all trilinear warps use the gather-free
    bounded-window sampler (:func:`sobfu_tpu.fields.sample_trilinear_window`)
    with this half-width in voxels — the TPU-fast path, exact as long as the
    deformation magnitude stays below the window. None = exact XLA gather.

    use_pallas: run each gradient-descent iteration as ONE fused Pallas
    kernel (:func:`sobfu_tpu.ops.pallas_kernels.fused_gd_step`) — requires
    warp_window (the fused warp is bounded-window) and grid dims tiling
    evenly by (pallas_block_z, pallas_tile_y).

    psi_inv0: optional warm start for the inverse-field fixed point (the
    previous frame's inverse): the fixed point moves little between
    frames, so pair it with a reduced ``inverse_iters`` for the same
    accuracy as the reference's 48-from-identity at a fraction of the
    tail cost. None (default) = identity init, reference semantics.

    momentum: optional heavy-ball coefficient mu (e.g. 0.9) — a TPU
    extension accelerating the reference's plain gradient descent:
    v <- mu*v + dU_S; psi <- psi - alpha*v. None (default) reproduces the
    reference exactly and carries no extra loop state.

    fused_db: run each iteration as ONE double-buffered Pallas kernel
    (:func:`sobfu_tpu.ops.pallas_kernels.fused_gd_iteration_db`) — the
    production TPU hot loop. Requires warp_window and taps_static; supports
    momentum; same numbers as the XLA window path to f32 round-off.

    x_pad_to: lane-pack the fused loop — edge-pad the x (lane) axis of the
    loop state up to this extent so sub-128 grids (e.g. the reference's own
    64^3 headline workload) compile under Mosaic; results on real lanes are
    identical. Only meaningful with fused_db.

    inner_steps: on the Y-FOLDED fused path (X=64 grids), run this many GD
    iterations per kernel launch with ALL loop state VMEM-resident
    (:func:`sobfu_tpu.ops.pallas_kernels.fused_gd_multi_fold`) — no HBM
    state round-trip or pad rebuild between iterations. The while_loop
    then steps in chunks: the convergence/stall stop is checked every
    ``inner_steps`` iterations (each chunk's LAST per-iteration norm /
    energy — may overshoot the single-step stop by up to inner_steps - 1
    iterations; exact for fixed-iteration runs with max_iter divisible by
    inner_steps). Requires stall_window % inner_steps == 0.
    record_energy IS supported: the kernel emits the per-iteration
    verbose bundle (pre-update data/reg energy + update norm) and the
    history receives inner_steps rows per chunk — ``--vverbose`` output
    is identical to the single-step path. 0/1 = one kernel launch per
    iteration.

    skip_tails: skip the per-solve tail computations entirely — the
    inverse-field fixed point and the final psi_inv / weight warps — and
    return pass-through placeholders for them (psi_inv = psi,
    tsdf_global_psi_inv = tsdf_global, weights unwarped). For coarse
    pyramid levels, whose tails are discarded by the caller: at 256^3 the
    tails cost more than the entire coarse iteration loop. The weight
    volumes are untouched in this mode (the GD loop never reads them), so
    callers may pass placeholders for them too.

    skip_inv_warps: skip the phi_global / weight_global warps by psi_inv
    (return pass-throughs for tsdf_global_psi_inv / weight_global_psi_inv)
    while still computing psi_inv itself (needed as the next frame's warm
    start). Those two warped volumes exist for VISUALISATION — the
    reference extracts phi_global o psi_inv meshes for display
    (sob_fusion.cpp:43-49) — and are dead work in a no-log production
    loop (~9 ms/frame at 256^3). The pipeline recomputes them on demand
    when a mesh/log consumer asks.

    stall_window / stall_rel: DATA-ENERGY STALL detector (TPU extension;
    0 = off, exact reference stopping semantics). In warm-started frame
    sequences the data term converges within ~100-200 iterations while the
    regulariser keeps diffusing the ACCUMULATED field — the max-update
    norm then decays ~1/t far above the threshold and every frame burns
    the full iteration cap (the reference behaves identically: its shipped
    configs run 2048-8192 iterations at cap, README's 2 fps). With
    stall_window = N, every N iterations the data energy is measured
    on-device; once an N-iteration checkpoint improves it by less than
    ``stall_rel`` (relative), the loop stops: reconstruction quality has
    converged even though the field is still drifting smoother. Checks
    start at iteration 2N so momentum transients don't trigger it.
    """
    energy0 = jnp.zeros((energy_cap if record_energy else 1, 3), jnp.float32)

    warp_mixed = None
    if warp_window is None:
        warp_scalar = fields.sample_trilinear
        warp_floor = fields.sample_nearest_floor
        inverse = functools.partial(fields.estimate_inverse, iters=inverse_iters)
    elif (warp_pallas or fused_db) and not db_interpret:
        # fused_db implies the Mosaic toolchain works — run the per-solve
        # tails (initial warp, 48-step inverse, final warps) through the
        # pipelined Pallas warp kernel too; with the loop fused these tails
        # otherwise dominate the frame (48 C=3 window samples in XLA).
        from sobfu_tpu.ops.pallas_kernels import (
            estimate_inverse_window_pallas_multi,
            window_warp_pallas,
            window_warp_pallas_mixed,
        )

        warp_scalar = functools.partial(window_warp_pallas, K=warp_window)
        warp_floor = functools.partial(
            window_warp_pallas, K=warp_window, floor=True
        )
        warp_mixed = functools.partial(
            window_warp_pallas_mixed, K=warp_window
        )
        # ALL fixed-point steps in one pipeline launch (weights shared
        # across the 3 channels): 30.5 -> 24.4 ms at 256^3 warm-3
        if inv_multigrid and all(d % 2 == 0 for d in tsdf_n.shape):
            # coarse-to-fine warm inverse — same contract as the
            # compositive path (see estimate_psi_compositive); inv_coarse
            # carries psi_inv at half resolution (warm-start-only
            # product, requires skip_inv_warps)
            assert not inv_coarse or skip_inv_warps
            inverse = functools.partial(
                estimate_inverse_multigrid,
                iters=inverse_iters,
                K=warp_window,
                fine_iters=0 if skip_inv_warps else 1,
                return_coarse=inv_coarse,
            )
        else:
            inverse = functools.partial(
                estimate_inverse_window_pallas_multi,
                iters=inverse_iters,
                K=warp_window,
            )
    else:
        warp_scalar = functools.partial(
            fields.sample_trilinear_window, max_disp=warp_window
        )
        warp_floor = functools.partial(
            fields.sample_nearest_floor_window, max_disp=warp_window
        )
        inverse = functools.partial(
            fields.estimate_inverse_window,
            iters=inverse_iters,
            max_disp=warp_window,
        )

    if fused_db:
        from sobfu_tpu.ops.pallas_kernels import (
            _db_tiles,
            fold_y,
            fused_gd_iteration_db_padded,
            fused_gd_iteration_fold,
            fused_gd_iteration_pp,
            fused_gd_multi_fold,
            pad_for_db,
            pad_for_fold,
            pad_for_pp,
            pad_folded,
            refresh_padded,
            unfold_y,
            unpad_db,
            unpad_folded,
            unpad_pp,
        )

        assert warp_window is not None, "fused_db requires warp_window"
        assert taps_static is not None, "fused_db requires taps_static"
        xl_db = tsdf_n.shape[2] if x_pad_to > tsdf_n.shape[2] else 0
        Zd, Yd, Xd = tsdf_n.shape
        # Y-FOLDED path for X=64 grids: y-pairs packed into the 128-lane
        # dim — no dead lanes, ~2x the VPU throughput of the edge-padding
        # lane packer on the VPU-bound body (the reference's own 64^3
        # headline workload runs here)
        use_fold = Xd * 2 == 128 and Yd % 2 == 0 and Zd % 8 == 0
        use_pp = False
        use_multi = use_fold and inner_steps > 1
        if use_fold:
            xl_db = 0
            tg_pad_db = pad_for_fold(tsdf_global)
            live_pad_db = pad_for_fold(tsdf_n)
            if use_multi:
                # VMEM-resident multi-iteration chunks: padded loop state.
                # record_energy is supported: the kernel emits per-step
                # pre-update data/reg energies + update norms (the verbose
                # bundle), written to the history in inner_steps-row blocks.
                assert stall_window == 0 or stall_window % inner_steps == 0
                if record_energy:
                    assert energy_cap >= inner_steps, (
                        "record_energy with inner_steps needs "
                        "energy_cap >= inner_steps"
                    )
                pad_st = lambda a, _x=0: pad_folded(fold_y(a))  # noqa: E731
                unpad_st = lambda a, _x=0: unfold_y(unpad_folded(a))  # noqa: E731
            else:
                pad_st = lambda a, _x=0: fold_y(a)  # noqa: E731
                unpad_st = lambda a, _x=0: unfold_y(a)  # noqa: E731
        else:
            # ping-pong variant: the kernel writes the padded state itself
            # (no per-iteration refresh copies) — needs >= 2 tiles per axis
            _bz, _ty = _db_tiles(Zd, Yd, x_pad_to or Xd)
            use_pp = Zd // _bz >= 2 and Yd // _ty >= 2
            if use_pp:
                tg_pad_db = pad_for_pp(tsdf_global, x_pad_to)
                live_pad_db = pad_for_pp(tsdf_n, x_pad_to)
            else:
                tg_pad_db = pad_for_db(tsdf_global, x_pad_to)
                live_pad_db = pad_for_db(tsdf_n, x_pad_to)
            pad_st = pad_for_pp if use_pp else pad_for_db
            unpad_st = unpad_pp if use_pp else unpad_db

    step_n = inner_steps if (fused_db and use_fold and use_multi) else 1

    def gd_step(state: SolverState) -> SolverState:
        psi, tsdf_n_psi = state.psi, state.tsdf_n_psi

        e_kern = None
        verb_rows = None
        if fused_db and use_fold and use_multi:
            # inner_steps iterations per launch, state VMEM-resident
            outs = fused_gd_multi_fold(
                psi,
                tsdf_n_psi,
                state.vel if momentum is not None else None,
                tg_pad_db,
                live_pad_db,
                alpha,
                w_reg,
                taps_static,
                K=warp_window,
                n_inner=inner_steps,
                momentum=momentum,
                interpret=db_interpret,
                with_energy=stall_window > 0,
                with_verbose=record_energy,
                use_xmats=fold_xmats,
                xmats_precision=(
                    jax.lax.Precision.HIGHEST if fold_xmats else None
                ),
            )
            psi_new, tsdf_new, vel_new, mx_vec, e_vec = outs[:5]
            if record_energy:
                # per-step verbose bundle from INSIDE the kernel: rows
                # (pre-update data energy, pre-update reg energy, update
                # norm) for each of the chunk's inner_steps iterations
                e_pre_vec, e_reg_vec = outs[5], outs[6]
                verb_rows = jnp.stack(
                    [e_pre_vec, e_reg_vec, jnp.sqrt(mx_vec)], axis=1
                )
            if momentum is None:
                vel_new = state.vel
            mnorm = jnp.sqrt(mx_vec[-1])
            if e_vec is not None:
                e_kern = e_vec[-1]
        elif fused_db and use_fold:
            # state carries the UNPADDED FOLDED arrays (the per-iteration
            # pad rebuild is ~1 MB at 64^3 — noise)
            psi_new, tsdf_new, vel_new, mx_sq, e_kern = (
                fused_gd_iteration_fold(
                    psi,
                    tsdf_n_psi,
                    state.vel if momentum is not None else None,
                    tg_pad_db,
                    live_pad_db,
                    alpha,
                    w_reg,
                    taps_static,
                    K=warp_window,
                    momentum=momentum,
                    interpret=db_interpret,
                    with_energy=stall_window > 0,
                    use_xmats=fold_xmats,
                    xmats_precision=(
                        jax.lax.Precision.HIGHEST if fold_xmats else None
                    ),
                )
            )
            if momentum is None:
                vel_new = state.vel
            mnorm = jnp.sqrt(mx_sq)
        elif fused_db and use_pp:
            # padded ping-pong state: kernel outputs feed straight back in
            psi_new, tsdf_new, vel_new, mx_sq, e_kern = fused_gd_iteration_pp(
                psi,
                tsdf_n_psi,
                state.vel if momentum is not None else None,
                tg_pad_db,
                live_pad_db,
                alpha,
                w_reg,
                taps_static,
                K=warp_window,
                momentum=momentum,
                interpret=db_interpret,
                x_logical=xl_db,
                with_energy=stall_window > 0,
            )
            if momentum is None:
                vel_new = state.vel
            mnorm = jnp.sqrt(mx_sq)
        elif fused_db:
            # state.psi / state.tsdf_n_psi carry the EDGE-PADDED arrays in
            # this branch (refresh_padded updates them in place — cheaper
            # than a full jnp.pad per iteration)
            psi_c, tnp_c, vel_new, mx_sq = fused_gd_iteration_db_padded(
                psi,
                tsdf_n_psi,
                state.vel if momentum is not None else None,
                tg_pad_db,
                live_pad_db,
                alpha,
                w_reg,
                taps_static,
                K=warp_window,
                momentum=momentum,
                interpret=db_interpret,
                x_logical=xl_db,
            )
            psi_new = refresh_padded(psi, psi_c)
            tsdf_new = refresh_padded(tsdf_n_psi, tnp_c)
            if momentum is None:
                vel_new = state.vel
            mnorm = jnp.sqrt(mx_sq)
        elif use_pallas:
            from sobfu_tpu.ops.pallas_kernels import fused_gd_step

            assert warp_window is not None, "use_pallas requires warp_window"
            assert taps_static is not None, "use_pallas requires taps_static"
            psi_new, tsdf_new, mx_sq = fused_gd_step(
                psi,
                tsdf_n_psi,
                tsdf_global,
                tsdf_n,
                alpha,
                w_reg,
                taps_static,
                K=warp_window,
                BZ=pallas_block_z,
                TY=pallas_tile_y,
            )
            vel_new = state.vel
            mnorm = jnp.sqrt(mx_sq)
        else:
            grad = fields.tsdf_gradient(tsdf_n_psi)
            lap = fields.neg_laplacian(psi)
            dU = (tsdf_n_psi - tsdf_global)[None] * grad + w_reg * lap
            dU_S = sobolev_smooth(dU, taps, mxu=conv_mxu)

            if momentum is not None:
                vel_new = momentum * state.vel + dU_S
                update = alpha * vel_new
            else:
                vel_new = state.vel
                update = alpha * dU_S
            psi_new = psi - update
            tsdf_new = warp_scalar(tsdf_n, psi_new)

            norm_sq = jnp.sum(update * update, axis=0)
            mnorm = jnp.sqrt(jnp.max(norm_sq))

        energy = state.energy
        if record_energy and verb_rows is not None:
            # inner_steps rows at once (kernel-computed; see verb_rows)
            energy = jax.lax.dynamic_update_slice(
                energy, verb_rows,
                (jnp.minimum(state.iter, energy_cap - step_n), 0),
            )
        elif record_energy:
            psi_e = unpad_st(psi, xl_db) if fused_db else psi
            tnp_e = unpad_st(tsdf_n_psi, xl_db) if fused_db else tsdf_n_psi
            e = jnp.stack(
                [data_energy(tsdf_global, tnp_e), reg_energy_sobolev(psi_e), mnorm]
            )
            energy = jax.lax.dynamic_update_slice(
                energy, e[None], (jnp.minimum(state.iter, energy_cap - 1), 0)
            )

        e_ref, stalled = state.e_ref, state.stalled
        if stall_window:
            # branch-free: a lax.cond formulation measured ~2x
            # per-iteration cost at 128^3 — the conditional in the loop
            # body defeats XLA's pipelining of the fused kernel. Compute
            # the energy every iteration and gate the UPDATE with where.
            # On the ping-pong path the energy partials come from INSIDE
            # the kernel (e_kern): any outside reduction over the padded
            # loop state forces XLA to copy it each iteration (the pallas
            # custom-call may alias it) — also ~2x, measured 2026-08-17.
            it1 = state.iter + step_n
            if e_kern is not None:
                e_now = e_kern
            else:
                t_e = unpad_st(tsdf_new, xl_db) if fused_db else tsdf_new
                e_now = data_energy(tsdf_global, t_e)
            at_check = (it1 % stall_window) == 0
            stalled = stalled | (
                at_check
                & (it1 >= 2 * stall_window)
                & (e_ref - e_now < jnp.float32(stall_rel) * jnp.abs(e_now))
            )
            e_ref = jnp.where(at_check, e_now, e_ref)

        return SolverState(
            psi_new, tsdf_new, state.iter + step_n, mnorm, energy, vel_new,
            e_ref, stalled,
        )

    def cond(state: SolverState) -> jnp.ndarray:
        return (
            (state.iter < max_iter)
            & (state.max_norm > max_update_norm_thresh)
            & jnp.logical_not(state.stalled)
        )

    tsdf_n_psi0 = warp_scalar(tsdf_n, psi)
    if momentum is not None:
        vel_dims = psi.shape
        if fused_db and use_fold:
            Zv, Yv, Xv = psi.shape[1:]
            vel_dims = (3, Zv, Yv // 2, Xv * 2)  # folded
        elif fused_db and xl_db:
            vel_dims = psi.shape[:-1] + (x_pad_to,)
        vel0 = jnp.zeros(vel_dims, jnp.float32)
    else:
        vel0 = jnp.float32(0.0)
    psi_state = pad_st(psi, x_pad_to) if fused_db else psi
    tnp_state = pad_st(tsdf_n_psi0, x_pad_to) if fused_db else tsdf_n_psi0
    init = SolverState(
        psi_state, tnp_state, jnp.int32(0), jnp.float32(jnp.inf), energy0, vel0
    )
    final = jax.lax.while_loop(cond, gd_step, init)
    psi_final = unpad_st(final.psi, xl_db) if fused_db else final.psi
    tnp_final = (
        unpad_st(final.tsdf_n_psi, xl_db) if fused_db else final.tsdf_n_psi
    )

    if skip_tails:
        psi_inv = psi_final
        tsdf_g_inv = tsdf_global
        weight_g_inv = weight_global
        weight_n_psi = weight_n
    else:
        psi_inv = inverse(psi_final, init=psi_inv0)
        if skip_inv_warps:
            tsdf_g_inv = tsdf_global
            weight_g_inv = weight_global
        elif warp_mixed is not None:
            # tsdf (trilinear) + weight (floor) at the same psi_inv in
            # ONE pipeline pass — shares the psi DMA and tile overhead
            tsdf_g_inv, weight_g_inv = warp_mixed(
                tsdf_global, weight_global, psi_inv
            )
        else:
            tsdf_g_inv = warp_scalar(tsdf_global, psi_inv)
            weight_g_inv = warp_floor(weight_global, psi_inv)
        # skip_weight_warp: the caller fuses the frame with
        # ops.pallas_kernels.window_warp_fuse_pallas, which floor-warps
        # weight_n in the fuse pipeline itself — the separate warp pass
        # here would be dead work (production no-log frame step).
        weight_n_psi = (
            weight_n if skip_weight_warp else warp_floor(weight_n, psi_final)
        )

    return SolveResult(
        psi=psi_final,
        psi_inv=psi_inv,
        tsdf_n_psi=tnp_final,
        weight_n_psi=weight_n_psi,
        tsdf_global_psi_inv=tsdf_g_inv,
        weight_global_psi_inv=weight_g_inv,
        iters=final.iter,
        max_norm=final.max_norm,
        energy=final.energy,
    )


# ---------------------------------------------------------------------------
# coarse-to-fine pyramid solve (TPU extension)
# ---------------------------------------------------------------------------
#
# The reference solves every frame at full resolution only; its own rigid
# ICP, however, is coarse-to-fine over a 4-level pyramid
# (projective_icp.cpp:115-156). This applies the same idea to the non-rigid
# solve: estimate the low-frequency bulk of psi on 2x-downsampled volumes
# (8x cheaper per iteration, and large-scale modes converge in far fewer
# iterations at coarse scale), upsample the displacement, then refine at
# full resolution. Pure warm-starting — the fine level runs the exact same
# update rule to the same threshold, so the fixed point is unchanged; only
# the iteration count to reach it drops.


@functools.lru_cache(maxsize=64)
def _pool2_matrix(n: int) -> np.ndarray:
    """(n//2, n) matrix averaging adjacent pairs (2x mean-pool, one axis)."""
    m = np.zeros((n // 2, n), np.float32)
    idx = np.arange(n // 2)
    m[idx, 2 * idx] = 0.5
    m[idx, 2 * idx + 1] = 0.5
    return m


@functools.lru_cache(maxsize=64)
def _linear_resize_matrix(n: int, m: int) -> np.ndarray:
    """(m, n) matrix reproducing jax.image.resize 'trilinear' along one
    axis (extracted by resizing the identity — resize is linear in its
    input, so the matrix is exact). ensure_compile_time_eval keeps the
    extraction concrete even when the caller is being traced (the pyramid
    inlines under the pipeline/bench whole-frame jit)."""
    with jax.ensure_compile_time_eval():
        eye = jnp.eye(n, dtype=jnp.float32)
        w = jax.image.resize(eye, (m, n), method="trilinear")
        return np.asarray(jax.device_get(w))


def _downsample2(vol: jnp.ndarray) -> jnp.ndarray:
    """2x average-pool a volume f32[Z,Y,X] (dims must be even).

    Evaluated as three per-axis pooling matmuls: the earlier
    reshape(Z/2,2,...).mean lowering cost ~40 ms per 256^3 volume on TPU
    (lane/sublane splits); the matmul form rides the MXU at memory speed.
    """
    Z, Y, X = vol.shape
    pz = jnp.asarray(_pool2_matrix(Z))
    py = jnp.asarray(_pool2_matrix(Y))
    px = jnp.asarray(_pool2_matrix(X))
    out = jnp.einsum("ij,jyx->iyx", pz, vol, preferred_element_type=jnp.float32)
    out = jnp.einsum("ij,zjx->zix", py, out, preferred_element_type=jnp.float32)
    return jnp.einsum(
        "ij,zyj->zyi", px, out, preferred_element_type=jnp.float32
    )


def _resample_disp(disp: jnp.ndarray, dims_zyx, scale: float) -> jnp.ndarray:
    """Trilinearly resample a displacement field f32[3,Z,Y,X] to new dims,
    scaling the displacement VALUES by `scale` (voxel-unit change).

    Same weights as jax.image.resize 'trilinear' (the per-axis matrices
    are extracted from it), evaluated as three MXU contractions — resize's
    own gather-based lowering cost ~68 ms for a 3x256^3 field on TPU.
    """
    _, Z, Y, X = disp.shape
    Zo, Yo, Xo = dims_zyx
    wz = jnp.asarray(_linear_resize_matrix(Z, Zo))
    wy = jnp.asarray(_linear_resize_matrix(Y, Yo))
    wx = jnp.asarray(_linear_resize_matrix(X, Xo))
    out = jnp.einsum(
        "ij,cjyx->ciyx", wz, disp, preferred_element_type=jnp.float32
    )
    out = jnp.einsum(
        "ij,czjx->czix", wy, out, preferred_element_type=jnp.float32
    )
    out = jnp.einsum(
        "ij,czyj->czyi", wx, out, preferred_element_type=jnp.float32
    )
    return out * jnp.float32(scale)


def estimate_inverse_multigrid(
    psi: jnp.ndarray,
    iters: int = 3,
    K: int = 2,
    init: Optional[jnp.ndarray] = None,
    fine_iters: int = 1,
    interpret: bool = False,
    return_coarse: bool = False,
) -> jnp.ndarray:
    """Coarse-to-fine warm inverse: the fixed point q <- id - disp(q) run
    at HALF resolution (displacement halved, window ceil(K/2) — 4-8x
    cheaper per step), the coarse inverse's displacement upsampled (MXU
    resample, :func:`_resample_disp`), then ``fine_iters`` full-resolution
    anchoring steps.

    The inverse of a Sobolev-smoothed field is itself smooth, so its
    low-frequency bulk is fully captured at half resolution; the fine
    steps only correct sub-voxel interpolation error. At 256^3 the 3-step
    full-res inverse costs ~24.5 ms while coarse-3 + fine-1 costs ~14 ms
    (docs/BENCHLOG.md round-3). Accuracy vs the cold 48-step exact inverse
    is measured directly by tools/check_inverse_multigrid.py (max field
    diff + composition residual, with both same-frame and previous-frame-
    style warm starts); tools/fidelity.py --production additionally bounds
    the multigrid path end-to-end via its composition-residual and
    reconstruction-RMSE budgets (it runs this inverse itself).

    Matches the reference's inverse SEMANTICS (vector_fields.cu:111-138
    fixed point) at the same stationary point; the iteration path differs
    (the reference runs 48 cold full-resolution steps each frame).

    ``init`` may be FULL resolution (downsampled here) or already HALF
    resolution (the coarse-carry production loop feeds the previous
    frame's coarse inverse back verbatim — no per-frame down/up resample
    round trip). ``return_coarse`` returns the half-resolution coarse
    inverse q_c itself (half-res identity convention) instead of the
    upsampled full-res field; only meaningful with ``fine_iters=0``
    consumers that treat psi_inv as a warm start.
    """
    from sobfu_tpu.ops.pallas_kernels import (
        estimate_inverse_window_pallas_multi,
    )

    dims = psi.shape[1:]
    if iters == 0 and fine_iters == 0 and init is not None:
        # 0 iterations = warm-start passthrough (profiling / ablation)
        return init
    assert all(d % 2 == 0 for d in dims), "multigrid inverse needs even dims"
    ident = fields.identity_field(dims)
    dims_c = tuple(d // 2 for d in dims)
    ident_c = fields.identity_field(dims_c)
    K_c = max(1, -(-K // 2))
    disp_c = _resample_disp(psi - ident, dims_c, 0.5)
    init_c = None
    if init is not None:
        if init.shape[1:] == dims_c:
            init_c = init  # coarse carry: already half-res
        else:
            init_c = ident_c + _resample_disp(init - ident, dims_c, 0.5)
    q_c = estimate_inverse_window_pallas_multi(
        ident_c + disp_c, iters=iters, K=K_c, init=init_c,
        interpret=interpret,
    )
    if return_coarse:
        assert fine_iters == 0, "coarse carry is a warm-start-only product"
        return q_c
    q0 = ident + _resample_disp(q_c - ident_c, dims, 2.0)
    if fine_iters == 0:
        # anchorless variant (production warm-start-only consumer): skip
        # the pass-through launch AND its full-res disp prestack entirely
        return q0
    return estimate_inverse_window_pallas_multi(
        psi, iters=fine_iters, K=K, init=q0, interpret=interpret
    )


def estimate_psi_pyramid(
    psi: jnp.ndarray,
    tsdf_global: jnp.ndarray,
    weight_global: jnp.ndarray,
    tsdf_n: jnp.ndarray,
    weight_n: jnp.ndarray,
    taps: jnp.ndarray,
    alpha: jnp.ndarray,
    w_reg: jnp.ndarray,
    max_iter: jnp.ndarray,
    max_update_norm_thresh: jnp.ndarray,
    psi_inv0: Optional[jnp.ndarray] = None,
    *,
    levels: int = 2,
    coarse_max_iter: Optional[int] = None,
    coarse_thresh_scale: float = 0.5,
    record_energy: bool = False,
    energy_cap: int = 0,
    inverse_iters: int = 48,
    warp_window: Optional[int] = None,
    momentum: Optional[float] = None,
    conv_mxu: bool = False,
    fused_db: bool = False,
    taps_static: Optional[Tuple[float, ...]] = None,
    db_interpret: bool = False,
    x_pad_to: int = 0,
    fine_window: Optional[int] = None,
    stall_window: int = 0,
    stall_rel: float = 1e-3,
    skip_inv_warps: bool = False,
    skip_weight_warp: bool = False,
    inv_multigrid: bool = False,
    inv_coarse: bool = False,
    fold_xmats: bool = False,
) -> SolveResult:
    """Coarse-to-fine wrapper around :func:`estimate_psi` (host-level
    orchestration; each level's solve is the usual jitted program).

    Level L operates on 2^L-downsampled volumes; the incoming psi's
    displacement is downsampled for the coarsest init, and each level's
    result is upsampled (displacement doubled) to warm-start the next.
    Only the finest level runs the inverse-field/tail computations.

    coarse_thresh_scale: convergence-threshold schedule — level L stops at
    ``thresh * scale^L``. The threshold is in VOXEL units, so the same
    number at a coarse level is a 2x LOOSER metric criterion per level;
    the default 0.5 keeps the metric accuracy constant across levels,
    pushing iterations toward the cheap coarse grids (a coarse iteration
    costs 8x less per level).

    fine_window: run the FINE level as a compositive increment solve
    (:func:`estimate_psi_compositive`) with this warp window — typically 1.
    The coarse levels absorb the bulk motion, so the fine-level increment
    is sub-voxel and a K=1 window is exact for it; the fused kernel's
    in-loop warp then shrinks from (2K+1)^3 = 125 taps to 27, cutting its
    VPU-bound body nearly 2x. Tails and the T0 warp stay bounded by
    ``warp_window`` (the full-motion window). The regulariser at the fine
    level acts on the increment, not the total field — certify configs
    with the plain-GD energy oracle (bench fps_at_convergence e_ratio).
    None (default) = additive fine level, exact :func:`estimate_psi`
    semantics.
    """
    assert levels >= 1
    assert not inv_coarse or inv_multigrid, (
        "inv_coarse rides the multigrid inverse"
    )
    dims = tsdf_n.shape
    ident_f = fields.identity_field(dims)

    # build volume pyramids (coarse levels are warm-start quality only).
    # Only the TSDFs are downsampled: the coarse solves run with
    # skip_tails=True, and the GD loop itself never reads the weight
    # volumes, so coarse weights would be dead work (at 256^3 they were
    # half the pyramid-construction cost).
    pyr = [(tsdf_global, tsdf_n)]
    for _ in range(levels - 1):
        tg_c, tn_c = pyr[-1]
        pyr.append((_downsample2(tg_c), _downsample2(tn_c)))

    disp = psi - ident_f
    if levels > 1:
        disp = _resample_disp(disp, pyr[-1][0].shape, 0.5 ** (levels - 1))

    coarse_its = jnp.int32(
        coarse_max_iter if coarse_max_iter is not None else max_iter
    )
    total_coarse = jnp.int32(0)  # traced-safe (this fn may inline under jit)
    for lev in range(levels - 1, 0, -1):
        tg_c, tn_c = pyr[lev]
        dims_c = tn_c.shape
        psi_c = fields.identity_field(dims_c) + disp
        thresh_c = max_update_norm_thresh * jnp.float32(
            coarse_thresh_scale ** lev
        )
        Xc = dims_c[-1]
        xpt_c = 0 if Xc % 128 == 0 else (
            ((Xc + 127) // 128) * 128 if Xc >= 64 else -1
        )
        fused_c = fused_db and xpt_c >= 0 and not db_interpret
        # metric-scaled window: the same PHYSICAL motion spans 2^lev fewer
        # voxels at level lev, so the window (a voxel-unit bound) shrinks
        # with it — K=1 coarse warp bodies are ~1.4x cheaper and remain
        # exact for any displacement the fine K bounds (incoming coarse
        # disp = fine disp * 0.5^lev <= K * 0.5^lev <= K_c)
        K_c = (
            max(1, -(-warp_window // (2 ** lev)))
            if warp_window is not None
            else None
        )
        # VMEM-resident multi-iteration chunks on fold-compatible coarse
        # levels (X=64 on real TPUs): coarse stops are threshold-schedule
        # warm-start quality, so the <= inner-1 iteration overshoot of
        # chunked stopping is immaterial there — ~20% cheaper coarse
        # iterations on the 256^3 production frame. Interpret-mode (CPU
        # test) runs keep single-step semantics.
        inner_c = 16 if (fused_c and not db_interpret) else 0
        res_c = estimate_psi(
            psi_c, tg_c, tg_c, tn_c, tn_c, taps, alpha, w_reg,
            coarse_its, thresh_c,
            skip_tails=True,  # tails discarded at coarse levels
            warp_window=K_c,
            momentum=momentum,
            conv_mxu=conv_mxu,
            fused_db=fused_c,
            taps_static=taps_static if fused_c else None,
            db_interpret=db_interpret,
            x_pad_to=max(0, xpt_c) if fused_c else 0,
            inner_steps=inner_c,
            fold_xmats=fold_xmats,
            # NO stall detector at coarse levels: their data energy
            # plateaus early (coarse grids can't resolve the residual),
            # so the stall fires prematurely and shifts iterations to
            # the 8x-costlier fine level (measured 2x whole-solve cost
            # at 128^3). The coarse threshold schedule is the stop here.
            stall_window=0,
        )
        total_coarse = total_coarse + res_c.iters
        up_dims = pyr[lev - 1][0].shape
        disp = _resample_disp(res_c.psi - fields.identity_field(dims_c),
                              up_dims, 2.0)

    if fine_window is not None:
        res = estimate_psi_compositive(
            ident_f + disp, tsdf_global, weight_global, tsdf_n, weight_n,
            taps, alpha, w_reg, max_iter, max_update_norm_thresh, psi_inv0,
            record_energy=record_energy,
            energy_cap=energy_cap,
            inverse_iters=inverse_iters,
            warp_window=fine_window,
            total_window=warp_window or 2,
            momentum=momentum,
            conv_mxu=conv_mxu,
            fused_db=fused_db,
            taps_static=taps_static if fused_db else None,
            db_interpret=db_interpret,
            x_pad_to=x_pad_to,
            stall_window=stall_window,
            stall_rel=stall_rel,
            skip_inv_warps=skip_inv_warps,
            inv_multigrid=inv_multigrid,
            inv_coarse=inv_coarse,
            fold_xmats=fold_xmats,
        )
    else:
        res = estimate_psi(
            ident_f + disp, tsdf_global, weight_global, tsdf_n, weight_n,
            taps, alpha, w_reg, max_iter, max_update_norm_thresh, psi_inv0,
            record_energy=record_energy,
            energy_cap=energy_cap,
            inverse_iters=inverse_iters,
            warp_window=warp_window,
            momentum=momentum,
            conv_mxu=conv_mxu,
            fused_db=fused_db,
            taps_static=taps_static if fused_db else None,
            db_interpret=db_interpret,
            x_pad_to=x_pad_to,
            stall_window=stall_window,
            stall_rel=stall_rel,
            skip_inv_warps=skip_inv_warps,
            skip_weight_warp=skip_weight_warp,
            inv_multigrid=inv_multigrid,
            inv_coarse=inv_coarse,
            fold_xmats=fold_xmats,
        )
    return res._replace(iters=res.iters + total_coarse)


def production_pyramid_kwargs(dim: int, *, warm: bool = True,
                              no_log: bool = True) -> dict:
    """The shipped production configuration for :func:`estimate_psi_pyramid`
    on a cubic grid of extent ``dim`` — the single source of truth shared
    by bench.py (fps_at_convergence), tools/fidelity.py --production and
    the profiling tools, so the quality gates always certify exactly the
    configuration the bench records.

    warm: per-frame steady state (previous-frame inverse warm start, 3
    fixed-point steps); False = cold single-solve (48 steps, what the
    fidelity single-frame scenarios run — no previous frame exists).
    no_log: the CLI no-log loop — psi_inv is a warm-start-only product
    (skip_inv_warps; half-res inverse carry when warm).

    Caller adds: taps_static (from the filter), record_energy/energy_cap,
    db_interpret for CPU tests.

    Round-4 fine-level choice (tools/profile_fine_variants.py, 256^3):
    with the coarse pyramid absorbing the bulk motion the fine level
    converges in ~1 iteration, where the compositive machinery's fixed
    T0-warp + compose_weight overhead (~7 ms) exceeds what its K=1
    in-loop warp saves — the ADDITIVE fine level (exact reference update
    rule, warp window 2) measured 44.5 -> 38.2 ms/frame steady at the
    identical iteration count and final energy.
    """
    multigrid = dim % 2 == 0 and dim >= 64
    return dict(
        levels=3 if dim >= 256 else 2,
        warp_window=2,
        momentum=0.95,
        fine_window=None,
        stall_window=16,
        stall_rel=1e-2,
        fused_db=True,
        conv_mxu=True,
        inverse_iters=3 if warm else 48,
        skip_inv_warps=no_log,
        inv_multigrid=multigrid,
        inv_coarse=bool(warm and no_log and multigrid),
        fold_xmats=True,
    )


# ---------------------------------------------------------------------------
# host-facing Solver (parity with sobfu::cuda::Solver, solver.hpp:56-94)
# ---------------------------------------------------------------------------


class Solver:
    def __init__(self, params: Params):
        self.params = params
        self.taps = jnp.asarray(sobolev_filter_1d(params.s, params.lambda_))
        self.verbosity = params.verbosity
        self.warp_window = getattr(params, "warp_window", None)
        # STRICTLY opt-in: the Mosaic compile service in some TPU pools is
        # unreliable (see ops/pallas_kernels.py docstring); the XLA window
        # path is the default production path.
        self.use_pallas = bool(getattr(params, "use_pallas", None) or False)
        self.taps_static = tuple(float(t) for t in np.asarray(self.taps))
        self.mode = getattr(params, "solver_mode", "additive")
        self.momentum = getattr(params, "momentum", None)
        inc_inv = getattr(params, "incremental_inverse", None)
        self.incremental_inverse = True if inc_inv is None else bool(inc_inv)
        self.warp_pallas = bool(getattr(params, "warp_pallas", None) or False)
        self.pyramid_levels = int(getattr(params, "pyramid_levels", 1) or 1)
        if self.pyramid_levels > 1:
            f = 2 ** (self.pyramid_levels - 1)
            if any(d % f for d in params.volume_dims):
                self.pyramid_levels = 1  # dims don't halve evenly
        conv_mxu = getattr(params, "conv_mxu", None)
        if conv_mxu is None:
            # auto: MXU contraction wins on TPU; on CPU the banded matmul is
            # an O(n) -> O(n^2) pessimisation, keep the slice-sum
            conv_mxu = jax.devices()[0].platform != "cpu"
        self.conv_mxu = bool(conv_mxu)
        z_chunks = getattr(params, "z_chunks", None)
        X, Y, Z = params.volume_dims  # volume_dims is (X, Y, Z)
        # lane packing: Mosaic rejects the fused kernel below 128 lanes, so
        # sub-128 volumes are edge-padded in x up to 128 (identical results
        # on real lanes; dead lanes are masked). Worth the 2x lane waste
        # down to X=64 — the reference's own 64^3 headline workload; below
        # that the XLA window path is faster than a 4x-padded kernel.
        if X % 128 == 0:
            x_pad_to, pack_ok = 0, True
        elif X >= 64:
            x_pad_to, pack_ok = ((X + 127) // 128) * 128, True
        else:
            x_pad_to, pack_ok = 0, False
        fused = getattr(params, "fused_pallas", None)
        if fused is None:
            # auto: the double-buffered fused kernel is the TPU production
            # hot loop — one VMEM-resident pass per GD iteration. Needs a
            # warp window, taps <= 7, and evenly-tiling dims. Explicitly
            # configured Z_CHUNKS keeps the chunked path (explicit beats
            # auto).
            from sobfu_tpu.ops.pallas_kernels import _db_tiles

            BZ, TY = _db_tiles(Z, Y, x_pad_to or X)
            fused = (
                jax.devices()[0].platform != "cpu"
                and self.warp_window is not None
                and 1 <= int(self.warp_window) <= 4
                and self.taps.shape[0] <= 7
                and Z % BZ == 0
                and Y % TY == 0
                and TY % 8 == 0
                and pack_ok
                and z_chunks is None
                and not self.use_pallas
                and not self.warp_pallas
            )
        self.fused_pallas = bool(fused)
        self.x_pad_to = x_pad_to if self.fused_pallas else 0
        if self.fused_pallas and self.warp_window is None:
            # explicit FUSED_PALLAS=1 without WARP_WINDOW: the fused kernel
            # is window-based by construction; use the production default.
            self.warp_window = 2
        if z_chunks is None:
            # auto: chunked state restores XLA fusion on big grids (see
            # estimate_psi_chunked); needs the windowed warp. Superseded by
            # the fused kernel when that is active.
            z_chunks = (
                8
                if (
                    self.warp_window
                    and Z >= 128
                    and Z % 8 == 0
                    and not self.fused_pallas
                )
                else 0
            )
        self.z_chunks = int(z_chunks)
        # inverse-field warm start (after fused_pallas may have defaulted
        # warp_window): previous frame's inverse + fewer fixed-point steps
        self.fine_window = getattr(params, "fine_window", None)
        self.stall_window = int(getattr(params, "stall_window", 0) or 0)
        self.stall_rel = float(getattr(params, "stall_rel", 1e-3))
        # coarse-to-fine warm inverse: auto-on for the fused PRODUCTION
        # configs (a pyramid or a compositive fine level — the exact
        # configurations the fidelity --production gates certify); a plain
        # single-level additive solve keeps the exact full-res fixed point
        # unless opted in. params key `inv_multigrid` overrides.
        img = getattr(params, "inv_multigrid", None)
        self.inv_multigrid = (
            bool(
                self.fused_pallas
                and (self.fine_window is not None or self.pyramid_levels > 1)
            )
            if img is None
            else bool(img)
        )
        # VMEM-resident multi-iteration chunks on the Y-folded fused path
        # (X=64 grids): opt-in via INNER_STEPS; silently disabled when the
        # preconditions don't hold (non-fold grid, stall window not a
        # multiple, or a non-divisible iteration cap, which would
        # overshoot the reference's exact MAX_ITER semantics).
        inner = int(getattr(params, "inner_steps", 0) or 0)
        if inner > 1:
            fold_ok = (
                X * 2 == 128 and Y % 2 == 0 and Z % 8 == 0
                and self.fused_pallas
            )
            if (
                not fold_ok
                or (self.stall_window and self.stall_window % inner)
                or (params.max_iter % inner)
            ):
                inner = 0
        self.inner_steps = inner
        warm = getattr(params, "inverse_warm", None)
        self.inverse_warm = (
            self.warp_window is not None if warm is None else bool(warm)
        )
        # half-resolution inverse carry (opt-in, params key `inv_coarse`):
        # on the no-log production loop psi_inv is a warm-start-only
        # product, so it is produced AND consumed at half resolution —
        # the per-frame down/up resample round trip of the multigrid
        # inverse vanishes. Full-res consumers (log/viz meshes,
        # get_phi_global_psi_inv_mesh) materialise on demand in the
        # pipeline. Requires the multigrid production path.
        invc = getattr(params, "inv_coarse", None)
        self.inv_coarse = bool(
            invc and self.inv_multigrid and self.fused_pallas
        )
        # MXU lane-axis operators on the Y-folded kernel path (HIGHEST
        # precision — 3e-5 vox reassociation drift over 128 iters, ~7%
        # faster fold iterations): auto-on with the fused kernel; only
        # fold-dispatching grids (X=64, incl. pyramid coarse levels) are
        # affected. FOLD_XMATS=0 keeps the VPU tap loop.
        fxm = getattr(params, "fold_xmats", None)
        self.fold_xmats = (
            bool(self.fused_pallas) if fxm is None else bool(fxm)
        )
        inv_iters = getattr(params, "inverse_iters", None)
        if inv_iters is None:
            # warm default 3: the Sobolev-smoothed field contracts the
            # fixed point ~10x/step — warm-started 3 matches cold 48 to
            # 7e-4 voxel and warm-4 to 1e-4 (max diff AND composition
            # residual, measured at 256^3; BENCHLOG 2026-08-18). At 256^3
            # each step is ~9.4 ms — a third of the remaining tails —
            # and the fidelity --production gates (incl. 10-frame drift)
            # hold at 3.
            inv_iters = 3 if self.inverse_warm else 48
        self.inverse_iters = int(inv_iters)

    def estimate_psi(self, phi_global, phi_global_psi_inv, phi_n, phi_n_psi,
                     psi, psi_inv) -> SolveResult:
        """Run the solve; updates the passed volume/field wrappers in place.

        Arguments mirror the reference call
        (sob_fusion.cpp:141 -> solver.cpp:69-101).
        """
        p = self.params
        record = self.verbosity > 0
        common = (
            psi.data,
            phi_global.tsdf,
            phi_global.weight,
            phi_n.tsdf,
            phi_n.weight,
            self.taps,
            jnp.float32(p.alpha),
            jnp.float32(p.w_reg),
            jnp.int32(p.max_iter),
            jnp.float32(p.max_update_norm),
        )
        if self.mode == "compositive":
            res = estimate_psi_compositive(
                *common,
                psi_inv.data if self.incremental_inverse else None,
                warp_window=self.warp_window or 2,
                n_chunks=0 if self.fused_pallas else self.z_chunks,
                record_energy=record,
                energy_cap=p.max_iter if record else 0,
                conv_mxu=self.conv_mxu,
                momentum=self.momentum,
                fused_db=self.fused_pallas,
                taps_static=self.taps_static if self.fused_pallas else None,
                x_pad_to=self.x_pad_to,
                # the stall detector lives in the monolithic/fused increment
                # loop; the z-chunked delegate does not carry it
                stall_window=(
                    self.stall_window
                    if (self.fused_pallas or not self.z_chunks)
                    else 0
                ),
                stall_rel=self.stall_rel,
                inner_steps=self.inner_steps,
                # the increment pyramid is monolithic/fused only
                pyramid_levels=(
                    self.pyramid_levels
                    if (self.fused_pallas or not self.z_chunks)
                    else 1
                ),
            )
        elif self.pyramid_levels > 1:
            res = estimate_psi_pyramid(
                *common,
                psi_inv.data if self.inverse_warm else None,
                levels=self.pyramid_levels,
                record_energy=record,
                energy_cap=p.max_iter if record else 0,
                inverse_iters=self.inverse_iters,
                warp_window=self.warp_window,
                momentum=self.momentum,
                conv_mxu=self.conv_mxu,
                fused_db=self.fused_pallas,
                taps_static=self.taps_static if self.fused_pallas else None,
                x_pad_to=self.x_pad_to,
                fine_window=self.fine_window,
                stall_window=self.stall_window,
                stall_rel=self.stall_rel,
                inv_multigrid=self.inv_multigrid,
            )
        elif self.z_chunks and not self.use_pallas and not self.fused_pallas:
            # chunked supports momentum + energy recording; use_pallas /
            # fused_pallas win over (auto-)chunking: those kernels are
            # monolithic.
            res = estimate_psi_chunked(
                *common,
                psi_inv.data if self.inverse_warm else None,
                n_chunks=self.z_chunks,
                warp_window=self.warp_window or 2,
                inverse_iters=self.inverse_iters,
                record_energy=record,
                energy_cap=p.max_iter if record else 0,
                momentum=self.momentum,
                conv_mxu=self.conv_mxu,
            )
        else:
            res = estimate_psi(
                *common,
                psi_inv.data if self.inverse_warm else None,
                record_energy=record,
                energy_cap=p.max_iter if record else 0,
                inverse_iters=self.inverse_iters,
                warp_window=self.warp_window,
                use_pallas=self.use_pallas,
                taps_static=(
                    self.taps_static
                    if (self.use_pallas or self.fused_pallas)
                    else None
                ),
                momentum=self.momentum,
                conv_mxu=self.conv_mxu,
                warp_pallas=self.warp_pallas,
                fused_db=self.fused_pallas,
                x_pad_to=self.x_pad_to,
                stall_window=self.stall_window,
                stall_rel=self.stall_rel,
                inner_steps=self.inner_steps,
            )
        psi.data = res.psi
        psi_inv.data = res.psi_inv
        phi_n_psi.tsdf = res.tsdf_n_psi
        phi_n_psi.weight = res.weight_n_psi
        phi_global_psi_inv.tsdf = res.tsdf_global_psi_inv
        phi_global_psi_inv.weight = res.weight_global_psi_inv

        if self.verbosity > 0:
            iters = int(res.iters)
            hist = np.asarray(res.energy)
            stride = 1 if self.verbosity >= 2 else 50
            # valid rows carry a positive max-update norm (rows stay zero
            # past the recorded range — e.g. res.iters includes coarse
            # pyramid iterations while only fine-level rows are recorded)
            nz = np.flatnonzero(hist[:, 2] > 0)
            n_valid = int(nz[-1]) + 1 if nz.size else 0
            for i in range(0, min(iters, n_valid), stride):
                e_data, e_reg, mnorm = hist[i]
                print(
                    f"iter. no. {i + 1}: data energy + w_reg * reg energy = "
                    f"{e_data:.6f} + {p.w_reg} * {e_reg:.6f} = "
                    f"{e_data + p.w_reg * e_reg:.6f}; max. update norm {mnorm:.3e}"
                )
            if float(res.max_norm) <= p.max_update_norm:
                print(f"SOLVER CONVERGED AFTER {iters} ITERATIONS")
            elif self.stall_window and iters < p.max_iter * max(
                1, self.pyramid_levels
            ):
                print(
                    f"SOLVER STOPPED ON DATA-ENERGY STALL AFTER {iters} "
                    "ITERATIONS (update norm still above threshold)"
                )
            else:
                print("SOLVER REACHED MAX. NO. OF ITERATIONS WITHOUT CONVERGING")
        return res


# ---------------------------------------------------------------------------
# compositive fast mode (TPU extension — no reference counterpart)
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=(
        "inverse_iters", "warp_window", "n_chunks", "record_energy",
        "energy_cap", "conv_mxu", "inv_window_iters", "inv_refine_iters",
        "momentum", "fused_db", "taps_static", "db_interpret", "x_pad_to",
        "total_window", "stall_window", "stall_rel", "skip_inv_warps",
        "inv_multigrid", "inner_steps", "inv_coarse", "fold_xmats",
        "skip_inverse", "pyramid_levels", "coarse_max_iter",
    ),
)
def estimate_psi_compositive(
    psi0: jnp.ndarray,
    tsdf_global: jnp.ndarray,
    weight_global: jnp.ndarray,
    tsdf_n: jnp.ndarray,
    weight_n: jnp.ndarray,
    taps: jnp.ndarray,
    alpha: jnp.ndarray,
    w_reg: jnp.ndarray,
    max_iter: jnp.ndarray,
    max_update_norm_thresh: jnp.ndarray,
    psi_inv0: Optional[jnp.ndarray] = None,
    *,
    inverse_iters: int = 48,
    warp_window: int = 2,
    n_chunks: int = 0,
    record_energy: bool = False,
    energy_cap: int = 0,
    conv_mxu: bool = False,
    inv_window_iters: int = 16,
    inv_refine_iters: int = 2,
    momentum: Optional[float] = None,
    fused_db: bool = False,
    taps_static: Optional[Tuple[float, ...]] = None,
    db_interpret: bool = False,
    x_pad_to: int = 0,
    total_window: int = 0,
    stall_window: int = 0,
    stall_rel: float = 1e-3,
    skip_inv_warps: bool = False,
    inv_multigrid: bool = False,
    inner_steps: int = 0,
    inv_coarse: bool = False,
    fold_xmats: bool = False,
    skip_inverse: bool = False,
    pyramid_levels: int = 1,
    coarse_max_iter: Optional[int] = None,
) -> SolveResult:
    """Compositive-update solve: UNBOUNDED total deformation at window speed.

    The additive scheme (:func:`estimate_psi`, faithful to the reference)
    must sample phi_n at arbitrary absolute coordinates psi(v) every
    iteration; when the accumulated deformation exceeds the warp window,
    only the slow exact gather is correct. This mode reparametrises

        psi_k = psi0 o (id + delta_k),   delta_0 = 0

    so each iteration samples the PRE-WARPED live volume T0 = phi_n o psi0
    at (v + delta(v)) — and ``delta`` is only the CURRENT FRAME's motion
    increment, which stays within a small window regardless of how much
    deformation psi0 has accumulated over the sequence. This is the
    compositive/demons-style counterpart of the reference's additive
    gradient flow: the data term is identical; the Sobolev-smoothed update
    is applied to the increment, and the regulariser acts on the increment
    field (for psi0 = id the two schemes coincide exactly).

    Cost per frame beyond the loop: ONE exact warp for T0 and ONE exact
    field composition at the end — both amortised over all iterations.

    psi_inv0: the inverse of psi0 from the previous frame. When given, the
    returned inverse is maintained INCREMENTALLY (vs the reference's 48
    exact-gather fixed-point iterations from identity each frame,
    vector_fields.cu:111-138): only the bounded per-frame increment
    g = id + delta is inverted — with the gather-free window sampler, valid
    because |delta| <= warp_window — and composed as
    psi_new^{-1} = g^{-1} o psi0^{-1} (one exact field sample), then
    anchored by ``inv_refine_iters`` exact fixed-point steps against the
    composed field to stop interpolation drift accumulating across frames.
    3 exact gathers instead of 48.

    fused_db: run the increment loop as the SAME fused double-buffered
    Pallas kernel as the additive production mode — valid because the
    kernel operates on absolute coordinates: feeding it psi = id + delta
    and live = T0 makes its Laplacian exactly L(delta) (the identity's
    masked second differences vanish) and its windowed warp exactly the
    increment warp. Supports momentum and lane packing (x_pad_to); the
    increment is window-bounded by construction, so the fused kernel's K
    bound always holds in this mode.

    total_window: when the TOTAL deformation (|psi0 - id| and the composed
    |psi_new - id|) is known to stay within this many voxels — e.g. as the
    FINE level of a coarse-to-fine pyramid, where psi0 is the upsampled
    coarse field of a window-bounded solve — every exact gather in this
    function (T0 warp, final composition, inverse, tail warps) is replaced
    by bounded-window samplers: T0/tails at ``total_window``, the
    composition at ``warp_window`` (the increment bound). With
    ``warp_window=1`` this is the fastest production configuration: the
    fused kernel's in-loop warp shrinks from 5^3 to 3^3 taps while the
    coarse levels supply the bulk motion. 0 (default) keeps the exact
    gathers (arbitrary accumulated deformation).

    Returns a :class:`SolveResult` for the composed total field.
    """
    assert not (total_window and n_chunks), (
        "total_window applies to the monolithic/fused increment loop only"
    )
    if inv_coarse:
        # coarse carry: psi_inv is produced AND consumed at half
        # resolution (warm-start-only product of the no-log loop) — valid
        # only on the multigrid-inverse production path
        assert inv_multigrid and skip_inv_warps and fused_db
        assert not db_interpret
    dims_zyx = tsdf_n.shape
    ident = fields.identity_field(dims_zyx)

    if total_window and fused_db and not db_interpret:
        # Mosaic toolchain is up (fused_db) — run the bounded tails through
        # the pipelined Pallas warp kernel, as the additive path does
        from sobfu_tpu.ops.pallas_kernels import (
            estimate_inverse_window_pallas_multi,
            window_warp_field3_pallas,
            window_warp_pallas,
        )

        tw_scalar = functools.partial(window_warp_pallas, K=total_window)
        tw_floor = functools.partial(
            window_warp_pallas, K=total_window, floor=True
        )
        # multi-STEP inverse kernel: all fixed-point steps in one launch
        tw_inverse = functools.partial(
            estimate_inverse_window_pallas_multi, K=total_window
        )
        # C=3 shared-weight field sampler for the composition (the window
        # bound of the compose is the INCREMENT's, warp_window)
        tw_field = functools.partial(
            window_warp_field3_pallas, K=warp_window
        )
    elif total_window:
        tw_scalar = functools.partial(
            fields.sample_trilinear_window, max_disp=total_window
        )
        tw_floor = functools.partial(
            fields.sample_nearest_floor_window, max_disp=total_window
        )
        tw_inverse = functools.partial(
            fields.estimate_inverse_window, max_disp=total_window
        )
        tw_field = functools.partial(
            fields.sample_trilinear_window, max_disp=warp_window
        )

    def compose_inverse(psi_new, delta_final):
        if total_window:
            if (
                inv_multigrid
                and fused_db
                and not db_interpret
                and all(d % 2 == 0 for d in dims_zyx)
            ):
                # coarse-to-fine warm inverse (see estimate_inverse_
                # multigrid): ~24.5 -> ~14 ms at 256^3, certified by the
                # fidelity --production composition-residual gates.
                # skip_inv_warps (the no-log production loop) also drops
                # the full-res ANCHOR step (~7 ms at 256^3): psi_inv is
                # then consumed ONLY as the next frame's warm start, and
                # the anchorless inverse measures 3.0e-2 vox off cold-48
                # (tools/check_inverse_multigrid.py, prev-frame warm
                # start) — well inside warm-start tolerance; cross-frame
                # drift is gated by fidelity --production. Log/viz runs
                # (skip_inv_warps=False) keep the anchored 1.5e-3 inverse
                # because phi_global o psi_inv is materialised from it.
                # inv_coarse: the previous frame's HALF-RES inverse comes
                # in as psi_inv0 verbatim and the half-res q_c goes out —
                # the per-frame init-down/result-up resample round trip
                # (2 MXU resamples of a 3-channel 256^3 field) vanishes,
                # and the warm start skips one interpolation generation.
                return estimate_inverse_multigrid(
                    psi_new, iters=inverse_iters, K=total_window,
                    init=psi_inv0,
                    fine_iters=0 if skip_inv_warps else 1,
                    return_coarse=inv_coarse,
                )
            return tw_inverse(psi_new, iters=inverse_iters, init=psi_inv0)
        if psi_inv0 is None:
            return fields.estimate_inverse(psi_new, inverse_iters)
        if fused_db and not db_interpret:
            # the increment g = id + delta is window-bounded by
            # construction — run its fixed point through the multi-step
            # Pallas inverse kernel (107 -> 39 ms at 128^3, BENCHLOG r5;
            # same fixed point as the XLA window iteration to 1e-5)
            from sobfu_tpu.ops.pallas_kernels import (
                estimate_inverse_window_pallas_multi as _inv_pl,
            )

            q = _inv_pl(
                ident + delta_final, iters=inv_window_iters, K=warp_window
            )
        else:
            q = fields.estimate_inverse_window(
                ident + delta_final, iters=inv_window_iters,
                max_disp=warp_window,
            )
        dq = ident - q
        # psi_new^{-1}(v) = q(psi0^{-1}(v)) = psi0^{-1}(v) - dq(psi0^{-1}(v))
        inv = psi_inv0 - fields.sample_field_trilinear(dq, psi_inv0)
        disp_new = psi_new - ident
        for _ in range(inv_refine_iters):
            inv = ident - fields.sample_field_trilinear(disp_new, inv)
        return inv

    # one warp per frame: T0 = phi_n o psi0 — windowed when the total
    # deformation is bounded; otherwise the HYBRID window+exact-fallback
    # sampler on the TPU path (only the minority of voxels whose
    # accumulated displacement left the window pay the slow exact gather:
    # 170 -> ~40 ms at 128^3, BENCHLOG round 5) and the plain exact
    # gather on the CPU/golden path.
    if total_window:
        t0 = tw_scalar(tsdf_n, psi0)
    elif fused_db and not db_interpret:
        t0 = fields.sample_hybrid_window_exact(
            tsdf_n, psi0, max_disp=warp_window
        )
    else:
        t0 = fields.sample_trilinear(tsdf_n, psi0)

    delta_init = None
    total_coarse = jnp.int32(0)
    if pyramid_levels > 1:
        assert not n_chunks, "increment pyramid is monolithic/fused only"
        # coarse-to-fine warm start ON THE INCREMENT: the increment flow
        # from identity against T0 is an additive solve (L(id + delta) =
        # L(delta)), so the standard coarse levels apply with T0
        # downsampled — NO extra exact gather (T0 already exists at fine
        # resolution). This is what lets the unbounded-drift compositive
        # mode run coarse iterations at 1/8 the cost, like the additive
        # production pyramid.
        pyr = [(tsdf_global, t0)]
        for _ in range(pyramid_levels - 1):
            pyr.append((_downsample2(pyr[-1][0]), _downsample2(pyr[-1][1])))
        disp_c = jnp.zeros((3,) + pyr[-1][0].shape, jnp.float32)
        c_its = jnp.int32(
            coarse_max_iter if coarse_max_iter is not None else max_iter
        )
        for lev in range(pyramid_levels - 1, 0, -1):
            tg_c, t0_c = pyr[lev]
            dims_c = t0_c.shape
            ident_c = fields.identity_field(dims_c)
            # metric-scaled window, as in estimate_psi_pyramid
            K_c = max(1, -(-warp_window // (2 ** lev)))
            Xc = dims_c[-1]
            xpt_c = 0 if Xc % 128 == 0 else (
                ((Xc + 127) // 128) * 128 if Xc >= 64 else -1
            )
            fused_c = fused_db and xpt_c >= 0 and not db_interpret
            inner_c = 16 if (fused_c and not db_interpret) else 0
            res_c = estimate_psi(
                ident_c + disp_c, tg_c, tg_c, t0_c, t0_c, taps, alpha,
                w_reg, c_its,
                max_update_norm_thresh * jnp.float32(0.5 ** lev),
                skip_tails=True,
                warp_window=K_c,
                momentum=momentum,
                conv_mxu=conv_mxu,
                fused_db=fused_c,
                taps_static=taps_static if fused_c else None,
                db_interpret=db_interpret,
                x_pad_to=max(0, xpt_c) if fused_c else 0,
                inner_steps=inner_c,
                fold_xmats=fold_xmats,
                stall_window=0,  # see the pyramid's coarse-stall note
            )
            total_coarse = total_coarse + res_c.iters
            up_dims = pyr[lev - 1][0].shape
            disp_c = _resample_disp(res_c.psi - ident_c, up_dims, 2.0)
        delta_init = disp_c

    if n_chunks:
        # delegate the increment solve to the z-chunked machinery: from the
        # identity against T0, the chunked additive loop IS the compositive
        # increment flow (L(id + delta) = L(delta))
        inner = estimate_psi_chunked(
            ident, tsdf_global, weight_global, t0, weight_n,
            taps, alpha, w_reg, max_iter, max_update_norm_thresh,
            n_chunks=n_chunks, warp_window=warp_window, inverse_iters=1,
            record_energy=record_energy, energy_cap=energy_cap,
            conv_mxu=conv_mxu,
        )
        psi_new = fields.sample_field_trilinear(psi0, inner.psi)
        psi_inv = compose_inverse(psi_new, inner.psi - ident)
        return SolveResult(
            psi=psi_new,
            psi_inv=psi_inv,
            tsdf_n_psi=inner.tsdf_n_psi,
            weight_n_psi=fields.sample_nearest_floor(weight_n, psi_new),
            tsdf_global_psi_inv=fields.sample_trilinear(tsdf_global, psi_inv),
            weight_global_psi_inv=fields.sample_nearest_floor(
                weight_global, psi_inv
            ),
            iters=inner.iters,
            max_norm=inner.max_norm,
            energy=inner.energy,
        )

    if fused_db:
        from sobfu_tpu.ops.pallas_kernels import (
            _db_tiles,
            fold_y,
            fused_gd_iteration_db_padded,
            fused_gd_iteration_fold,
            fused_gd_iteration_pp,
            fused_gd_multi_fold,
            pad_folded,
            pad_for_db,
            pad_for_fold,
            pad_for_pp,
            refresh_padded,
            unfold_y,
            unpad_db,
            unpad_folded,
            unpad_pp,
        )

        assert taps_static is not None, "fused_db requires taps_static"
        xl_db = tsdf_n.shape[2] if x_pad_to > tsdf_n.shape[2] else 0
        Zd, Yd, Xd = tsdf_n.shape
        # Y-FOLDED path for X=64 grids, exactly as in the additive
        # estimate_psi: the increment loop runs the same kernel body (live
        # = T0, state = id + delta), so the fold applies verbatim — no
        # dead padding lanes on the VPU-bound body
        use_fold = Xd * 2 == 128 and Yd % 2 == 0 and Zd % 8 == 0
        use_pp = False
        use_multi = use_fold and inner_steps > 1
        if use_multi:
            # VMEM-resident multi-iteration chunks (fused_gd_multi_fold):
            # the increment loop is the SAME kernel body, so the chunked
            # stepping applies verbatim (see estimate_psi inner_steps)
            assert stall_window == 0 or stall_window % inner_steps == 0
            if record_energy:
                assert energy_cap >= inner_steps
        if use_fold:
            xl_db = 0
            tg_pad_db = pad_for_fold(tsdf_global)
            t0_pad_db = pad_for_fold(t0)
            if use_multi:
                pad_st = lambda a, _x=0: pad_folded(fold_y(a))  # noqa: E731
                unpad_st = lambda a, _x=0: unfold_y(unpad_folded(a))  # noqa: E731
            else:
                pad_st = lambda a, _x=0: fold_y(a)  # noqa: E731
                unpad_st = lambda a, _x=0: unfold_y(a)  # noqa: E731
        else:
            _bz, _ty = _db_tiles(Zd, Yd, x_pad_to or Xd)
            use_pp = Zd // _bz >= 2 and Yd // _ty >= 2
            if use_pp:
                tg_pad_db = pad_for_pp(tsdf_global, x_pad_to)
                t0_pad_db = pad_for_pp(t0, x_pad_to)
            else:
                tg_pad_db = pad_for_db(tsdf_global, x_pad_to)
                t0_pad_db = pad_for_db(t0, x_pad_to)
            pad_st = pad_for_pp if use_pp else pad_for_db
            unpad_st = unpad_pp if use_pp else unpad_db

    step_n = inner_steps if (fused_db and use_fold and use_multi) else 1

    def gd_step(state: SolverState) -> SolverState:
        delta, tnp = state.psi, state.tsdf_n_psi  # 'psi' slot holds delta

        e_kern = None
        verb_rows = None
        if fused_db and use_fold and use_multi:
            # inner_steps increment iterations per launch, VMEM-resident
            outs = fused_gd_multi_fold(
                delta,
                tnp,
                state.vel if momentum is not None else None,
                tg_pad_db,
                t0_pad_db,
                alpha,
                w_reg,
                taps_static,
                K=warp_window,
                n_inner=inner_steps,
                momentum=momentum,
                interpret=db_interpret,
                with_energy=stall_window > 0,
                with_verbose=record_energy,
                use_xmats=fold_xmats,
                xmats_precision=(
                    jax.lax.Precision.HIGHEST if fold_xmats else None
                ),
            )
            delta_new, tnp_new, vel_new, mx_vec, e_vec = outs[:5]
            if record_energy:
                # kernel verbose bundle; the reg rows are ||J(delta)||^2
                # (psi_state = id + delta), exactly the compositive
                # convention documented in the record block below
                verb_rows = jnp.stack(
                    [outs[5], outs[6], jnp.sqrt(mx_vec)], axis=1
                )
            if momentum is None:
                vel_new = state.vel
            mnorm = jnp.sqrt(mx_vec[-1])
            if e_vec is not None:
                e_kern = e_vec[-1]
        elif fused_db and use_fold:
            # state carries the FOLDED (id + delta) and tnp arrays
            psi_f, tnp_f, vel_new, mx_sq, e_kern = fused_gd_iteration_fold(
                delta,
                tnp,
                state.vel if momentum is not None else None,
                tg_pad_db,
                t0_pad_db,
                alpha,
                w_reg,
                taps_static,
                K=warp_window,
                momentum=momentum,
                interpret=db_interpret,
                with_energy=stall_window > 0,
                use_xmats=fold_xmats,
                xmats_precision=(
                    jax.lax.Precision.HIGHEST if fold_xmats else None
                ),
            )
            delta_new, tnp_new = psi_f, tnp_f
            if momentum is None:
                vel_new = state.vel
            mnorm = jnp.sqrt(mx_sq)
        elif fused_db:
            # state carries EDGE-PADDED (id + delta) and tnp; the fused
            # kernel computes the compositive update verbatim (see the
            # fused_db note in the docstring)
            if use_pp:
                psi_p, tnp_p, vel_new, mx_sq, e_kern = fused_gd_iteration_pp(
                    delta,
                    tnp,
                    state.vel if momentum is not None else None,
                    tg_pad_db,
                    t0_pad_db,
                    alpha,
                    w_reg,
                    taps_static,
                    K=warp_window,
                    momentum=momentum,
                    interpret=db_interpret,
                    x_logical=xl_db,
                    with_energy=stall_window > 0,
                )
                delta_new, tnp_new = psi_p, tnp_p
            else:
                psi_c, tnp_c, vel_new, mx_sq = fused_gd_iteration_db_padded(
                    delta,
                    tnp,
                    state.vel if momentum is not None else None,
                    tg_pad_db,
                    t0_pad_db,
                    alpha,
                    w_reg,
                    taps_static,
                    K=warp_window,
                    momentum=momentum,
                    interpret=db_interpret,
                    x_logical=xl_db,
                )
                delta_new = refresh_padded(delta, psi_c)
                tnp_new = refresh_padded(tnp, tnp_c)
            if momentum is None:
                vel_new = state.vel
            mnorm = jnp.sqrt(mx_sq)
        else:
            grad = fields.tsdf_gradient(tnp)
            lap = fields.neg_laplacian(delta)
            dU = (tnp - tsdf_global)[None] * grad + w_reg * lap
            dU_S = sobolev_smooth(dU, taps, mxu=conv_mxu)

            if momentum is not None:
                vel_new = momentum * state.vel + dU_S
                update = alpha * vel_new
            else:
                vel_new = state.vel
                update = alpha * dU_S
            delta_new = delta - update
            tnp_new = fields.sample_trilinear_window(
                t0, ident + delta_new, max_disp=warp_window
            )
            mnorm = jnp.sqrt(jnp.max(jnp.sum(update * update, axis=0)))

        energy = state.energy
        if record_energy and verb_rows is not None:
            energy = jax.lax.dynamic_update_slice(
                energy, verb_rows,
                (jnp.minimum(state.iter, energy_cap - step_n), 0),
            )
        elif record_energy:
            # reg term covers the CURRENT increment (delta), not the composed
            # total field — computing the latter would need a full composition
            # per iteration; data term and max-norm match the reference's.
            if fused_db:
                d_e = unpad_st(delta, xl_db) - ident
                t_e = unpad_st(tnp, xl_db)
            else:
                d_e, t_e = delta, tnp
            J = fields.jacobian(d_e)
            e = jnp.stack(
                [data_energy(tsdf_global, t_e), 0.5 * jnp.sum(J * J), mnorm]
            )
            energy = jax.lax.dynamic_update_slice(
                energy, e[None], (jnp.minimum(state.iter, energy_cap - 1), 0)
            )

        e_ref, stalled = state.e_ref, state.stalled
        if stall_window:
            # branch-free + in-kernel energy on the pp path — see the
            # stall block in estimate_psi's gd_step for the rationale
            it1 = state.iter + step_n
            if e_kern is not None:
                e_now = e_kern
            else:
                t_e = unpad_st(tnp_new, xl_db) if fused_db else tnp_new
                e_now = data_energy(tsdf_global, t_e)
            at_check = (it1 % stall_window) == 0
            stalled = stalled | (
                at_check
                & (it1 >= 2 * stall_window)
                & (e_ref - e_now < jnp.float32(stall_rel) * jnp.abs(e_now))
            )
            e_ref = jnp.where(at_check, e_now, e_ref)

        return SolverState(
            delta_new, tnp_new, state.iter + step_n, mnorm, energy, vel_new,
            e_ref, stalled,
        )

    def cond(state: SolverState) -> jnp.ndarray:
        return (
            (state.iter < max_iter)
            & (state.max_norm > max_update_norm_thresh)
            & jnp.logical_not(state.stalled)
        )

    if momentum is not None:
        vel_dims = psi0.shape
        if fused_db and use_fold:
            vel_dims = (3, Zd, Yd // 2, Xd * 2)  # folded
        elif fused_db and xl_db:
            vel_dims = psi0.shape[:-1] + (x_pad_to,)
        vel0 = jnp.zeros(vel_dims, jnp.float32)
    else:
        vel0 = jnp.float32(0.0)
    # fused state holds id + delta ABSOLUTE coords (edge-padded); the
    # increment pyramid (pyramid_levels > 1) seeds delta from the coarse
    # warm start instead of zero — the initial tsdf_n_psi state must then
    # be T0 warped by the seed (iteration 1's potential gradient consumes
    # it, matching the reference's warp-before-loop, solver.cu:106)
    if delta_init is None:
        g0, t0_init = ident, t0
    else:
        g0 = ident + delta_init
        if fused_db and not db_interpret:
            from sobfu_tpu.ops.pallas_kernels import (
                window_warp_pallas as _ww_pl,
            )

            t0_init = _ww_pl(t0, g0, K=warp_window)
        else:
            t0_init = fields.sample_trilinear_window(
                t0, g0, max_disp=warp_window
            )
    delta0 = pad_st(g0, x_pad_to) if fused_db else (g0 - ident)
    tnp0 = pad_st(t0_init, x_pad_to) if fused_db else t0_init
    init = SolverState(
        delta0,
        tnp0,
        jnp.int32(0),
        jnp.float32(jnp.inf),
        jnp.zeros((energy_cap if record_energy else 1, 3), jnp.float32),
        vel0,
    )
    final = jax.lax.while_loop(cond, gd_step, init)
    g_abs = None  # fused path: the ABSOLUTE id + delta state, unpadded
    if fused_db:
        g_abs = unpad_st(final.psi, xl_db)
        delta_final = g_abs - ident
        tnp_final = unpad_st(final.tsdf_n_psi, xl_db)
        final = final._replace(psi=delta_final, tsdf_n_psi=tnp_final)

    # compose: psi_new(v) = psi0(v + delta(v)) — one field sample (exact
    # gather, or an increment-bounded window sample when total_window is set)
    if total_window:
        if fused_db and not db_interpret:
            # ONE launch: composition + weight_n floor warp at psi_new
            # (the floor sample's position IS the composition output —
            # fusing saves the psi_new HBM round trip and the second
            # launch; the loop's absolute state feeds it directly)
            from sobfu_tpu.ops.pallas_kernels import compose_weight_pallas

            psi_new, weight_n_psi = compose_weight_pallas(
                psi0, g_abs, weight_n,
                Kf=warp_window, Kw=total_window,
            )
        else:
            psi_new = tw_field(psi0, ident + final.psi)
            weight_n_psi = tw_floor(weight_n, psi_new)
        psi_inv = compose_inverse(psi_new, final.psi)
        if skip_inv_warps:  # see the estimate_psi docstring
            tsdf_g_inv, weight_g_inv = tsdf_global, weight_global
        else:
            tsdf_g_inv = tw_scalar(tsdf_global, psi_inv)
            weight_g_inv = tw_floor(weight_global, psi_inv)
    else:
        if fused_db and not db_interpret:
            # the composition's SAMPLING positions are id + delta — window
            # -bounded by construction even though psi0's VALUES are
            # unbounded: ride the C=3 Pallas window sampler (98 -> 26 ms
            # at 128^3, BENCHLOG r5), exactly as the total_window path
            # already composes
            from sobfu_tpu.ops.pallas_kernels import (
                window_warp_field3_pallas as _f3_pl,
            )

            psi_new = _f3_pl(psi0, ident + final.psi, K=warp_window)
        else:
            psi_new = fields.sample_field_trilinear(psi0, ident + final.psi)
        if skip_inverse:
            # no-log production loop: psi_inv's ONLY per-frame consumer is
            # its own next-frame warm start — with the incremental
            # composition unused too, maintaining it is dead work
            # (39 + 98 + 2x98 ms at 128^3). The pipeline recomputes the
            # exact cold inverse on demand (_refresh_inv_warps) when a
            # mesh/viz consumer appears. Reference semantics preserved on
            # demand: 48-step fixed point from identity
            # (vector_fields.cu:111-138).
            psi_inv = psi_inv0 if psi_inv0 is not None else psi0
        else:
            psi_inv = compose_inverse(psi_new, final.psi)
        if skip_inv_warps or skip_inverse:
            tsdf_g_inv, weight_g_inv = tsdf_global, weight_global
        else:
            tsdf_g_inv = fields.sample_trilinear(tsdf_global, psi_inv)
            weight_g_inv = fields.sample_nearest_floor(
                weight_global, psi_inv
            )
        if fused_db and not db_interpret:
            weight_n_psi = fields.sample_hybrid_window_exact(
                weight_n, psi_new, max_disp=warp_window, floor=True
            )
        else:
            weight_n_psi = fields.sample_nearest_floor(weight_n, psi_new)

    return SolveResult(
        psi=psi_new,
        psi_inv=psi_inv,
        tsdf_n_psi=final.tsdf_n_psi,
        weight_n_psi=weight_n_psi,
        tsdf_global_psi_inv=tsdf_g_inv,
        weight_global_psi_inv=weight_g_inv,
        iters=final.iter + total_coarse,
        max_norm=final.max_norm,
        energy=final.energy,
    )


# ---------------------------------------------------------------------------
# z-chunked solve for large grids (TPU extension)
# ---------------------------------------------------------------------------
#
# At 256^3 a monolithic iteration's 67 MB buffers defeat XLA's fusion
# heuristics (measured ~41 ms/iter vs ~14 ms chunked); splitting the state
# into separate per-chunk arrays restores 128^3-like fusion. Halos between
# chunks are explicit concatenations of neighbour edge slices — the single-
# device analogue of the shard_map halo exchange in parallel/sharding.py.


def _chunk_halo(chunks, i, h, ax, cz):
    """Chunk i extended by h rows from its z-neighbours (edge-replicated at
    the global boundaries) along axis `ax`."""
    c = chunks[i]
    lo = (
        jax.lax.slice_in_dim(chunks[i - 1], cz - h, cz, axis=ax)
        if i > 0
        else jnp.repeat(jax.lax.slice_in_dim(c, 0, 1, axis=ax), h, axis=ax)
    )
    hi = (
        jax.lax.slice_in_dim(chunks[i + 1], 0, h, axis=ax)
        if i < len(chunks) - 1
        else jnp.repeat(jax.lax.slice_in_dim(c, cz - 1, cz, axis=ax), h, axis=ax)
    )
    return jnp.concatenate([lo, c, hi], axis=ax)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_chunks",
        "warp_window",
        "inverse_iters",
        "record_energy",
        "energy_cap",
        "momentum",
        "conv_mxu",
    ),
)
def estimate_psi_chunked(
    psi: jnp.ndarray,
    tsdf_global: jnp.ndarray,
    weight_global: jnp.ndarray,
    tsdf_n: jnp.ndarray,
    weight_n: jnp.ndarray,
    taps: jnp.ndarray,
    alpha: jnp.ndarray,
    w_reg: jnp.ndarray,
    max_iter: jnp.ndarray,
    max_update_norm_thresh: jnp.ndarray,
    psi_inv0: Optional[jnp.ndarray] = None,
    *,
    n_chunks: int = 8,
    warp_window: int = 2,
    inverse_iters: int = 48,
    record_energy: bool = False,
    energy_cap: int = 0,
    momentum: Optional[float] = None,
    conv_mxu: bool = False,
) -> SolveResult:
    """Windowed-warp solve with z-chunked state (numerically equivalent to
    ``estimate_psi(..., warp_window=...)`` — same window semantics, same
    stencils; association order of the z-convolution differs, so agreement
    is to float32 round-off, not bit-exact). Use for grids >= 256^3.

    Supports the same ``momentum`` (heavy-ball) extension, the same
    ``psi_inv0`` inverse-field warm start (pair with a reduced
    ``inverse_iters``), and per-iteration ``(e_data, e_reg, max_norm)``
    energy recording as the monolithic solve, so verbose logging and
    accelerated modes work on chunked grids too.
    """
    Z, Y, X = tsdf_n.shape
    assert Z % n_chunks == 0, (Z, n_chunks)
    CZ = Z // n_chunks
    K = warp_window
    S = taps.shape[0]
    R = S // 2
    NC = n_chunks

    def split(a, ax):
        return tuple(
            jax.lax.slice_in_dim(a, i * CZ, (i + 1) * CZ, axis=ax)
            for i in range(NC)
        )

    tg_c = split(tsdf_global, 0)
    tn_c = split(tsdf_n, 0)
    psi_c0 = split(psi, 1)
    ident_c = tuple(
        fields.identity_field((CZ, Y, X)).at[2].add(jnp.float32(i * CZ))
        for i in range(NC)
    )

    def zmask(i):
        m = jnp.ones((CZ, 1, 1), jnp.float32)
        if i == 0:
            m = m.at[0].set(0.0)
        if i == NC - 1:
            m = m.at[-1].set(0.0)
        return m

    masks = [zmask(i) for i in range(NC)]

    def warp_chunks(psis):
        """Window-warp tsdf_n at psi, per chunk (halo K from neighbours)."""
        outs = []
        for i in range(NC):
            live_e = _chunk_halo(tn_c, i, K, 0, CZ)
            # live_e's frame: row q <-> global row i*CZ - K + q; the local
            # block starts at live_e row K, so z0 = K and coordinates shift
            # into the live_e frame
            p = psis[i].at[2].add(jnp.float32(-(i * CZ - K)))
            outs.append(fields.sample_trilinear_window_zoffset(live_e, p, K, K))
        return tuple(outs)

    def chunked_energies(psis, tnps):
        """(e_data, e_reg) with the monolithic boundary semantics: x/y
        derivatives vanish on their boundary slices (central_diff), z
        derivatives vanish on the GLOBAL z boundary (masks)."""
        e_data = jnp.float32(0.0)
        e_reg = jnp.float32(0.0)
        disps = tuple(p - e for p, e in zip(psis, ident_c))
        for i in range(NC):
            d = tnps[i] - tg_c[i]
            e_data = e_data + 0.5 * jnp.sum(d * d)
            disp_e = _chunk_halo(disps, i, 1, 1, CZ)
            jx = fields.central_diff(disps[i], -1)
            jy = fields.central_diff(disps[i], -2)
            jz = (disp_e[:, 2:] - disp_e[:, :-2]) * 0.5 * masks[i]
            e_reg = e_reg + 0.5 * (
                jnp.sum(jx * jx) + jnp.sum(jy * jy) + jnp.sum(jz * jz)
            )
        return e_data, e_reg

    def gd_step(state):
        psis, tnps, it, _, energy, vels = state
        dUs = []
        for i in range(NC):
            tnp_e = _chunk_halo(tnps, i, 1, 0, CZ)
            psi_e = _chunk_halo(psis, i, 1, 1, CZ)
            m = masks[i]
            gx = fields.central_diff(tnps[i], -1)
            gy = fields.central_diff(tnps[i], -2)
            gz = (tnp_e[2:] - tnp_e[:-2]) * 0.5 * m
            grad = jnp.stack([gx, gy, gz], 0)
            lap = -(
                fields.second_diff(psis[i], -1)
                + fields.second_diff(psis[i], -2)
                + (psi_e[:, 2:] + psi_e[:, :-2] - 2 * psis[i]) * m
            )
            dUs.append((tnps[i] - tg_c[i])[None] * grad + w_reg * lap)

        new_psis = []
        new_vels = []
        mns = []
        for i in range(NC):
            dU_e = _chunk_halo(dUs, i, R, 1, CZ)
            if conv_mxu:
                acc = (
                    fields.conv1d_replicate_mxu(dUs[i], taps, -1)
                    + fields.conv1d_replicate_mxu(dUs[i], taps, -2)
                    + fields.conv1d_valid_mxu(dU_e, taps, 1)
                )
            else:
                acc = fields.conv1d_replicate(
                    dUs[i], taps, -1
                ) + fields.conv1d_replicate(dUs[i], taps, -2)
                # taps index flipped (S-1-k) to match conv1d_replicate's true-
                # convolution orientation for asymmetric taps; identical for
                # the symmetric Sobolev filters actually shipped.
                for k in range(S):
                    acc = acc + taps[S - 1 - k] * dU_e[:, k : k + CZ]
            if momentum is not None:
                v = momentum * vels[i] + acc
                new_vels.append(v)
                upd = alpha * v
            else:
                upd = alpha * acc
            new_psis.append(psis[i] - upd)
            mns.append(jnp.max(jnp.sum(upd * upd, 0)))
        new_psis = tuple(new_psis)
        new_vels = tuple(new_vels) if momentum is not None else vels
        mnorm = jnp.sqrt(jnp.max(jnp.stack(mns)))

        if record_energy:
            e_data, e_reg = chunked_energies(psis, tnps)
            e = jnp.stack([e_data, e_reg, mnorm])
            energy = jax.lax.dynamic_update_slice(
                energy, e[None], (jnp.minimum(it, energy_cap - 1), 0)
            )

        return new_psis, warp_chunks(new_psis), it + 1, mnorm, energy, new_vels

    def cond(state):
        return (state[2] < max_iter) & (state[3] > max_update_norm_thresh)

    energy0 = jnp.zeros((energy_cap if record_energy else 1, 3), jnp.float32)
    vels0 = (
        tuple(jnp.zeros_like(p) for p in psi_c0)
        if momentum is not None
        else jnp.float32(0.0)
    )
    init = (
        psi_c0, warp_chunks(psi_c0), jnp.int32(0), jnp.float32(jnp.inf),
        energy0, vels0,
    )
    psis, tnps, iters, mnorm, energy_hist, _ = jax.lax.while_loop(
        cond, gd_step, init
    )

    # ---- inverse field, chunked (the monolithic 48-step fixed point costs
    # ~80 ms/step at 256^3 — chunking restores fusion here too) ----
    disp_c = tuple(p - e for p, e in zip(psis, ident_c))

    def sample_field_chunks(field_chunks, coord_chunks):
        outs = []
        for i in range(NC):
            f_e = _chunk_halo(field_chunks, i, K, 1, CZ)
            p = coord_chunks[i].at[2].add(jnp.float32(-(i * CZ - K)))
            outs.append(fields.sample_trilinear_window_zoffset(f_e, p, K, K))
        return tuple(outs)

    def inv_body(_, inv_c):
        s = sample_field_chunks(disp_c, inv_c)
        return tuple(e - d for e, d in zip(ident_c, s))

    inv_init = ident_c if psi_inv0 is None else split(psi_inv0, 1)
    inv_c = jax.lax.fori_loop(0, inverse_iters, inv_body, inv_init)

    # ---- tail warps, chunked ----
    tg_chunks = tg_c
    wg_chunks = split(weight_global, 0)
    wn_chunks = split(weight_n, 0)

    def sample_scalar_chunks(vol_chunks, coord_chunks, floor=False):
        outs = []
        fn = (
            fields.sample_nearest_floor_window_zoffset
            if floor
            else fields.sample_trilinear_window_zoffset
        )
        for i in range(NC):
            v_e = _chunk_halo(vol_chunks, i, K, 0, CZ)
            p = coord_chunks[i].at[2].add(jnp.float32(-(i * CZ - K)))
            outs.append(fn(v_e, p, K, K))
        return outs

    tsdf_g_inv = jnp.concatenate(sample_scalar_chunks(tg_chunks, inv_c), axis=0)
    weight_g_inv = jnp.concatenate(
        sample_scalar_chunks(wg_chunks, inv_c, floor=True), axis=0
    )
    weight_n_psi = jnp.concatenate(
        sample_scalar_chunks(wn_chunks, psis, floor=True), axis=0
    )

    psi_full = jnp.concatenate(psis, axis=1)
    tnp_full = jnp.concatenate(tnps, axis=0)
    psi_inv = jnp.concatenate(inv_c, axis=1)

    return SolveResult(
        psi=psi_full,
        psi_inv=psi_inv,
        tsdf_n_psi=tnp_full,
        weight_n_psi=weight_n_psi,
        tsdf_global_psi_inv=tsdf_g_inv,
        weight_global_psi_inv=weight_g_inv,
        iters=iters,
        max_norm=mnorm,
        energy=energy_hist,
    )


# ---------------------------------------------------------------------------
# z-slab SCAN solve for 512^3-scale grids (TPU extension)
# ---------------------------------------------------------------------------
#
# The z-chunked solve above unrolls a Python loop over chunks, so its HLO
# grows linearly with the chunk count — at 512^3 the resulting program
# (and the fused Pallas kernel, and even a monolithic XLA loop) exceeds
# what this pool's remote compile service will build (docs/BENCHLOG.md
# round-3: >20 min / HTTP 500). This variant runs the SAME Jacobi-style
# per-iteration update as a lax.scan over z-slabs: the compiled program
# contains ONE slab body regardless of grid size, so 512^3 compiles in
# minutes. Per-slab halos are dynamic slices of the previous iteration's
# full arrays (edge-padded in z), exactly the single-device analogue of
# the shard_map halo exchange — stencil+conv reads use the H=4 halo, the
# live warp a K halo. Loop-invariant volumes (phi_global, live) are
# optionally stored in bf16 (storage only — all arithmetic in f32),
# halving their per-iteration HBM traffic; the loop STATE stays f32.


@functools.partial(
    jax.jit,
    static_argnames=(
        "slab", "warp_window", "momentum", "storage_bf16",
    ),
)
def estimate_psi_zscan(
    psi: jnp.ndarray,
    tsdf_global: jnp.ndarray,
    tsdf_n: jnp.ndarray,
    taps: jnp.ndarray,
    alpha: jnp.ndarray,
    w_reg: jnp.ndarray,
    max_iter: jnp.ndarray,
    max_update_norm_thresh: jnp.ndarray,
    *,
    slab: int = 32,
    warp_window: int = 2,
    momentum=None,
    storage_bf16: bool = True,
):
    """Windowed GD solve with a lax.scan-over-z-slabs iteration body.

    Semantics: reference solver loop (solver.cu:114-193) with the
    bounded-window warp — the same update as :func:`estimate_psi`
    (windowed mode); Jacobi chunking like :func:`estimate_psi_chunked`
    (every slab reads the PREVIOUS iteration's neighbours). Returns
    (psi, tsdf_n_psi, iters, max_norm) — the solve core only (pair with
    the windowed tail helpers for inverse/warps; at this scale the tails
    are the multi-chip path's job, parallel/sharding.py).
    """
    dims = tsdf_n.shape
    Z, Y, X = dims
    H = 4  # stencil radius 1 + conv radius 3
    K = int(warp_window)
    R = taps.shape[0] // 2  # conv radius (static: shape, not value)
    assert R <= 3, "H=4 halo covers tap counts <= 7"
    assert Z % slab == 0
    n_slabs = Z // slab
    E = slab + 2 * R  # extended rows on which dU is computed
    f32 = jnp.float32
    store = jnp.bfloat16 if storage_bf16 else jnp.float32

    # [Z, 3, Y, X] internal layout: z leading makes every per-slab slice a
    # leading-axis dynamic slice and the scan output a free reshape
    psi_zf = jnp.moveaxis(psi, 0, 1)
    tg_pad_r = jnp.pad(
        tsdf_global, [(R, R), (0, 0), (0, 0)], mode="edge"
    ).astype(store)
    live_pad = jnp.pad(tsdf_n, [(K, K)] * 3, mode="edge").astype(store)

    mu = None if momentum is None else jnp.float32(momentum)

    def warp_slab(psi_s, z0):
        """Bounded-window warp of the (pre-padded) live volume on one
        z-slab; psi_s is [slab, 3, Y, X] absolute coords."""
        zz = jnp.arange(slab, dtype=f32)[:, None, None] + z0.astype(f32)
        yy = jnp.arange(Y, dtype=f32)[None, :, None]
        xx = jnp.arange(X, dtype=f32)[None, None, :]
        hi = K - 1e-4
        dx = jnp.clip(jnp.clip(psi_s[:, 0], 0.0, X - 1) - xx, -K, hi)
        dy = jnp.clip(jnp.clip(psi_s[:, 1], 0.0, Y - 1) - yy, -K, hi)
        dz = jnp.clip(jnp.clip(psi_s[:, 2], 0.0, Z - 1) - zz, -K, hi)
        wxs = [jnp.maximum(0.0, 1.0 - jnp.abs(dx - o))
               for o in range(-K, K + 1)]
        wys = [jnp.maximum(0.0, 1.0 - jnp.abs(dy - o))
               for o in range(-K, K + 1)]
        out = jnp.zeros((slab, Y, X), f32)
        for oz in range(-K, K + 1):
            lz = jax.lax.dynamic_slice_in_dim(
                live_pad, z0 + K + oz, slab, axis=0
            ).astype(f32)
            wz = jnp.maximum(0.0, 1.0 - jnp.abs(dz - oz))
            acc_y = jnp.zeros((slab, Y, X), f32)
            for oy in range(-K, K + 1):
                lzy = jax.lax.slice_in_dim(lz, K + oy, K + oy + Y, axis=1)
                acc_x = jnp.zeros((slab, Y, X), f32)
                for ox in range(-K, K + 1):
                    acc_x = acc_x + wxs[ox + K] * jax.lax.slice_in_dim(
                        lzy, K + ox, K + ox + X, axis=2
                    )
                acc_y = acc_y + wys[oy + K] * acc_x
            out = out + wz * acc_y
        return out

    # initial tnp = warp(live, psi), ALSO slab-scanned: the monolithic
    # full-volume window sampler's temps alone exceed HBM at 512^3
    def init_slab(_, i):
        z0 = i * slab
        psi_s = jax.lax.dynamic_slice_in_dim(psi_zf, z0, slab, axis=0)
        return 0.0, warp_slab(psi_s, z0)

    _, tnp0_sl = jax.lax.scan(
        init_slab, 0.0, jnp.arange(n_slabs, dtype=jnp.int32)
    )
    tnp0 = tnp0_sl.reshape(Z, Y, X)

    def gd_iteration(psi_zf, tnp_f, vel_zf):
        psi_p = jnp.pad(psi_zf, [(H, H), (0, 0), (0, 0), (0, 0)],
                        mode="edge")
        tnp_p = jnp.pad(tnp_f, [(H, H), (0, 0), (0, 0)], mode="edge")

        def slab_body(carry, i):
            z0 = i * slab
            # extended region: E rows starting at global z0 - R
            # (padded-array offset z0 + H - R - 1 for the stencil reach)
            psi_e2 = jax.lax.dynamic_slice_in_dim(
                psi_p, z0 + H - R - 1, E + 2, axis=0
            )  # +1 stencil row each side
            tnp_e2 = jax.lax.dynamic_slice_in_dim(
                tnp_p, z0 + H - R - 1, E + 2, axis=0
            )

            gz_e = jnp.clip(
                jnp.arange(E, dtype=jnp.int32)[:, None, None] + (z0 - R),
                0, Z - 1,
            )
            mz = ((gz_e > 0) & (gz_e < Z - 1)).astype(f32)

            ctr = lambda a: a[1:1 + E]  # noqa: E731 — drop stencil rows
            tnp_e = ctr(tnp_e2)
            psi_e = ctr(psi_e2)

            # gradient of tnp on the extended rows (x/y vanish at global
            # array edges via central_diff; z masked by global index)
            gx = fields.central_diff(tnp_e, -1)
            gy = fields.central_diff(tnp_e, -2)
            gzd = (tnp_e2[2:] - tnp_e2[:-2]) * 0.5 * mz
            diff = tnp_e - jax.lax.dynamic_slice_in_dim(
                tg_pad_r, z0, E, axis=0
            ).astype(f32)

            # negated Laplacian of psi on the extended rows
            lap = -(
                fields.second_diff(psi_e, -1)
                + fields.second_diff(psi_e, -2)
                + (psi_e2[2:] + psi_e2[:-2] - 2.0 * psi_e) * mz[:, None]
            )

            grad = jnp.stack([gx, gy, gzd], axis=1)  # [E, 3, Y, X]
            dU = diff[:, None] * grad + w_reg * lap

            # Sobolev smoothing: x/y convs on the CENTER rows, z conv
            # consumes the 2R extended rows (sum of 1-D convs, the
            # reference's solver.cu:290,366,443 accumulate convention)
            dU_c = dU[R:R + slab]
            n_taps = taps.shape[0]
            dU_S = conv(dU_c, taps, -1) + conv(dU_c, taps, -2)
            for k in range(n_taps):
                dU_S = dU_S + taps[n_taps - 1 - k] * dU[k:k + slab]

            if mu is not None:
                vel_s = jax.lax.dynamic_slice_in_dim(vel_zf, z0, slab, 0)
                vel_new = mu * vel_s + dU_S
                update = alpha * vel_new
            else:
                vel_new = jnp.zeros((0,), f32)
                update = alpha * dU_S
            psi_new_s = psi_e[R:R + slab] - update

            # bounded-window warp of the live volume at the new psi
            # (pre-padded store-dtype volume; arithmetic in f32)
            tnp_new_s = warp_slab(psi_new_s, z0)

            mx = jnp.max(jnp.sum(update * update, axis=1))
            return jnp.maximum(carry, mx), (psi_new_s, tnp_new_s, vel_new)

        mx_sq, (psi_sl, tnp_sl, vel_sl) = jax.lax.scan(
            slab_body, jnp.float32(0.0), jnp.arange(n_slabs, dtype=jnp.int32)
        )
        psi_new = psi_sl.reshape(Z, 3, Y, X)
        tnp_new = tnp_sl.reshape(Z, Y, X)
        vel_new = (
            vel_sl.reshape(Z, 3, Y, X) if mu is not None else vel_zf
        )
        return psi_new, tnp_new, vel_new, jnp.sqrt(mx_sq)

    conv = fields.conv1d_replicate

    vel0 = (
        jnp.zeros_like(psi_zf) if mu is not None else jnp.zeros((0,), f32)
    )

    def cond(state):
        _, _, _, it, mnorm = state
        return (it < max_iter) & (mnorm > max_update_norm_thresh)

    def body(state):
        psi_zf, tnp_f, vel_zf, it, _ = state
        psi_zf, tnp_f, vel_zf, mnorm = gd_iteration(psi_zf, tnp_f, vel_zf)
        return psi_zf, tnp_f, vel_zf, it + 1, mnorm

    psi_zf, tnp_f, _, iters, mnorm = jax.lax.while_loop(
        cond, body,
        (psi_zf, tnp0, vel0, jnp.int32(0), jnp.float32(jnp.inf)),
    )
    return jnp.moveaxis(psi_zf, 1, 0), tnp_f, iters, mnorm
