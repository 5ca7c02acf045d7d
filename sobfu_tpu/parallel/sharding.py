"""Spatial sharding of the solver across a TPU mesh.

The reference is single-GPU (SURVEY.md §2: no distributed layer). The
TPU-native scale-out path shards the voxel grid along Z across the ICI mesh
with `shard_map`:

  * per-iteration stencils / convolutions use a radius-4 halo exchange
    (`lax.ppermute` of boundary slices) — the z-stencil radius is 1 and the
    Sobolev convolution radius is 3, so one 4-slice exchange per iteration
    covers both;
  * warp sources come in two modes. Exact mode (warp_window=None): the
    live TSDF `phi_n` is all-gathered ONCE per solve (it is constant during
    the gradient descent), making the trilinear warp gather exact with no
    bound on displacement. Windowed mode (warp_window=K): every full-volume
    materialisation — live warp source, inverse-field displacement, tail
    warps of phi_global/weights — is replaced by a K-halo exchange plus the
    bounded-window zoffset sampler, so per-device memory stays at
    block + halo even at 512^3 (the memory-scalable production path);
  * the convergence norm is a `lax.pmax` — the loop predicate never leaves
    the devices;
  * scene-level data parallelism is a `vmap` over a leading scene axis laid
    out on a second mesh axis.

All collectives ride ICI; nothing ever syncs to the host inside the loop.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sobfu_tpu import fields
from sobfu_tpu.fields import conv1d_replicate  # reuse helper


def make_mesh(
    n_z: Optional[int] = None, n_scene: int = 1, devices=None
) -> Mesh:
    """Create a ('scene', 'z') device mesh. n_z defaults to all devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_z is None:
        n_z = len(devices) // n_scene
    devices = devices[: n_scene * n_z].reshape(n_scene, n_z)
    return Mesh(devices, ("scene", "z"))


# ---------------------------------------------------------------------------
# halo exchange + halo-aware stencils
# ---------------------------------------------------------------------------


def _halo_exchange_z(x: jnp.ndarray, h: int, axis_name: str) -> jnp.ndarray:
    """Pad the local z-block (axis -3) with h slices from both neighbours.

    Boundary shards replicate their edge slice (matching the reference's
    clamp-to-edge stencil/convolution semantics, solver.cu:246-270).
    """
    nz = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    zax = x.ndim - 3

    top = jax.lax.slice_in_dim(x, x.shape[zax] - h, x.shape[zax], axis=zax)
    bot = jax.lax.slice_in_dim(x, 0, h, axis=zax)

    # lower halo: top slices of the previous shard (i-1 -> i)
    lower = jax.lax.ppermute(top, axis_name, [(i, (i + 1) % nz) for i in range(nz)])
    # upper halo: bottom slices of the next shard (i+1 -> i)
    upper = jax.lax.ppermute(bot, axis_name, [(i, (i - 1) % nz) for i in range(nz)])

    # replicate edges on the global boundary shards
    edge_lo = jnp.repeat(jax.lax.slice_in_dim(x, 0, 1, axis=zax), h, axis=zax)
    edge_hi = jnp.repeat(
        jax.lax.slice_in_dim(x, x.shape[zax] - 1, x.shape[zax], axis=zax), h, axis=zax
    )
    lower = jnp.where(idx == 0, edge_lo, lower)
    upper = jnp.where(idx == nz - 1, edge_hi, upper)
    return jnp.concatenate([lower, x, upper], axis=zax)


def _central_diff_z_halo(xp: jnp.ndarray, h: int, zmask) -> jnp.ndarray:
    """d/dz on a halo-padded block -> local-sized result, zero at global edges."""
    zax = xp.ndim - 3
    n_local = xp.shape[zax] - 2 * h
    up = jax.lax.slice_in_dim(xp, h + 1, h + 1 + n_local, axis=zax)
    dn = jax.lax.slice_in_dim(xp, h - 1, h - 1 + n_local, axis=zax)
    return (up - dn) * 0.5 * zmask


def _second_diff_z_halo(xp: jnp.ndarray, h: int, zmask) -> jnp.ndarray:
    zax = xp.ndim - 3
    n_local = xp.shape[zax] - 2 * h
    up = jax.lax.slice_in_dim(xp, h + 1, h + 1 + n_local, axis=zax)
    mid = jax.lax.slice_in_dim(xp, h, h + n_local, axis=zax)
    dn = jax.lax.slice_in_dim(xp, h - 1, h - 1 + n_local, axis=zax)
    return (up + dn - 2.0 * mid) * zmask


def _conv_z_halo(xp: jnp.ndarray, taps: jnp.ndarray, h: int) -> jnp.ndarray:
    """z-convolution consuming radius r of the h-halo -> local-sized result."""
    s = taps.shape[0]
    r = s // 2
    zax = xp.ndim - 3
    n_local = xp.shape[zax] - 2 * h
    out = None
    for u in range(s):
        sl = jax.lax.slice_in_dim(xp, h + r - u, h + r - u + n_local, axis=zax)
        out = taps[u] * sl if out is None else out + taps[u] * sl
    return out


def _zmask(n_local: int, h_is_first, h_is_last, dtype=jnp.float32) -> jnp.ndarray:
    """1 everywhere except the global boundary z-slices (stencils vanish
    there, matching vector_fields.cu:165-191)."""
    col = jnp.ones((n_local, 1, 1), dtype)
    first = col.at[0].set(0.0)
    last = col.at[-1].set(0.0)
    m = jnp.where(h_is_first, first, col)
    m = jnp.where(h_is_last, m * last, m)
    return m


# ---------------------------------------------------------------------------
# sharded solve
# ---------------------------------------------------------------------------


def _sample_window_local(vol_e, coords_l, z0, K, floor=False):
    """Windowed sampling of a local z-block from its K-halo-extended volume.

    vol_e: local block + K halo rows each side [.., Zl+2K, Y, X];
    coords_l: ABSOLUTE (global) coordinates of the local block's voxels;
    z0: global z offset of the local block. Shifts coordinates into the
    extended-local frame (edge-replicated halos at the global boundary make
    the local coordinate clamp equivalent to the reference's global clamp).
    """
    p = coords_l.at[2].add(-(jnp.asarray(z0, jnp.float32) - K))
    fn = (
        fields.sample_nearest_floor_window_zoffset
        if floor
        else fields.sample_trilinear_window_zoffset
    )
    return fn(vol_e, p, K, K)


def _gd_step_local(
    psi_l, tnp_l, tsdf_g_l, tsdf_n_src, taps, alpha, w_reg, z0, axis_name,
    warp_window=None, vel_l=None, momentum=None,
):
    """One gradient-descent step on a local z-block (runs inside shard_map).

    psi_l/tnp_l/tsdf_g_l: local blocks [.., Zl, Y, X]. tsdf_n_src is the
    warp source for the live tsdf: the FULL volume (replicated) when
    warp_window is None, or the K-halo-extended LOCAL block when
    warp_window=K — the memory-scalable path, where nothing full-sized is
    ever materialised per device.
    warp_window: None = exact XLA gather warp; int = gather-free bounded
    window (the TPU-fast path, see fields.sample_trilinear_window_zoffset).
    vel_l/momentum: heavy-ball velocity block + coefficient (production
    acceleration, same semantics as the single-chip solve; the velocity is
    purely local — no extra collectives).
    """
    H = 4  # halo: stencil radius 1 + conv radius 3
    nz = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    zmask = _zmask(psi_l.shape[-3], idx == 0, idx == nz - 1)

    psi_p = _halo_exchange_z(psi_l, H, axis_name)
    tnp_p = _halo_exchange_z(tnp_l, H, axis_name)

    # gradient of the warped live tsdf: x/y stencils are local, z uses halo
    gx = fields.central_diff(tnp_l, -1)
    gy = fields.central_diff(tnp_l, -2)
    gz = _central_diff_z_halo(tnp_p, H, zmask)
    grad = jnp.stack([gx, gy, gz], axis=0)

    # negated Laplacian of psi
    lap = -(
        fields.second_diff(psi_l, -1)
        + fields.second_diff(psi_l, -2)
        + _second_diff_z_halo(psi_p, H, zmask)
    )

    dU = (tnp_l - tsdf_g_l)[None] * grad + w_reg * lap

    # Sobolev smoothing: x/y convs are local (replicate pad), z conv needs halo
    dU_p = _halo_exchange_z(dU, H, axis_name)
    dU_S = (
        conv1d_replicate(dU, taps, axis=-1)
        + conv1d_replicate(dU, taps, axis=-2)
        + _conv_z_halo(dU_p, taps, H)
    )

    if momentum is not None:
        vel_new = momentum * vel_l + dU_S
        update = alpha * vel_new
    else:
        vel_new = vel_l
        update = alpha * dU_S
    psi_new = psi_l - update

    # psi holds GLOBAL coords; sample the live volume (full or halo-extended)
    if warp_window is None:
        tnp_new = fields.sample_trilinear(tsdf_n_src, psi_new)
    else:
        tnp_new = _sample_window_local(tsdf_n_src, psi_new, z0, warp_window)

    mnorm = jnp.sqrt(jnp.max(jnp.sum(update * update, axis=0)))
    mnorm = jax.lax.pmax(mnorm, axis_name)
    return psi_new, tnp_new, vel_new, mnorm


def _gd_step_local_fused(
    psi_l, tnp_l, tg_pad, live_pad, taps_static, alpha, w_reg, z0, axis_name,
    K, z_global, interpret, vel_l=None, momentum=None,
):
    """One fused-kernel gradient-descent step on a local z-block.

    The per-shard program is the single-chip fused Pallas iteration
    (:func:`sobfu_tpu.ops.pallas_kernels.fused_gd_iteration_db_padded`)
    with its z-halo rows fed by the ICI halo exchange instead of edge
    replication — the kernel's global-position masks/coordinates take the
    shard offset (z_base) and global depth (z_global). Exactly the same
    numbers as :func:`_gd_step_local` in windowed mode, including the
    heavy-ball momentum extension (vel_l/momentum).
    """
    from sobfu_tpu.ops.pallas_kernels import fused_gd_iteration_db_padded

    H = 4
    psi_p = _halo_exchange_z(psi_l, H, axis_name)
    tnp_p = _halo_exchange_z(tnp_l, H, axis_name)
    psi_pad = jnp.pad(psi_p, [(0, 0), (0, 0), (H, H), (0, 0)], mode="edge")
    tnp_pad = jnp.pad(tnp_p, [(0, 0), (H, H), (0, 0)], mode="edge")
    psi_c, tnp_c, vel_new, mx_sq = fused_gd_iteration_db_padded(
        psi_pad, tnp_pad, vel_l if momentum is not None else None,
        tg_pad, live_pad, alpha, w_reg, taps_static,
        K=K, momentum=momentum, interpret=interpret,
        z_base=z0, z_global=z_global,
    )
    if momentum is None:
        vel_new = vel_l
    mnorm = jax.lax.pmax(jnp.sqrt(mx_sq), axis_name)
    return psi_c, tnp_c, vel_new, mnorm


def _gd_step_local_fused_fold(
    psi_lf, tnp_lf, tg_pad, live_pad, taps_static, alpha, w_reg, z0,
    axis_name, K, z_global, interpret, vel_l=None, momentum=None,
    fold_xmats=False,
):
    """One Y-FOLDED fused-kernel step on a local z-block (X=64 grids).

    The per-shard program is the single-chip fold iteration
    (:func:`sobfu_tpu.ops.pallas_kernels.fused_gd_iteration_fold_padded`)
    with its z-halo rows fed by the ICI halo exchange (exchanged on the
    FOLDED layout — folding only touches y, so z halos are unaffected) and
    global-coordinate masks via z_base/z_global. State stays folded across
    the loop; same numbers as :func:`_gd_step_local` in windowed mode."""
    from sobfu_tpu.ops.pallas_kernels import (
        _H,
        fused_gd_iteration_fold_padded,
        pad_folded,
    )

    psi_pad = pad_folded(_halo_exchange_z(psi_lf, _H, axis_name), 0)
    tnp_pad = pad_folded(_halo_exchange_z(tnp_lf, _H, axis_name), 0)
    psi_c, tnp_c, vel_new, mx_sq, _ = fused_gd_iteration_fold_padded(
        psi_pad, tnp_pad, vel_l if momentum is not None else None,
        tg_pad, live_pad, alpha, w_reg, taps_static,
        K=K, momentum=momentum, interpret=interpret,
        z_base=z0, z_global=z_global,
        use_xmats=fold_xmats,
        xmats_precision=(
            jax.lax.Precision.HIGHEST if fold_xmats else None
        ),
    )
    if momentum is None:
        vel_new = vel_l
    mnorm = jax.lax.pmax(jnp.sqrt(mx_sq), axis_name)
    return psi_c, tnp_c, vel_new, mnorm


def _downsample2_local(vol: jnp.ndarray) -> jnp.ndarray:
    """2x average-pool the last three axes of a local block."""
    sh = vol.shape
    Z, Y, X = sh[-3], sh[-2], sh[-1]
    v = vol.reshape(sh[:-3] + (Z // 2, 2, Y // 2, 2, X // 2, 2))
    return v.mean(axis=(-5, -3, -1))


def _gd_loop_local(
    psi_l, tg_l, live_l, live_src, taps, alpha, w_reg, max_iter, thresh,
    z0, axis, K, *, fused=False, taps_static=None, momentum=None,
    interpret=False, stall_window=0, stall_rel=1e-3, fold_xmats=False,
):
    """The windowed/exact GD while_loop on local z-blocks (inside shard_map).

    Shared by the standalone sharded solve and the full frame step — ONE
    maintained loop body for every multi-chip configuration.

    live_src: the warp source — K-halo-extended ``live_l`` (windowed mode)
    or the full all-gathered volume (K=None, exact mode). For a compositive
    fine level, pass the pre-warped T0 as live_l/live_src and the global
    identity as psi_l: the loop then solves for id + delta verbatim (the
    identity's masked Laplacian vanishes), mirroring the single-chip
    :func:`sobfu_tpu.solver.estimate_psi_compositive` fused_db note.

    stall_window/stall_rel: data-energy stall stop (production safety net,
    solver.py gd_step semantics): e = 0.5 * psum |tnp - tg|^2 checked every
    ``stall_window`` iterations against the previous checkpoint — one extra
    scalar psum per iteration, nothing leaves the devices.

    Returns (psi_l, tnp_l, iters, max_norm).
    """
    if K is None:
        tnp0 = fields.sample_trilinear(live_src, psi_l)
    else:
        tnp0 = _sample_window_local(live_src, psi_l, z0, K)

    use_fold = False
    if fused:
        H = 4
        z_global = tg_l.shape[-3] * jax.lax.axis_size(axis)
        # Y-FOLDED per-shard kernel for X=64 grids (y-pairs pack the 128
        # lanes — the plain db kernel would lane-pad to 128 with half the
        # VPU dead); same auto-dispatch rule as the single-chip solve
        use_fold = (
            tg_l.shape[-1] * 2 == 128
            and tg_l.shape[-2] % 2 == 0
            and tg_l.shape[-3] % 8 == 0
        )
        if use_fold:
            from sobfu_tpu.ops.pallas_kernels import _H, fold_y, pad_folded

            tg_pad_f = pad_folded(
                _halo_exchange_z(fold_y(tg_l), _H, axis), 0
            )
            live_pad_f = pad_folded(
                _halo_exchange_z(fold_y(live_l), _H, axis), 0
            )
            tg_lf = fold_y(tg_l)  # for the stall energy (sum is layout-
            # independent; keeps the loop state folded throughout)
            psi_l = fold_y(psi_l)
            tnp0 = fold_y(tnp0)
        else:
            tg_pad_f = jnp.pad(
                _halo_exchange_z(tg_l, H, axis), [(0, 0), (H, H), (0, 0)],
                mode="edge",
            )
            live_pad_f = jnp.pad(
                _halo_exchange_z(live_l, H, axis), [(0, 0), (H, H), (0, 0)],
                mode="edge",
            )

    vel0 = jnp.zeros_like(psi_l) if momentum is not None else jnp.float32(0.0)
    inf = jnp.float32(jnp.inf)

    def cond(state):
        _, _, it, mnorm, _, _, stalled = state
        return (it < max_iter) & (mnorm > thresh) & jnp.logical_not(stalled)

    def body(state):
        psi_l, tnp_l, it, _, vel_l, e_ref, stalled = state
        if fused and use_fold:
            psi_l, tnp_l, vel_l, mnorm = _gd_step_local_fused_fold(
                psi_l, tnp_l, tg_pad_f, live_pad_f, taps_static, alpha,
                w_reg, z0, axis, K, z_global, interpret, vel_l, momentum,
                fold_xmats=fold_xmats,
            )
        elif fused:
            psi_l, tnp_l, vel_l, mnorm = _gd_step_local_fused(
                psi_l, tnp_l, tg_pad_f, live_pad_f, taps_static, alpha,
                w_reg, z0, axis, K, z_global, interpret, vel_l, momentum,
            )
        else:
            psi_l, tnp_l, vel_l, mnorm = _gd_step_local(
                psi_l, tnp_l, tg_l, live_src, taps, alpha, w_reg, z0, axis,
                K, vel_l, momentum,
            )
        if stall_window:
            it1 = it + 1
            d = tnp_l - (tg_lf if use_fold else tg_l)
            e_now = 0.5 * jax.lax.psum(jnp.sum(d * d), axis)
            at_check = (it1 % stall_window) == 0
            stalled = stalled | (
                at_check
                & (it1 >= 2 * stall_window)
                & (e_ref - e_now < jnp.float32(stall_rel) * jnp.abs(e_now))
            )
            e_ref = jnp.where(at_check, e_now, e_ref)
        return psi_l, tnp_l, it + 1, mnorm, vel_l, e_ref, stalled

    psi_l, tnp_l, iters, mnorm, _, _, _ = jax.lax.while_loop(
        cond, body,
        (psi_l, tnp0, jnp.int32(0), inf, vel0, inf, jnp.bool_(False)),
    )
    if use_fold:
        from sobfu_tpu.ops.pallas_kernels import unfold_y

        psi_l = unfold_y(psi_l)
        tnp_l = unfold_y(tnp_l)
    return psi_l, tnp_l, iters, mnorm


def _pyramid_warmstart_local(
    psi_l, tg_l, tn_l, taps, alpha, w_reg, thresh, z0, axis, K, levels,
    coarse_its, momentum,
):
    """Coarse-to-fine warm start on LOCAL blocks (z stays sharded at every
    level; halo exchange works identically). Mirrors the single-chip
    :func:`sobfu_tpu.solver.estimate_psi_pyramid` coarse levels: plain
    windowed steps (coarse work is cheap; the fused kernel's lane
    constraints need not hold there), displacement upsampled per shard.

    Returns (psi_l warm-started at full level, total coarse iterations).
    """
    pyr = [(tg_l, tn_l)]
    for _ in range(levels - 1):
        a, b = pyr[-1]
        pyr.append((_downsample2_local(a), _downsample2_local(b)))
    f = 2 ** (levels - 1)
    ident_l0 = fields.identity_field(
        psi_l.shape[-3:], psi_l.dtype
    ).at[2].add(z0.astype(psi_l.dtype))
    disp = _downsample2_local(psi_l - ident_l0)
    for _ in range(levels - 2):
        disp = _downsample2_local(disp)
    disp = disp * jnp.float32(1.0 / f)
    total_coarse = jnp.int32(0)
    for lev in range(levels - 1, 0, -1):
        tg_c, tn_c = pyr[lev]
        nl_c = tg_c.shape[-3]
        z0_c = jax.lax.axis_index(axis) * nl_c
        ident_c = fields.identity_field(
            tg_c.shape[-3:], psi_l.dtype
        ).at[2].add(z0_c.astype(psi_l.dtype))
        tn_src_c = _halo_exchange_z(tn_c, K, axis)
        # coarse threshold schedule: level L stops at thresh * 0.5^L —
        # constant METRIC accuracy per level, matching the single-chip
        # pyramid's coarse_thresh_scale default (solver.py)
        thresh_c = thresh * jnp.float32(0.5 ** lev)
        psi_c, _, it_c, _ = _gd_loop_local(
            ident_c + disp, tg_c, tn_c, tn_src_c, taps, alpha, w_reg,
            coarse_its, thresh_c, z0_c, axis, K, momentum=momentum,
        )
        total_coarse = total_coarse + it_c
        up = pyr[lev - 1][0].shape[-3:]
        disp = _upsample2_disp_local(psi_c - ident_c, up)
    return ident_l0 + disp, total_coarse


def _upsample2_disp_local(disp: jnp.ndarray, dims_zyx) -> jnp.ndarray:
    """Trilinearly upsample a local displacement block 2x, doubling the
    displacement VALUES (voxel-unit change). Per-shard resize: the z seam
    between shards is approximated by edge extension — warm-start quality
    only (the fine level converges to the same fixed point)."""
    out = jax.image.resize(disp, disp.shape[:-3] + tuple(dims_zyx),
                           method="trilinear")
    return out * jnp.float32(2.0)


def make_sharded_estimate_psi(mesh: Mesh, inverse_iters: int = 48,
                              warp_window=None, fused: bool = False,
                              taps_static=None, momentum=None,
                              warm_inverse: bool = False,
                              pyramid_levels: int = 1,
                              coarse_max_iter=None,
                              fine_window=None,
                              stall_window: int = 0,
                              stall_rel: float = 1e-3,
                              fold_xmats: bool = False):
    """Build a jit-compiled sharded solve for the given mesh.

    Returns fn(psi, tsdf_global, weight_global, tsdf_n, weight_n, taps,
    alpha, w_reg, max_iter, thresh[, psi_inv0]) -> (psi, psi_inv, tnp, wnp,
    tgi, wgi, iters, max_norm). Arrays are full-sized; jit lays them out
    sharded.

    fused: run each per-shard iteration as the fused Pallas kernel
    (requires warp_window and taps_static; lane extent >= 128 on real
    TPUs — interpret mode is used automatically on CPU meshes).

    momentum: heavy-ball coefficient (production acceleration; velocity is
    shard-local, no extra collectives). warm_inverse: the returned fn takes
    an extra trailing psi_inv0 argument that warm-starts the inverse fixed
    point (pair with a reduced inverse_iters). pyramid_levels > 1 runs
    coarse-to-fine: 2x-downsampled LOCAL blocks first (halo exchange works
    identically at every level), displacement upsampled per shard as the
    next level's warm start — the multi-chip mirror of
    :func:`sobfu_tpu.solver.estimate_psi_pyramid`.

    fine_window: run the FINE level compositively with this (smaller)
    increment window — the multi-chip mirror of the single-chip production
    fine level (solver.estimate_psi_pyramid fine_window): T0 = live warped
    by the coarse psi0 ONCE (window ``warp_window``), the loop solves for
    the bounded increment at ``fine_window`` halos, and the composed total
    field psi0 o (id + delta) needs only one more fine_window halo
    exchange of psi0's displacement. Requires warp_window (the total
    bound). stall_window/stall_rel: data-energy stall stop on the fine
    level (see :func:`_gd_loop_local`).
    """
    axis = "z"
    if fused:
        assert warp_window is not None and taps_static is not None
    if fine_window is not None:
        assert warp_window is not None, "fine_window requires warp_window"
    interp = jax.devices()[0].platform == "cpu"

    def local_solve(psi_l, tg_l, wg_l, tn_l, wn_l, taps, alpha, w_reg,
                    max_iter, thresh, psi_inv0_l=None):
        n_local = psi_l.shape[-3]
        z0 = jax.lax.axis_index(axis) * n_local
        K = warp_window

        # warp source for the live volume: one all-gather (exact-gather
        # mode) or one K-halo exchange (windowed mode — per-device memory
        # stays at block + halo, never the full volume); it is read-only
        # during the solve so either happens ONCE per solve.
        if K is None:
            tn_src = jax.lax.all_gather(tn_l, axis, axis=0, tiled=True)
        else:
            tn_src = _halo_exchange_z(tn_l, K, axis)

        total_coarse = jnp.int32(0)
        if pyramid_levels > 1 and K is not None:
            c_its = jnp.int32(
                coarse_max_iter if coarse_max_iter is not None else max_iter
            )
            psi_l, total_coarse = _pyramid_warmstart_local(
                psi_l, tg_l, tn_l, taps, alpha, w_reg, thresh, z0, axis, K,
                pyramid_levels, c_its, momentum,
            )

        if fine_window is not None:
            # compositive fine level: T0 once at the total window, the
            # increment loop at the (cheaper) fine_window halos
            ident_l = fields.identity_field(
                psi_l.shape[-3:], psi_l.dtype
            ).at[2].add(z0.astype(psi_l.dtype))
            t0_l = _sample_window_local(tn_src, psi_l, z0, K)
            t0_src = _halo_exchange_z(t0_l, fine_window, axis)
            g_l, tnp_l, iters, mnorm = _gd_loop_local(
                ident_l, tg_l, t0_l, t0_src, taps, alpha, w_reg, max_iter,
                thresh, z0, axis, fine_window, fused=fused,
                taps_static=taps_static, momentum=momentum, interpret=interp,
                stall_window=stall_window, stall_rel=stall_rel,
                fold_xmats=fold_xmats,
            )
            # compose: psi_new = psi0 o g, |g - id| <= fine_window. Sample
            # the ABSOLUTE psi0 field (exactly the single-chip composition,
            # solver.py estimate_psi_compositive total_window tail — the
            # samplers' edge clamp then matches at the global boundary).
            psi0_e = _halo_exchange_z(psi_l, fine_window, axis)
            psi_l = _sample_window_local(psi0_e, g_l, z0, fine_window)
        else:
            psi_l, tnp_l, iters, mnorm = _gd_loop_local(
                psi_l, tg_l, tn_l, tn_src, taps, alpha, w_reg, max_iter,
                thresh, z0, axis, K, fused=fused, taps_static=taps_static,
                momentum=momentum, interpret=interp,
                stall_window=stall_window, stall_rel=stall_rel,
                fold_xmats=fold_xmats,
            )
        iters = iters + total_coarse

        ident_l = fields.identity_field(
            (n_local,) + psi_l.shape[-2:], psi_l.dtype
        ).at[2].add(z0.astype(psi_l.dtype))
        inv_init = ident_l if psi_inv0_l is None else psi_inv0_l

        if K is None:
            # inverse field: needs the full displacement field for its gathers
            psi_full = jax.lax.all_gather(psi_l, axis, axis=1, tiled=True)
            ident_full = fields.identity_field(
                psi_full.shape[1:], psi_full.dtype
            )
            disp_full = psi_full - ident_full

            def inv_body(_, inv_l):
                return ident_l - fields.sample_field_trilinear(disp_full, inv_l)

            psi_inv_l = jax.lax.fori_loop(0, inverse_iters, inv_body, inv_init)

            # warp the global volume by psi_inv (needs full phi_global)
            tg_full = jax.lax.all_gather(tg_l, axis, axis=0, tiled=True)
            wg_full = jax.lax.all_gather(wg_l, axis, axis=0, tiled=True)
            tgi_l = fields.sample_trilinear(tg_full, psi_inv_l)
            wgi_l = fields.sample_nearest_floor(wg_full, psi_inv_l)

            wn_full = jax.lax.all_gather(wn_l, axis, axis=0, tiled=True)
            wnp_l = fields.sample_nearest_floor(wn_full, psi_l)
        else:
            # windowed inverse: psi_inv stays within K of the identity, so a
            # single K-halo exchange of the (fixed) displacement field feeds
            # every fixed-point step — no full-field materialisation.
            disp_e = _halo_exchange_z(psi_l - ident_l, K, axis)

            def inv_body(_, inv_l):
                return ident_l - _sample_window_local(disp_e, inv_l, z0, K)

            psi_inv_l = jax.lax.fori_loop(0, inverse_iters, inv_body, inv_init)

            tg_e = _halo_exchange_z(tg_l, K, axis)
            wg_e = _halo_exchange_z(wg_l, K, axis)
            wn_e = _halo_exchange_z(wn_l, K, axis)
            tgi_l = _sample_window_local(tg_e, psi_inv_l, z0, K)
            wgi_l = _sample_window_local(wg_e, psi_inv_l, z0, K, floor=True)
            wnp_l = _sample_window_local(wn_e, psi_l, z0, K, floor=True)

        return psi_l, psi_inv_l, tnp_l, wnp_l, tgi_l, wgi_l, iters, mnorm

    from jax import shard_map

    in_specs = [
        P(None, "z"), P("z"), P("z"), P("z"), P("z"),
        P(), P(), P(), P(), P(),
    ]
    if warm_inverse:
        in_specs.append(P(None, "z"))
    mapped = shard_map(
        local_solve,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(
            P(None, "z"), P(None, "z"), P("z"), P("z"), P("z"), P("z"),
            P(), P(),
        ),
        check_vma=False,
    )
    return jax.jit(mapped)


def estimate_psi_sharded(mesh: Mesh, psi, tsdf_global, weight_global, tsdf_n,
                         weight_n, taps, alpha, w_reg, max_iter, thresh,
                         inverse_iters: int = 48):
    """Convenience wrapper: build + run the sharded solve."""
    fn = make_sharded_estimate_psi(mesh, inverse_iters)
    return fn(
        psi, tsdf_global, weight_global, tsdf_n, weight_n,
        jnp.asarray(taps), jnp.float32(alpha), jnp.float32(w_reg),
        jnp.int32(max_iter), jnp.float32(thresh),
    )


# ---------------------------------------------------------------------------
# full sharded training/fusion step (scene-batched + z-sharded)
# ---------------------------------------------------------------------------


def make_frame_step(mesh: Mesh, dims_zyx: Tuple[int, int, int],
                    inverse_iters: int = 8, warp_window=None,
                    fused: bool = False, taps_static=None, momentum=None,
                    warm_inverse: bool = False, pyramid_levels: int = 1,
                    coarse_max_iter=None, fine_window=None,
                    stall_window: int = 0, stall_rel: float = 1e-3,
                    fold_xmats: bool = False, axis_aligned: bool = False):
    """One full frame step (integrate -> solve -> fuse) over a
    ('scene', 'z') mesh: scenes are data-parallel, the grid is z-sharded.

    shard_map is outermost; scenes within a shard are handled by an inner
    vmap. Returns (jitted step fn, sharding dict). Step signature:
      step(psi_b, tg_b, wg_b, dists_b, vol2cam_b, intr, voxel_sizes,
           trunc, eta, max_weight, taps, alpha, w_reg, max_iter, thresh
           [, psi_inv0_b])
      -> (psi_b, psi_inv_b, tg_b, wg_b, iters_b, mnorm_b)
    with psi_b f32[S,3,Z,Y,X], volumes f32[S,Z,Y,X], dists f32[S,H,W].

    Production options mirror the single-chip solve: fused (per-shard fused
    Pallas iterations; needs warp_window + taps_static), momentum
    (heavy-ball, shard-local velocity), warm_inverse (extra trailing
    psi_inv0_b operand warm-starting the inverse fixed point — pair with a
    reduced inverse_iters), pyramid_levels/coarse_max_iter (coarse-to-fine
    warm start on local blocks), fine_window (compositive fine level) and
    stall_window/stall_rel (data-energy stall stop) — the full round-3
    single-chip production configuration, multi-chip.
    """
    from jax import shard_map
    from sobfu_tpu.tsdf import integrate_dists, fuse_volumes

    axis = "z"
    Z = dims_zyx[0]
    n_z = mesh.shape[axis]
    local_dims = (Z // n_z, dims_zyx[1], dims_zyx[2])
    assert local_dims[0] >= 4, (
        f"local z-block {local_dims[0]} smaller than the halo radius 4; "
        f"use fewer z-shards for a {Z}-deep grid"
    )
    if pyramid_levels > 1:
        assert local_dims[0] // 2 ** (pyramid_levels - 1) >= 4, (
            f"coarsest local z-block "
            f"{local_dims[0] // 2 ** (pyramid_levels - 1)} smaller than the "
            f"halo radius 4; use fewer pyramid levels or z-shards"
        )
    if fused:
        assert warp_window is not None and taps_static is not None
    if fine_window is not None:
        assert warp_window is not None, "fine_window requires warp_window"
    interp = jax.devices()[0].platform == "cpu"

    def per_scene(psi_l, tg_l, wg_l, dists, vol2cam, psi_inv0_l, intr,
                  voxel_sizes, trunc, eta, max_weight, taps, alpha, w_reg,
                  max_iter, thresh):
        z0 = jax.lax.axis_index(axis) * local_dims[0]
        # axis_aligned: caller certifies every scene's vol2cam is
        # rotation-free -> separable MXU projection (z_offset-aware; the
        # one-hot contractions are shard-local, no collectives)
        tn_l, wn_l = integrate_dists(
            jnp.zeros_like(tg_l), jnp.zeros_like(wg_l), dists, vol2cam, intr,
            voxel_sizes, trunc, eta, local_dims, z0,
            axis_aligned=axis_aligned,
        )
        K = warp_window

        if K is None:
            tn_src = jax.lax.all_gather(tn_l, axis, axis=0, tiled=True)
        else:
            tn_src = _halo_exchange_z(tn_l, K, axis)

        total_coarse = jnp.int32(0)
        if pyramid_levels > 1 and K is not None:
            c_its = jnp.int32(
                coarse_max_iter if coarse_max_iter is not None else max_iter
            )
            psi_l, total_coarse = _pyramid_warmstart_local(
                psi_l, tg_l, tn_l, taps, alpha, w_reg, thresh, z0, axis, K,
                pyramid_levels, c_its, momentum,
            )

        if fine_window is not None:
            ident_f = fields.identity_field(
                psi_l.shape[-3:], psi_l.dtype
            ).at[2].add(z0.astype(psi_l.dtype))
            t0_l = _sample_window_local(tn_src, psi_l, z0, K)
            t0_src = _halo_exchange_z(t0_l, fine_window, axis)
            g_l, tnp_l, iters, mnorm = _gd_loop_local(
                ident_f, tg_l, t0_l, t0_src, taps, alpha, w_reg, max_iter,
                thresh, z0, axis, fine_window, fused=fused,
                taps_static=taps_static, momentum=momentum, interpret=interp,
                stall_window=stall_window, stall_rel=stall_rel,
                fold_xmats=fold_xmats,
            )
            psi0_e = _halo_exchange_z(psi_l, fine_window, axis)
            psi_l = _sample_window_local(psi0_e, g_l, z0, fine_window)
        else:
            psi_l, tnp_l, iters, mnorm = _gd_loop_local(
                psi_l, tg_l, tn_l, tn_src, taps, alpha, w_reg, max_iter,
                thresh, z0, axis, K, fused=fused, taps_static=taps_static,
                momentum=momentum, interpret=interp,
                stall_window=stall_window, stall_rel=stall_rel,
                fold_xmats=fold_xmats,
            )
        iters = iters + total_coarse

        ident_l = fields.identity_field(
            (local_dims[0],) + psi_l.shape[-2:], psi_l.dtype
        ).at[2].add(z0.astype(psi_l.dtype))
        inv_init = ident_l if psi_inv0_l is None else psi_inv0_l

        if K is None:
            psi_full = jax.lax.all_gather(psi_l, axis, axis=1, tiled=True)
            ident_full = fields.identity_field(
                psi_full.shape[1:], psi_full.dtype
            )
            disp_full = psi_full - ident_full

            def inv_body(_, inv_l):
                return ident_l - fields.sample_field_trilinear(disp_full, inv_l)

            psi_inv_l = jax.lax.fori_loop(0, inverse_iters, inv_body, inv_init)

            wn_full = jax.lax.all_gather(wn_l, axis, axis=0, tiled=True)
            wnp_l = fields.sample_nearest_floor(wn_full, psi_l)
        else:
            disp_e = _halo_exchange_z(psi_l - ident_l, K, axis)

            def inv_body(_, inv_l):
                return ident_l - _sample_window_local(disp_e, inv_l, z0, K)

            psi_inv_l = jax.lax.fori_loop(0, inverse_iters, inv_body, inv_init)

            wn_e = _halo_exchange_z(wn_l, K, axis)
            wnp_l = _sample_window_local(wn_e, psi_l, z0, K, floor=True)

        tg2_l, wg2_l = fuse_volumes(tg_l, wg_l, tnp_l, wnp_l, max_weight)
        return psi_l, psi_inv_l, tg2_l, wg2_l, iters, mnorm

    def local_step(psi_b, tg_b, wg_b, dists_b, vol2cam_b, *rest):
        if warm_inverse:
            psi_inv0_b = rest[-1]
            rest = rest[:-1]
        else:
            psi_inv0_b = None
        return jax.vmap(
            per_scene,
            in_axes=(0, 0, 0, 0, 0, 0 if warm_inverse else None)
            + (None,) * 10,
        )(psi_b, tg_b, wg_b, dists_b, vol2cam_b, psi_inv0_b, *rest)

    in_specs = [
        P("scene", None, "z"), P("scene", "z"), P("scene", "z"),
        P("scene"), P("scene"),
        P(), P(), P(), P(), P(), P(), P(), P(), P(), P(),
    ]
    if warm_inverse:
        in_specs.append(P("scene", None, "z"))
    mapped = shard_map(
        local_step,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(
            P("scene", None, "z"), P("scene", None, "z"),
            P("scene", "z"), P("scene", "z"), P("scene"), P("scene"),
        ),
        check_vma=False,
    )

    shardings = {
        "psi": NamedSharding(mesh, P("scene", None, "z")),
        "vol": NamedSharding(mesh, P("scene", "z")),
        "img": NamedSharding(mesh, P("scene")),
    }
    return jax.jit(mapped), shardings
