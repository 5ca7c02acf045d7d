"""Pallas TPU kernels for the solver hot loop.

The reference executes ~10 CUDA kernel launches per gradient-descent
iteration, each streaming the full voxel grid through HBM
(src/sobfu/cuda/solver.cu:114-193). Pure-XLA fusion already collapses the
elementwise chains, but the intermediate fields (gradient, Laplacian,
potential gradient, three convolution passes, warp) still cost multiple
HBM round-trips per iteration.

:func:`fused_gd_step` is ONE Pallas kernel that performs an entire solver
iteration per (z, y)-tile while everything lives in VMEM:

    grad   = central-difference gradient of tnp        (vector_fields.cu:157-208)
    lap    = negated 6-neighbour Laplacian of psi      (vector_fields.cu:291-337)
    dU     = (tnp - tg) * grad + w_reg * lap           (solver.cu:15-47)
    dU_S   = conv_x(dU) + conv_y(dU) + conv_z(dU)      (solver.cu:237-459)
    psi'   = psi - alpha * dU_S                        (solver.cu:53-68)
    tnp'   = trilinear warp of the live tsdf at psi'   (vector_fields.cu:81-100)
    norm2  = per-tile max of ||alpha * dU_S||^2        (reductor.cu:342-455)

HBM traffic per iteration is exactly: read psi(3) + tnp(1) + tg(1) +
live(1), write psi'(3) + tnp'(1) — 10 volume passes, the information-
theoretic minimum for this update, vs ~30+ for the unfused op chain.

The warp uses the bounded-window formulation (see
``fields.sample_trilinear_window``): a sum of static shifts weighted by
per-axis hat functions, exact while each displacement component stays
within ``K`` voxels (window saturates beyond). TPUs have no gather texture
hardware — this turns the reference's texture fetches into pure VPU FMAs.

Halo handling: inputs are edge-padded in z and y OUTSIDE the kernel (an
XLA pad is one cheap copy), so tile loads are static-size dynamic-start
DMAs and all z/y shifts become static slices of VMEM scratch. The x axis
(lanes) is kept whole in every tile; x shifts are roll + edge fix-up.
Stencil zero-at-boundary rules are enforced with global-index masks,
matching the reference differentiators exactly.

Mosaic safety rules this kernel observes (the round-1 version crashed the
TPU worker; root-caused to unaligned sublane accesses):
  * every scratch buffer's sublane dimension (second-to-last) is a
    multiple of 8 — the live-volume halo is fixed at _H (not K+1), making
    its scratch the same aligned shape as the others;
  * every DMA slice has sublane-aligned start AND size;
  * NO dynamic slicing on the sublane dimension: the warp loop runs a
    fori_loop over the z offset only (dynamic starts on the MAJOR dim are
    fine) with the y offset statically unrolled;
  * reduction outputs use (8, 128)-shaped blocks, never (1, 128).

Lane-width rules (established by minimal probes on this pool, 2026-08-17):
below 128 lanes, BOTH manual DMA slicing AND static-start pl.ds ref
slices (including through .at[] views) fail the Mosaic compiler, while
full-tile value loads ([...]) and DYNAMIC-start pl.ds getitems on the
major dim compile fine. Whole-volume grid=() bodies also fail for
>= 32^3 (fully-unrolled vreg count). Hence: the shared tile body
(_gd_tile_compute) loads tiles as values and slices statically, keeping
only the dynamic-z live-volume getitem as a ref access; the sub-128-lane
entry point is the BlockSpec-stacked fused_gd_iteration_stacked.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# fixed halo for the derivative+convolution reads: stencil radius 1 +
# max supported convolution radius 3 (tap count <= 7)
_H = 4


def _shift_x_edge(a: jnp.ndarray, o: int, X: int) -> jnp.ndarray:
    """a[..., x + o] with edge clamping along the lane axis."""
    if o == 0:
        return a
    rolled = pltpu.roll(a, (-o) % a.shape[-1], axis=a.ndim - 1)
    xx = jax.lax.broadcasted_iota(jnp.int32, a.shape, a.ndim - 1)
    if o > 0:
        edge = jax.lax.slice_in_dim(a, X - 1, X, axis=a.ndim - 1)
        return jnp.where(xx >= X - o, edge, rolled)
    edge = jax.lax.slice_in_dim(a, 0, 1, axis=a.ndim - 1)
    return jnp.where(xx < -o, edge, rolled)


# ---------------------------------------------------------------------------
# Y-FOLDED layout helpers (true 128-lane packing for X=64 grids)
#
# A (Z, Y, X=64) volume reshaped to (Z, Y//2, 128) puts y-PAIRS side by
# side in the lane dim (the reshape is free: y-major rows are already
# contiguous). Lane l holds (y = 2*row + l//64, x = l % 64). Unlike the
# edge-padding lane packer (x_pad_to), NO lanes are dead — the VPU-bound
# fused body runs at full width, ~2x the padded variant at 64^3.
# ---------------------------------------------------------------------------


def _shift_x_fold(a: jnp.ndarray, o: int, X: int) -> jnp.ndarray:
    """a[..., seg, x + o] per lane segment with per-segment edge clamping
    (folded layout: 128 lanes = 2 segments of X=64)."""
    if o == 0:
        return a
    L = a.shape[-1]
    rolled = pltpu.roll(a, (-o) % L, axis=a.ndim - 1)
    lx = jax.lax.broadcasted_iota(jnp.int32, a.shape, a.ndim - 1)
    seg_hi = lx >= X
    xx = lx % X
    if o > 0:
        e0 = jax.lax.slice_in_dim(a, X - 1, X, axis=a.ndim - 1)
        e1 = jax.lax.slice_in_dim(a, 2 * X - 1, 2 * X, axis=a.ndim - 1)
        edge = jnp.where(seg_hi, e1, e0)
        return jnp.where(xx >= X - o, edge, rolled)
    e0 = jax.lax.slice_in_dim(a, 0, 1, axis=a.ndim - 1)
    e1 = jax.lax.slice_in_dim(a, X, X + 1, axis=a.ndim - 1)
    edge = jnp.where(seg_hi, e1, e0)
    return jnp.where(xx < -o, edge, rolled)


def _swap_segments(a: jnp.ndarray) -> jnp.ndarray:
    """Swap the two 64-lane segments (roll by 64 on 128 lanes)."""
    return pltpu.roll(a, a.shape[-1] // 2, axis=a.ndim - 1)


def _shift_y_fold(t: jnp.ndarray, o: int, Hf: int, TYf: int) -> jnp.ndarray:
    """Center TYf folded rows shifted by o in REAL y, from a tile with Hf
    folded halo rows on each side of the second-to-last axis.

    Real y = 2*row + seg. y+o lands in segment (seg+o)&1 at folded-row
    offset (seg+o)>>1 (floor): even o is a pure sublane slice; odd o
    combines two slices with the segments swapped (a 64-lane roll)."""
    nd = t.ndim
    def rows(d):
        return jax.lax.slice_in_dim(t, Hf + d, Hf + d + TYf, axis=nd - 2)
    d0 = o >> 1          # offset for output segment 0 (floor division)
    d1 = (1 + o) >> 1    # offset for output segment 1
    if o % 2 == 0:
        return rows(d0)
    sw0 = _swap_segments(rows(d0))  # its seg0 lanes = input seg1 rows(d0)
    sw1 = _swap_segments(rows(d1))  # its seg1 lanes = input seg0 rows(d1)
    lane = jax.lax.broadcasted_iota(jnp.int32, sw0.shape, nd - 1)
    return jnp.where(lane < t.shape[-1] // 2, sw0, sw1)


def fold_y(vol: jnp.ndarray) -> jnp.ndarray:
    """(..., Z, Y, X) -> (..., Z, Y//2, 2X) folded view (free reshape)."""
    *lead, Z, Y, X = vol.shape
    return vol.reshape(*lead, Z, Y // 2, 2 * X)


def unfold_y(vol: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`fold_y`."""
    *lead, Z, Yf, XF = vol.shape
    return vol.reshape(*lead, Z, Yf * 2, XF // 2)


def _yclamp_row_fold(row: jnp.ndarray, lo: bool) -> jnp.ndarray:
    """Given the first (lo) or last folded row, build the halo row that
    represents y-clamped positions: both segments replicate the EDGE y
    (segment 0 of the first row / segment 1 of the last row). Host-side
    helper (pltpu.roll has no evaluation rule outside a kernel)."""
    X = row.shape[-1] // 2
    if lo:  # y < 0 clamps to y=0 = segment 0 of the first row
        seg = jax.lax.slice_in_dim(row, 0, X, axis=row.ndim - 1)
    else:  # y >= Y clamps to the last y = segment 1 of the last row
        seg = jax.lax.slice_in_dim(row, X, 2 * X, axis=row.ndim - 1)
    return jnp.concatenate([seg, seg], axis=row.ndim - 1)


# folded-y halo rows for the fused fold kernel: the body's largest real-y
# reach is the conv radius 3 + 1 (stencils at the extended dU rows) = 5,
# and _shift_y_fold(o) reads folded offsets in [o>>1, (1+o)>>1] — |o| <= 5
# needs 3 rows each side
_HF = 3


def pad_folded(f: jnp.ndarray, H: int = _H, HF: int = _HF) -> jnp.ndarray:
    """Edge-pad an already-FOLDED (..., Z, Yf, 2X) volume: z halos
    replicate the edge z-rows (folding does not touch z); folded-y halos
    hold the y-CLAMPED rows (both segments = the edge y — plain row
    replication would replicate the edge PAIR, off by one for odd y
    offsets). The lane dim needs no padding (x clamping is segment-local
    in-kernel)."""
    nd = f.ndim
    zpad = [(0, 0)] * (nd - 3) + [(H, H), (0, 0), (0, 0)]
    f = jnp.pad(f, zpad, mode="edge")
    first = jax.lax.slice_in_dim(f, 0, 1, axis=nd - 2)
    last = jax.lax.slice_in_dim(
        f, f.shape[nd - 2] - 1, f.shape[nd - 2], axis=nd - 2
    )
    lo = jnp.broadcast_to(
        _yclamp_row_fold(first, True),
        first.shape[: nd - 2] + (HF,) + first.shape[nd - 1:],
    )
    hi = jnp.broadcast_to(
        _yclamp_row_fold(last, False),
        last.shape[: nd - 2] + (HF,) + last.shape[nd - 1:],
    )
    return jnp.concatenate([lo, f, hi], axis=nd - 2)


def pad_for_fold(vol: jnp.ndarray, H: int = _H, HF: int = _HF) -> jnp.ndarray:
    """Fold a (..., Z, Y, X) volume and edge-pad (see :func:`pad_folded`)."""
    return pad_folded(fold_y(vol), H, HF)


# ---------------------------------------------------------------------------
# warp-only kernel (the production hot path)
# ---------------------------------------------------------------------------
#
# Profiling the fused kernel above shows its manual DMA start/wait pattern
# serialises transfer latency with compute (no double buffering): 128 tiles
# x ~13 us >> the useful work. The warp, however, is the only part of the
# GD iteration XLA handles badly (it re-reads the padded live volume from
# HBM for every shifted term); the stencils + MXU banded-matmul convolution
# are already near-roofline in XLA. So the production configuration is:
# XLA stencils + MXU convs + THIS kernel for the warp, which uses the
# standard BlockSpec pipeline (automatic double buffering, no manual DMA):
#
#   * psi needs no halo -> plain block partition of the coordinate field;
#   * the live volume is pre-stacked into OVERLAPPING z-tiles of height
#     BZ + 2K OUTSIDE the kernel. The stack is loop-invariant (the live
#     tsdf is constant during a solve), so XLA hoists it out of the
#     while_loop: its build cost is paid once per solve, not per iteration;
#   * inside the kernel all y/x shifts are static slices / lane rolls and
#     the z offset runs in a fori_loop with a dynamic start on the MAJOR
#     dim only (the Mosaic-safe pattern established above).


def _make_warp_kernel(BZ, TY, Y, X, K, Zg, floor, sub_ident=False,
                      mixed=False):
    """Bounded-window warp kernel body: one (z, y)-tile of ONE channel.

    Channels ride the grid (tile-major, channel-minor) rather than an
    in-kernel loop: Mosaic stack-allocates every value of an unrolled
    channel loop, and the C=3 variant at 128^3 overflowed the 16 MB
    scoped-vmem budget (measured: 17.06M). The psi block's index map
    ignores the channel coordinate, so the pipeline re-uses it across
    the C consecutive steps of each tile. y is tiled as well (TY) — the
    whole-Y variant blows scoped vmem past 128 rows at X=256.
    """

    def kernel(vol_ref, psi_ref, out_ref):
        # vol_ref: f32[1, 1, 1, BZ+2K, TY+2K, X] overlapping tile (edge-padded)
        # psi_ref: f32[3, BZ, TY, X] absolute coords; out: f32[1, BZ, TY, X]
        iz = pl.program_id(0)
        iy = pl.program_id(1)
        z0 = iz * BZ
        y0 = iy * TY
        shape_o = (BZ, TY, X)
        vx = jax.lax.broadcasted_iota(jnp.int32, shape_o, 2).astype(jnp.float32)
        vy = (
            jax.lax.broadcasted_iota(jnp.int32, shape_o, 1) + y0
        ).astype(jnp.float32)
        vz = (
            jax.lax.broadcasted_iota(jnp.int32, shape_o, 0) + z0
        ).astype(jnp.float32)

        cx = jnp.clip(psi_ref[0], 0.0, X - 1)
        cy = jnp.clip(psi_ref[1], 0.0, Y - 1)
        cz = jnp.clip(psi_ref[2], 0.0, Zg - 1)
        if mixed:
            # channel-dependent mode (channel rides the grid): c==0
            # trilinear, c==1 floor — one pipeline pass warps the tail's
            # tsdf (trilinear) AND weight (floor) at the same psi_inv,
            # sharing the psi DMA and the per-axis weight temps
            isf = pl.program_id(2) == 1
            cx = jnp.where(isf, jnp.floor(cx), cx)
            cy = jnp.where(isf, jnp.floor(cy), cy)
            cz = jnp.where(isf, jnp.floor(cz), cz)
            hi = jnp.where(isf, jnp.float32(K), jnp.float32(K - 1e-4))
            wfn = lambda d, o: jnp.where(
                isf,
                (d == o).astype(jnp.float32),
                jnp.maximum(0.0, 1.0 - jnp.abs(d - o)),
            )
        elif floor:
            cx, cy, cz = jnp.floor(cx), jnp.floor(cy), jnp.floor(cz)
            hi = K
            wfn = lambda d, o: (d == o).astype(jnp.float32)
        else:
            hi = K - 1e-4
            wfn = lambda d, o: jnp.maximum(0.0, 1.0 - jnp.abs(d - o))
        dx = jnp.clip(cx - vx, -K, hi)
        dy = jnp.clip(cy - vy, -K, hi)
        dz = jnp.clip(cz - vz, -K, hi)

        # per-axis weights precomputed ONCE per tile (tile-sized VMEM temps;
        # halves the op count vs recomputing the hat inside the triple loop —
        # the trade XLA could not make at 256^3 for HBM reasons is free here)
        wxs = [wfn(dx, ox) for ox in range(-K, K + 1)]
        wys = [wfn(dy, oy) for oy in range(-K, K + 1)]

        def warp_body(i, acc):
            # z offset via fori_loop (values are reused across iterations
            # — full unrolling stack-OOMs Mosaic); dynamic start on the
            # MAJOR dim only. The 2K+1 lane shifts are hoisted per z-row
            # block so the (oy, ox) body is a pure static-slice FMA:
            # (2K+1)^2 rolls total instead of (2K+1)^3.
            oz = i - K
            lz = vol_ref[0, 0, 0, pl.ds(K + oz, BZ), :, :]
            lxz = [_shift_x_edge(lz, ox, X) for ox in range(-K, K + 1)]
            acc_y = jnp.zeros(shape_o, jnp.float32)
            for oy in range(-K, K + 1):
                acc_x = jnp.zeros(shape_o, jnp.float32)
                for ox in range(-K, K + 1):
                    lzy = lxz[ox + K][:, K + oy : K + oy + TY, :]
                    acc_x = acc_x + wxs[ox + K] * lzy
                acc_y = acc_y + wys[oy + K] * acc_x
            ozf = oz.astype(jnp.float32)
            if mixed:
                # reuse the hoisted isf: re-binding pl.program_id inside
                # the fori_loop body fails interpret-mode lowering
                wz = jnp.where(
                    isf,
                    (dz == ozf).astype(jnp.float32),
                    jnp.maximum(0.0, 1.0 - jnp.abs(dz - ozf)),
                )
            elif floor:
                wz = (dz == ozf).astype(jnp.float32)
            else:
                wz = jnp.maximum(0.0, 1.0 - jnp.abs(dz - oz))
            return acc + wz * acc_y

        acc = jax.lax.fori_loop(
            0, 2 * K + 1, warp_body, jnp.zeros(shape_o, jnp.float32)
        )
        if sub_ident:
            # inverse fixed-point step fused in: out = ident_c - warp
            # (channel rides the grid; ident channel order is [x, y, z])
            c = pl.program_id(2)
            ident_c = jnp.where(
                c == 0, vx, jnp.where(c == 1, vy, vz)
            )
            acc = ident_c - acc
        out_ref[0] = acc

    return kernel


def _stack_overlapping_zy(vol_pad, nz, ny, BZ, TY, K):
    """(C, Z+2K, Y+2K, X) padded volume -> (nz, ny, C, BZ+2K, TY+2K, X)
    overlapping tiles (one pipeline block per (z, y, channel) tile)."""
    zax = vol_pad.ndim - 3
    ztiles = [
        jax.lax.slice_in_dim(vol_pad, i * BZ, i * BZ + BZ + 2 * K, axis=zax)
        for i in range(nz)
    ]
    tiles = [
        jnp.stack(
            [
                jax.lax.slice_in_dim(zt, j * TY, j * TY + TY + 2 * K,
                                     axis=zax + 1)
                for j in range(ny)
            ],
            axis=0,
        )
        for zt in ztiles
    ]
    return jnp.stack(tiles, axis=0)


def _warp_tiling(Z, Y, X, K, BZ=0, TY=0):
    """Resolve the (BZ, TY) tile geometry for the window-warp kernel.

    TY=0 picks the default y-tile sized to Mosaic's 16 MB scoped-vmem
    budget: the kernel body keeps ~2(2K+1)+4 tile-sized temps live
    (wxs/wys across the z fori_loop, lxz + accumulators inside), so the
    safe tile area TY*X shrinks as K grows. Calibrated to the measured
    K=2 points (whole-Y at 128^3 compiles; TY=64 at X=256; TY=32 at
    X=512; one step larger fails), e.g. K=4 at 128^3 -> TY=64.
    """
    if BZ == 0:
        # deep z-tiles cut the overlapping-stack read amplification
        # ((BZ+2K)/BZ): 1.5 at BZ=8 -> 1.125 at BZ=32. The raised Mosaic
        # vmem budget makes the bigger scratch legal.
        BZ = 32
        while Z % BZ:
            BZ //= 2
    if TY == 0:
        units = 2 * (2 * K + 1) + 4
        # calibrated at BZ=8 (K=2 whole-Y tile at X=128 compiles); the
        # footprint scales with BZ, so the budget carries a BZ=8 factor
        budget = 8 * 128 * 128 * 14
        TY = Y
        while TY > 8 and BZ * TY * X * units > budget:
            TY //= 2
        while Y % TY:
            TY //= 2
    assert Z % BZ == 0 and Y % TY == 0, (Z, BZ, Y, TY)
    return BZ, TY


def prestack_warp_vol(vol: jnp.ndarray, K: int, BZ: int, TY: int):
    """Edge-pad and stack a (C, Z, Y, X) volume into the overlapping
    (nz, ny, C, BZ+2K, TY+2K, X) tiles :func:`_window_warp_stacked`
    consumes. Hoist this out of any loop whose warped volume is
    loop-invariant (the solver while_loop does so automatically; host-
    level fixed points like the inverse must do it by hand)."""
    C, Z, Y, X = vol.shape
    vol_pad = jnp.pad(vol, [(0, 0), (K, K), (K, K), (0, 0)], mode="edge")
    return _stack_overlapping_zy(vol_pad, Z // BZ, Y // TY, BZ, TY, K)


@functools.partial(
    jax.jit,
    static_argnames=(
        "K", "BZ", "TY", "floor", "interpret", "sub_ident", "mixed"
    ),
)
def _window_warp_stacked(
    vol_t: jnp.ndarray,  # (nz, ny, C, BZ+2K, TY+2K, X) from prestack_warp_vol
    psi: jnp.ndarray,  # f32[3, Z, Y, X] absolute coords (voxel units)
    K: int,
    BZ: int,
    TY: int,
    floor: bool = False,
    interpret: bool = False,
    sub_ident: bool = False,
    mixed: bool = False,
) -> jnp.ndarray:
    """Pipelined window-warp over pre-stacked tiles; see
    :func:`window_warp_pallas`. sub_ident=True returns ``ident - warp``
    (the inverse fixed-point step) fused into the kernel epilogue.
    mixed=True (C must be 2): channel 0 sampled trilinearly, channel 1
    with the floor-corner rule — the tail's tsdf+weight pair warped at
    one psi in a single pipeline pass."""
    nz, ny, C = vol_t.shape[:3]
    _, Z, Y, X = psi.shape

    # auto-size the scoped-vmem budget to the actual footprint (pipeline
    # double buffers the three blocks; the body keeps ~2(2K+1)+4
    # tile-sized temps + the 2K+1 hoisted lane shifts live)
    tile_f = (
        2 * (BZ + 2 * K) * (TY + 2 * K) * X
        + 2 * 3 * BZ * TY * X
        + 2 * BZ * TY * X
        + (2 * (2 * K + 1) + 4) * BZ * TY * X
        + (2 * K + 1) * BZ * (TY + 2 * K) * X
    )
    vmem_mb = min(120, max(32, (4 * tile_f >> 20) + 8))
    cparams = (
        {"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb << 20)}
        if not interpret
        else {}
    )

    return pl.pallas_call(
        _make_warp_kernel(BZ, TY, Y, X, K, Z, floor, sub_ident, mixed),
        grid=(nz, ny, C),  # channel-minor: psi block re-used across channels
        in_specs=[
            pl.BlockSpec(
                (1, 1, 1, BZ + 2 * K, TY + 2 * K, X),
                lambda i, j, c: (i, j, c, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (3, BZ, TY, X),
                lambda i, j, c: (0, i, j, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, BZ, TY, X), lambda i, j, c: (c, i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((C, Z, Y, X), jnp.float32),
        interpret=interpret,
        **cparams,
    )(vol_t, psi)


@functools.partial(
    jax.jit, static_argnames=("K", "BZ", "TY", "floor", "interpret")
)
def window_warp_pallas(
    vol: jnp.ndarray,  # f32[Z, Y, X] or f32[C, Z, Y, X]
    psi: jnp.ndarray,  # f32[3, Z, Y, X] absolute coords (voxel units)
    K: int = 2,
    BZ: int = 0,
    TY: int = 0,
    floor: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Bounded-window trilinear (or floor-corner) warp as a pipelined Pallas
    kernel. Semantics identical to fields.sample_trilinear_window /
    sample_nearest_floor_window; valid while displacements stay within K.

    Tile geometry notes in :func:`_warp_tiling`.
    """
    squeeze = vol.ndim == 3
    if squeeze:
        vol = vol[None]
    C, Z, Y, X = vol.shape
    BZ, TY = _warp_tiling(Z, Y, X, K, BZ, TY)
    vol_t = prestack_warp_vol(vol, K, BZ, TY)
    out = _window_warp_stacked(
        vol_t, psi, K=K, BZ=BZ, TY=TY, floor=floor, interpret=interpret
    )
    return out[0] if squeeze else out


@functools.partial(
    jax.jit, static_argnames=("K", "BZ", "TY", "interpret")
)
def window_warp_pallas_mixed(
    vol_tri: jnp.ndarray,  # f32[Z, Y, X] sampled trilinearly
    vol_floor: jnp.ndarray,  # f32[Z, Y, X] sampled with the floor rule
    psi: jnp.ndarray,  # f32[3, Z, Y, X] absolute coords (voxel units)
    K: int = 2,
    BZ: int = 0,
    TY: int = 0,
    interpret: bool = False,
):
    """Warp a (tsdf, weight) pair at the SAME psi in one pipeline pass:
    channel 0 trilinear, channel 1 floor-corner (the solver tail's
    tsdf_global/weight_global at psi_inv — two window_warp_pallas calls
    merged, sharing the psi DMA and pipeline overhead). Returns
    (warp_tri, warp_floor); each identical to the single-mode kernel."""
    vol = jnp.stack([vol_tri, vol_floor], axis=0)
    C, Z, Y, X = vol.shape
    BZ, TY = _warp_tiling(Z, Y, X, K, BZ, TY)
    vol_t = prestack_warp_vol(vol, K, BZ, TY)
    out = _window_warp_stacked(
        vol_t, psi, K=K, BZ=BZ, TY=TY, interpret=interpret, mixed=True
    )
    return out[0], out[1]


def _make_warp_fuse_kernel(BZ, TY, Y, X, K, Zg):
    """Floor-warp the live WEIGHT volume at psi and fuse the warped live
    (tsdf, weight) pair into the global volume — one (z, y)-tile.

    The weight warp body is the floor branch of :func:`_make_warp_kernel`;
    the epilogue applies the reference fuse rule (tsdf_volume.cu:103-130)
    in-register, so the production frame's separate weight-warp pass and
    elementwise fuse pass (2 extra kernel pipelines + a full weight-volume
    HBM round trip) collapse into this single pipeline."""

    def kernel(scal_ref, vol_ref, psi_ref, tg_ref, wg_ref, tnp_ref,
               tg_out, wg_out):
        # scal_ref: f32[1] = [max_weight] (SMEM)
        # vol_ref:  f32[1, 1, 1, BZ+2K, TY+2K, X] overlapping weight tile
        # psi_ref:  f32[3, BZ, TY, X] absolute coords (voxel units)
        # tg/wg/tnp_ref, outs: f32[BZ, TY, X] center blocks
        iz = pl.program_id(0)
        iy = pl.program_id(1)
        z0 = iz * BZ
        y0 = iy * TY
        shape_o = (BZ, TY, X)
        vx = jax.lax.broadcasted_iota(jnp.int32, shape_o, 2).astype(jnp.float32)
        vy = (
            jax.lax.broadcasted_iota(jnp.int32, shape_o, 1) + y0
        ).astype(jnp.float32)
        vz = (
            jax.lax.broadcasted_iota(jnp.int32, shape_o, 0) + z0
        ).astype(jnp.float32)

        cx = jnp.floor(jnp.clip(psi_ref[0], 0.0, X - 1))
        cy = jnp.floor(jnp.clip(psi_ref[1], 0.0, Y - 1))
        cz = jnp.floor(jnp.clip(psi_ref[2], 0.0, Zg - 1))
        dx = jnp.clip(cx - vx, -K, K)
        dy = jnp.clip(cy - vy, -K, K)
        dz = jnp.clip(cz - vz, -K, K)
        wxs = [(dx == ox).astype(jnp.float32) for ox in range(-K, K + 1)]
        wys = [(dy == oy).astype(jnp.float32) for oy in range(-K, K + 1)]

        def warp_body(i, acc):
            oz = i - K
            lz = vol_ref[0, 0, 0, pl.ds(K + oz, BZ), :, :]
            lxz = [_shift_x_edge(lz, ox, X) for ox in range(-K, K + 1)]
            acc_y = jnp.zeros(shape_o, jnp.float32)
            for oy in range(-K, K + 1):
                acc_x = jnp.zeros(shape_o, jnp.float32)
                for ox in range(-K, K + 1):
                    lzy = lxz[ox + K][:, K + oy : K + oy + TY, :]
                    acc_x = acc_x + wxs[ox + K] * lzy
                acc_y = acc_y + wys[oy + K] * acc_x
            wz = (dz == oz.astype(jnp.float32)).astype(jnp.float32)
            return acc + wz * acc_y

        wnp = jax.lax.fori_loop(
            0, 2 * K + 1, warp_body, jnp.zeros(shape_o, jnp.float32)
        )

        # fuse rule (reference tsdf_volume.cu:103-130; tsdf.fuse_volumes)
        maxw = scal_ref[0]
        tg = tg_ref[...]
        wg = wg_ref[...]
        tnp = tnp_ref[...]
        skip = (wnp == 0.0) | (
            (wnp == 1.0) & ((tnp == 0.0) | (tnp == -1.0))
        )
        t_new = (wg * tg + tnp) / (wg + 1.0)
        w_new = jnp.minimum(wg + 1.0, maxw)
        tg_out[...] = jnp.where(skip, tg, t_new)
        wg_out[...] = jnp.where(skip, wg, w_new)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("K", "BZ", "TY", "interpret")
)
def window_warp_fuse_pallas(
    tsdf_g: jnp.ndarray,  # f32[Z, Y, X] canonical tsdf
    weight_g: jnp.ndarray,  # f32[Z, Y, X] canonical weight
    tsdf_n_psi: jnp.ndarray,  # f32[Z, Y, X] live tsdf already warped at psi
    weight_n: jnp.ndarray,  # f32[Z, Y, X] UNWARPED live weight
    psi: jnp.ndarray,  # f32[3, Z, Y, X] absolute coords (voxel units)
    max_weight: jnp.ndarray,
    K: int = 2,
    BZ: int = 0,
    TY: int = 0,
    interpret: bool = False,
):
    """Fuse a solved frame into the canonical volume in ONE pipeline pass:
    weight_n is floor-warped at psi in-kernel (sample_nearest_floor_window
    semantics) and the (tsdf_n_psi, warped weight) pair is blended with the
    reference running-average rule (tsdf.fuse_volumes). Returns
    (tsdf_g', weight_g') — bit-identical to

        wnp = sample_nearest_floor_window(weight_n, psi, max_disp=K)
        fuse_volumes(tsdf_g, weight_g, tsdf_n_psi, wnp, max_weight)

    while skipping the separate weight-warp kernel and the full-volume
    elementwise fuse pass (the production frame step's fuse stage)."""
    Z, Y, X = weight_n.shape
    BZ, TY = _warp_tiling(Z, Y, X, K, BZ, TY)
    vol_t = prestack_warp_vol(weight_n[None], K, BZ, TY)
    nz, ny = Z // BZ, Y // TY
    scal = max_weight.astype(jnp.float32).reshape(1)

    tile_f = (
        2 * (BZ + 2 * K) * (TY + 2 * K) * X
        + 2 * 3 * BZ * TY * X
        + 2 * 5 * BZ * TY * X  # tg/wg/tnp in + 2 outs, double-buffered
        + (2 * (2 * K + 1) + 4) * BZ * TY * X
        + (2 * K + 1) * BZ * (TY + 2 * K) * X
    )
    vmem_mb = min(120, max(32, (4 * tile_f >> 20) + 8))
    cparams = (
        {"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb << 20)}
        if not interpret
        else {}
    )

    center = pl.BlockSpec(
        (BZ, TY, X), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _make_warp_fuse_kernel(BZ, TY, Y, X, K, Z),
        grid=(nz, ny),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, 1, 1, BZ + 2 * K, TY + 2 * K, X),
                lambda i, j: (i, j, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (3, BZ, TY, X), lambda i, j: (0, i, j, 0),
                memory_space=pltpu.VMEM,
            ),
            center,
            center,
            center,
        ],
        out_specs=[center, center],
        out_shape=[
            jax.ShapeDtypeStruct((Z, Y, X), jnp.float32),
            jax.ShapeDtypeStruct((Z, Y, X), jnp.float32),
        ],
        interpret=interpret,
        **cparams,
    )(scal, vol_t, psi, tsdf_g, weight_g, tsdf_n_psi)


# ---------------------------------------------------------------------------
# double-buffered fused GD iteration (the production TPU hot loop)
# ---------------------------------------------------------------------------
#
# The round-1 fused kernel below (fused_gd_step) is correct but serialises
# its manual DMAs with compute (start/wait per tile, no overlap): measured
# 1.6 ms/iter at 128^3 vs 0.73 for the unfused XLA+warp-kernel split. This
# version keeps the same compute body and Mosaic safety rules but overlaps
# transfer with compute the standard way (pallas guide "Double Buffering"):
# grid steps execute sequentially on the TPU core, so tile t starts the DMA
# for tile t+1 into the other scratch slot before processing its own, and
# every input transfer hides behind the previous tile's compute. Outputs go
# through regular BlockSpecs (the automatic output pipeline double-buffers
# copy-back). Adds heavy-ball momentum (solver.py estimate_psi semantics:
# v' = mu v + dU_S, update = alpha v') so the production convergence mode
# runs fully fused.
#
# HBM traffic per iteration (128^3, BZ=8, TY=32): ~2.5x-overlap reads of
# psi/tnp/tg/live + vel + writes + the per-iteration edge pads of psi/tnp
# ~= 280 MB -> ~0.34 ms at the 819 GB/s v5e roofline; the unfused XLA
# chain moves >600 MB.


def _make_db_kernel(BZ, TY, Z, Y, X, K, taps, n_taps, mu, ny, n_tiles,
                    XL=0):
    """Fused GD-iteration kernel body with double-buffered input DMA.

    Z is the GLOBAL z extent (== the local block depth except inside a
    z-sharded solve); the SMEM zb_ref holds the global z of local row 0.
    """
    R = n_taps // 2
    DZ = BZ + 2 * R  # dU z-rows (output rows + conv halo)
    DY = TY + 2 * R
    has_vel = mu is not None

    def kernel(*refs):
        if has_vel:
            (scal_ref, zb_ref, psi_ref, tnp_ref, tg_ref, live_ref, vel_ref,
             psi_out, tnp_out, vel_out, mx_out,
             s_psi, s_tnp, s_tg, s_live, s_vel, sems) = refs
        else:
            (scal_ref, zb_ref, psi_ref, tnp_ref, tg_ref, live_ref,
             psi_out, tnp_out, mx_out,
             s_psi, s_tnp, s_tg, s_live, sems) = refs

        iz = pl.program_id(0)
        iy = pl.program_id(1)
        flat = iz * ny + iy
        slot = jax.lax.rem(flat, 2)
        alpha = scal_ref[0]
        w_reg = scal_ref[1]

        def tile_copies(f, s):
            izf = f // ny
            iyf = jax.lax.rem(f, ny)
            zs = izf * BZ  # start in the H-padded frame == z0 - H + H
            ys = iyf * TY  # sublane-aligned: TY is a multiple of 8
            cps = [
                pltpu.make_async_copy(
                    psi_ref.at[
                        :, pl.ds(zs, BZ + 2 * _H), pl.ds(ys, TY + 2 * _H), :
                    ],
                    s_psi.at[s],
                    sems.at[s, 0],
                ),
                pltpu.make_async_copy(
                    tnp_ref.at[pl.ds(zs, BZ + 2 * _H), pl.ds(ys, TY + 2 * _H), :],
                    s_tnp.at[s],
                    sems.at[s, 1],
                ),
                pltpu.make_async_copy(
                    tg_ref.at[pl.ds(zs, BZ + 2 * _H), pl.ds(ys, TY + 2 * _H), :],
                    s_tg.at[s],
                    sems.at[s, 2],
                ),
                pltpu.make_async_copy(
                    live_ref.at[pl.ds(zs, BZ + 2 * _H), pl.ds(ys, TY + 2 * _H), :],
                    s_live.at[s],
                    sems.at[s, 3],
                ),
            ]
            if has_vel:
                cps.append(
                    pltpu.make_async_copy(
                        vel_ref.at[:, pl.ds(zs, BZ), pl.ds(ys, TY), :],
                        s_vel.at[s],
                        sems.at[s, 4],
                    )
                )
            return cps

        @pl.when(flat == 0)
        def _():
            for c in tile_copies(0, 0):
                c.start()

        @pl.when(flat + 1 < n_tiles)
        def _():
            for c in tile_copies(flat + 1, 1 - slot):
                c.start()

        for c in tile_copies(flat, slot):
            c.wait()

        _gd_tile_compute(
            s_psi.at[slot], s_tnp.at[slot], s_tg.at[slot],
            lambda oz: s_live[slot, pl.ds(_H + oz, BZ), :, :],
            (lambda c: s_vel[slot, c]) if has_vel else None,
            psi_out, tnp_out, vel_out if has_vel else None, mx_out,
            iz, iy, alpha, w_reg,
            BZ=BZ, TY=TY, Z=Z, Y=Y, X=X, K=K, taps=taps, n_taps=n_taps, mu=mu,
            z_base=zb_ref[0], XL=XL,
        )

    return kernel


def _gd_tile_compute(
    sp_ref, st_ref, sg_ref, live_slice, vel_at, psi_out, tnp_out, vel_out,
    mx_out, iz, iy, alpha, w_reg, *, BZ, TY, Z, Y, X, K, taps, n_taps, mu,
    z_base=0, XL=0, H=_H, live_x=None, xmats=None, e_out=None
):
    """Shared per-tile GD-iteration compute (stencils + potential gradient
    + Sobolev convolutions + update + windowed warp + tile max norm).

    sp/st/sg are _H-halo tile refs/views of psi, tnp, tg; live_slice(oz)
    returns the live tile's BZ z-rows at traced offset oz (a DIRECT ref
    getitem with a dynamic pl.ds start — the caller must not route it
    through an .at[] view); vel_at maps channel -> velocity tile value
    (or None for plain GD). Used by both the manual-DMA double-buffered
    kernel and the BlockSpec-stacked small-grid kernel.

    Tiles are loaded as full VALUES and sliced statically: Mosaic fails to
    compile static-start pl.ds ref slices through .at[] views when the
    lane extent is below 128 — full-tile loads + value slicing lower
    correctly at every lane width (and identically at 128).

    XL ("logical X", default = X): LANE PACKING for small grids. Mosaic
    rejects this kernel family below 128 lanes, so sub-128 volumes are
    edge-padded up to 128 lanes OUTSIDE the kernel; X is then the physical
    lane extent while XL is the true volume width. All x clamps, masks and
    shifts use XL, so lanes >= XL are dead: real lanes never read them
    (edge-clamped shifts replicate column XL-1 instead), their update norm
    is masked out of the convergence max, and their outputs are garbage the
    caller slices away. Stencil/conv/warp results on lanes < XL are
    IDENTICAL to the unpadded kernel.

    live_x: optional (oz, ox) -> (BZ, TY+2H, X) callback returning the
    live tile ALREADY x-shifted by ox (pre-shifted live stack) — removes
    (2K+1)^2 lane-roll+edge-fix passes per tile from the warp.
    e_out: optional (1, 1, 8, 128) ref receiving the tile's DATA-ENERGY
    partial sum((tnp' - tg)^2) (dead packing lanes masked out). Computed
    in-kernel so the stall detector / energy recording never touch the
    big loop-carried buffers outside the kernel — an outside reduction
    forces XLA to copy the pallas-aliased padded state every iteration
    (~2x per-iteration cost at 128^3, measured 2026-08-17).
    xmats: optional (bx, gx, lx) square (X, X) matrices evaluating the
    x-axis convolution / central difference / second difference as MXU
    matmuls (edge clamping and boundary masks folded into the matrix
    columns) — moves ~120 VPU passes per tile onto the idle MXU.
    """
    R = n_taps // 2
    DZ = BZ + 2 * R
    DY = TY + 2 * R
    XL = XL or X
    has_vel = vel_at is not None
    # z_base: GLOBAL z of local row 0 (traced; nonzero inside a z-sharded
    # solve, where Z is the global extent and psi holds global coords)
    z0 = iz * BZ + z_base
    y0 = iy * TY

    sp = sp_ref[...]
    st = st_ref[...]
    sg = sg_ref[...]

    # ---- global-position masks for the boundary-vanishing stencils ----
    shape_d = (DZ, DY, X)
    gz = jax.lax.broadcasted_iota(jnp.int32, shape_d, 0) + (z0 - R)
    gy = jax.lax.broadcasted_iota(jnp.int32, shape_d, 1) + (y0 - R)
    gx = jax.lax.broadcasted_iota(jnp.int32, shape_d, 2)
    gz = jnp.clip(gz, 0, Z - 1)
    gy = jnp.clip(gy, 0, Y - 1)
    mz = ((gz > 0) & (gz < Z - 1)).astype(jnp.float32)
    my = ((gy > 0) & (gy < Y - 1)).astype(jnp.float32)
    mx = ((gx > 0) & (gx < XL - 1)).astype(jnp.float32)

    o = H - R  # tile offset of the first dU row

    def matx(a, m):
        """Contract the lane axis of a 3-D tile with an (X, X) matrix on
        the MXU (leading dims merge for free — no relayout)."""
        s3 = a.shape
        return jnp.dot(
            a.reshape(s3[0] * s3[1], s3[2]), m,
            preferred_element_type=jnp.float32,
        ).reshape(s3)

    def grad_of(c):
        t_c = st[o:o + DZ, o:o + DY, :]
        if c == 0:
            if xmats is not None:
                return matx(t_c, xmats[1])  # masks folded into gx columns
            return (
                (_shift_x_edge(t_c, 1, XL) - _shift_x_edge(t_c, -1, XL))
                * 0.5
                * mx
            )
        if c == 1:
            return (
                st[o:o + DZ, o + 1:o + 1 + DY, :]
                - st[o:o + DZ, o - 1:o - 1 + DY, :]
            ) * 0.5 * my
        return (
            st[o + 1:o + 1 + DZ, o:o + DY, :]
            - st[o - 1:o - 1 + DZ, o:o + DY, :]
        ) * 0.5 * mz

    update_sq = None
    for c in range(3):
        diff = st[o:o + DZ, o:o + DY, :] - sg[o:o + DZ, o:o + DY, :]
        p_c = sp[c, o:o + DZ, o:o + DY, :]
        if xmats is not None:
            lap_x = matx(p_c, xmats[2])
        else:
            lap_x = (
                _shift_x_edge(p_c, 1, XL) + _shift_x_edge(p_c, -1, XL)
                - 2.0 * p_c
            ) * mx
        lap_y = (
            sp[c, o:o + DZ, o + 1:o + 1 + DY, :]
            + sp[c, o:o + DZ, o - 1:o - 1 + DY, :]
            - 2.0 * p_c
        ) * my
        lap_z = (
            sp[c, o + 1:o + 1 + DZ, o:o + DY, :]
            + sp[c, o - 1:o - 1 + DZ, o:o + DY, :]
            - 2.0 * p_c
        ) * mz
        neg_lap = -(lap_x + lap_y + lap_z)

        dU = diff * grad_of(c) + w_reg * neg_lap  # [DZ, DY, X]

        # ---- Sobolev smoothing: sum of three 1-D convolutions ----
        # taps flipped (n-1-k): true convolution, as in fused_gd_step
        dU_ctr = dU[R:R + BZ, R:R + TY, :]
        if xmats is not None:
            acc = matx(dU_ctr, xmats[0])
        else:
            acc = jnp.zeros((BZ, TY, X), jnp.float32)
            for k in range(n_taps):
                acc = acc + taps[n_taps - 1 - k] * _shift_x_edge(
                    dU_ctr, k - R, XL
                )
        for k in range(n_taps):
            acc = acc + taps[n_taps - 1 - k] * dU[R:R + BZ, k:k + TY, :]
        for k in range(n_taps):
            acc = acc + taps[n_taps - 1 - k] * dU[k:k + BZ, R:R + TY, :]

        if has_vel:
            v_new = mu * vel_at(c) + acc
            vel_out[c] = v_new
            upd = alpha * v_new
        else:
            upd = alpha * acc
        psi_out[c] = sp[c, H:H + BZ, H:H + TY, :] - upd
        update_sq = upd * upd if update_sq is None else update_sq + upd * upd

    if XL < X:  # dead packing lanes must not enter the convergence max
        lx = jax.lax.broadcasted_iota(jnp.int32, update_sq.shape, 2)
        update_sq = jnp.where(lx < XL, update_sq, 0.0)
    mx_out[:] = jnp.full((1, 1, 8, 128), jnp.max(update_sq), jnp.float32)

    # ---- bounded-window trilinear warp of the live tsdf at psi' ----
    shape_o = (BZ, TY, X)
    vx = jax.lax.broadcasted_iota(jnp.int32, shape_o, 2).astype(jnp.float32)
    vy = (
        jax.lax.broadcasted_iota(jnp.int32, shape_o, 1) + y0
    ).astype(jnp.float32)
    vz = (
        jax.lax.broadcasted_iota(jnp.int32, shape_o, 0) + z0
    ).astype(jnp.float32)
    hi = K - 1e-4  # open window: corner offsets span [-K, K]
    dx = jnp.clip(jnp.clip(psi_out[0], 0.0, XL - 1) - vx, -K, hi)
    dy = jnp.clip(jnp.clip(psi_out[1], 0.0, Y - 1) - vy, -K, hi)
    dz = jnp.clip(jnp.clip(psi_out[2], 0.0, Z - 1) - vz, -K, hi)

    # per-axis weights hoisted out of the triple loop (cf. the warp-only
    # kernel): (2K+1)^2 rolls + (2K+1)^3 static-slice FMAs
    wxs = [jnp.maximum(0.0, 1.0 - jnp.abs(dx - ox)) for ox in range(-K, K + 1)]
    wys = [jnp.maximum(0.0, 1.0 - jnp.abs(dy - oy)) for oy in range(-K, K + 1)]

    def warp_body(i, acc):
        # DYNAMIC z start on the MAJOR dim of the live ref (Mosaic-safe at
        # every lane width — unlike static-start pl.ds, which fails to
        # compile below 128 lanes); y offsets statically unrolled on the
        # loaded value; x shifts are static lane rolls
        oz = i - K
        if live_x is not None:
            lxz = [live_x(oz, ox) for ox in range(-K, K + 1)]
        else:
            lz = live_slice(oz)
            lxz = [_shift_x_edge(lz, ox, XL) for ox in range(-K, K + 1)]
        acc_y = jnp.zeros(shape_o, jnp.float32)
        for oy in range(-K, K + 1):
            acc_x = jnp.zeros(shape_o, jnp.float32)
            for ox in range(-K, K + 1):
                lzy = lxz[ox + K][:, H + oy:H + oy + TY, :]
                acc_x = acc_x + wxs[ox + K] * lzy
            acc_y = acc_y + wys[oy + K] * acc_x
        wz = jnp.maximum(0.0, 1.0 - jnp.abs(dz - oz.astype(jnp.float32)))
        return acc + wz * acc_y

    tnp_val = jax.lax.fori_loop(
        0, 2 * K + 1, warp_body, jnp.zeros(shape_o, jnp.float32)
    )
    tnp_out[:] = tnp_val

    if e_out is not None:
        d = tnp_val - sg[H:H + BZ, H:H + TY, :]
        if XL < X:
            lx_e = jax.lax.broadcasted_iota(jnp.int32, shape_o, 2)
            d = jnp.where(lx_e < XL, d, 0.0)
        e_out[:] = jnp.full((1, 1, 8, 128), jnp.sum(d * d), jnp.float32)


def _db_tiles(Z, Y, X):
    """Default (BZ, TY) tile geometry: sublane-aligned, VMEM-safe.

    Scratch scales with TY*X, so TY shrinks as the lane extent grows
    (measured: BZ=8/TY=32 compiles at X=128 and every larger tile fails
    Mosaic's scoped-vmem check; TY=16 at X=256, TY=8 at X=512)."""
    BZ = 32  # deep z-tiles cut halo read amplification ((BZ+2H)/BZ);
    # the auto-sized Mosaic vmem budget makes the bigger scratch legal
    while Z % BZ:  # small local blocks (e.g. z-sharded shards) use fewer rows
        BZ //= 2
    TY = 32 if X <= 256 else 16
    while Y % TY:
        TY //= 2
    return BZ, TY


def fused_gd_iteration_db(
    psi: jnp.ndarray,  # f32[3, Z, Y, X]
    tnp: jnp.ndarray,  # f32[Z, Y, X]
    vel,  # f32[3, Z, Y, X] or None
    tg_pad: jnp.ndarray,  # f32[Z+2H, Y+2H, X] edge-padded (loop-invariant)
    live_pad: jnp.ndarray,  # f32[Z+2H, Y+2H, X] edge-padded (loop-invariant)
    alpha: jnp.ndarray,
    w_reg: jnp.ndarray,
    taps_static: Tuple[float, ...],
    *,
    K: int = 2,
    BZ: int = 0,
    TY: int = 0,
    momentum=None,
    interpret: bool = False,
    x_pad_to: int = 0,
):
    """One fused solver iteration, double-buffered. Traceable (call under jit
    / while_loop). Returns (psi', tnp', vel', max||update||^2); vel' is None
    when momentum is None.

    The loop-invariant tg/live volumes are taken PRE-PADDED so their pads are
    paid once per solve; psi/tnp are padded here every iteration. For the
    production loop use :func:`fused_gd_iteration_db_padded` with
    :func:`refresh_padded` state instead — it avoids the full pad copies.

    x_pad_to: lane-pack sub-128 grids up to this lane extent (tg_pad /
    live_pad must be padded with the same ``pad_for_db(..., x_to)``);
    outputs are sliced back to the logical width here.
    """
    xl = psi.shape[-1] if x_pad_to and x_pad_to > psi.shape[-1] else 0
    psi_pad = pad_for_db(psi, x_pad_to)
    tnp_pad = pad_for_db(tnp, x_pad_to)
    if xl and vel is not None:  # vel rides the kernel un-haloed but must
        # still span the physical lane extent
        vel = jnp.pad(
            vel,
            [(0, 0)] * (vel.ndim - 1) + [(0, x_pad_to - xl)],
            mode="edge",
        )
    psi_n, tnp_n, vel_n, mx = fused_gd_iteration_db_padded(
        psi_pad, tnp_pad, vel, tg_pad, live_pad, alpha, w_reg, taps_static,
        K=K, BZ=BZ, TY=TY, momentum=momentum, interpret=interpret,
        x_logical=xl,
    )
    if xl:
        psi_n = psi_n[..., :xl]
        tnp_n = tnp_n[..., :xl]
        vel_n = vel_n[..., :xl] if vel_n is not None else None
    return psi_n, tnp_n, vel_n, mx


def fused_gd_iteration_db_padded(
    psi_pad: jnp.ndarray,  # f32[3, Z+2H, Y+2H, X] edge-padded state
    tnp_pad: jnp.ndarray,  # f32[Z+2H, Y+2H, X] edge-padded state
    vel,  # f32[3, Z, Y, X] or None
    tg_pad: jnp.ndarray,
    live_pad: jnp.ndarray,
    alpha: jnp.ndarray,
    w_reg: jnp.ndarray,
    taps_static: Tuple[float, ...],
    *,
    K: int = 2,
    BZ: int = 0,
    TY: int = 0,
    momentum=None,
    interpret: bool = False,
    z_base=None,
    z_global: int = 0,
    vmem_limit_mb: int = 0,
    x_logical: int = 0,
):
    """Core of :func:`fused_gd_iteration_db` taking PADDED psi/tnp state
    (see :func:`refresh_padded`). Returns center-sized outputs.

    vmem_limit_mb: raise Mosaic's scoped-vmem budget (default compiler
    budget when 0) — larger tiles need it.

    x_logical: true volume width when the inputs are LANE-PACKED (edge-
    padded in x up to a Mosaic-compilable lane extent, see
    :func:`_gd_tile_compute`); outputs then carry the physical width and
    the caller slices [..., :x_logical]. 0 = unpadded.

    z_base / z_global: for running inside a z-sharded solve — z_base is the
    (traced) global z of the local block's first row and z_global the
    global z extent; the local block's z-halo rows must then hold
    NEIGHBOUR data (halo exchange) instead of edge replicas. Defaults:
    unsharded (z_base 0, z_global = local depth).
    """
    Z, Y, X = (
        tnp_pad.shape[0] - 2 * _H,
        tnp_pad.shape[1] - 2 * _H,
        tnp_pad.shape[2],
    )
    if not BZ or not TY:
        dBZ, dTY = _db_tiles(Z, Y, X)
        BZ = BZ or dBZ
        TY = TY or dTY
    n_taps = len(taps_static)
    assert n_taps % 2 == 1 and n_taps <= 2 * _H - 1
    assert 1 <= K <= _H, f"window K={K} must fit the fixed halo {_H}"
    assert Z % BZ == 0 and Y % TY == 0 and TY % 8 == 0, (Z, BZ, Y, TY)
    assert tg_pad.shape == (Z + 2 * _H, Y + 2 * _H, X)

    nz, ny = Z // BZ, Y // TY
    grid = (nz, ny)
    n_tiles = nz * ny
    mu = float(momentum) if momentum is not None else None
    kernel = _make_db_kernel(
        BZ, TY, z_global or Z, Y, X, K, taps_static, n_taps, mu, ny, n_tiles,
        XL=x_logical,
    )

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ] + [pl.BlockSpec(memory_space=pl.ANY)] * (5 if mu is not None else 4)
    out_specs = [
        pl.BlockSpec(
            (3, BZ, TY, X), lambda i, j: (0, i, j, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (BZ, TY, X), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((3, Z, Y, X), jnp.float32),
        jax.ShapeDtypeStruct((Z, Y, X), jnp.float32),
    ]
    if mu is not None:
        out_specs.append(out_specs[0])
        out_shapes.append(out_shapes[0])
    out_specs.append(
        pl.BlockSpec(
            (1, 1, 8, 128), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        )
    )
    out_shapes.append(jax.ShapeDtypeStruct(grid + (8, 128), jnp.float32))

    scratch = [
        pltpu.VMEM((2, 3, BZ + 2 * _H, TY + 2 * _H, X), jnp.float32),
        pltpu.VMEM((2, BZ + 2 * _H, TY + 2 * _H, X), jnp.float32),
        pltpu.VMEM((2, BZ + 2 * _H, TY + 2 * _H, X), jnp.float32),
        pltpu.VMEM((2, BZ + 2 * _H, TY + 2 * _H, X), jnp.float32),
    ]
    n_dma = 4
    if mu is not None:
        scratch.append(pltpu.VMEM((2, 3, BZ, TY, X), jnp.float32))
        n_dma = 5
    scratch.append(pltpu.SemaphoreType.DMA((2, n_dma)))

    scal = jnp.stack([alpha.astype(jnp.float32), w_reg.astype(jnp.float32)])
    zb = jnp.asarray(
        [0 if z_base is None else z_base], jnp.int32
    ).reshape(1)
    args = [scal, zb, psi_pad, tnp_pad, tg_pad, live_pad]
    if mu is not None:
        args.append(vel)

    if not vmem_limit_mb:
        # auto-size Mosaic's scoped-vmem budget: the manual double-buffered
        # scratch dominates, plus the output pipeline's blocks and the
        # kernel body's stack temps (warp weights + dU chains). The default
        # 16 MB budget rejects the fast deep-z tiles (BZ>=16); v5e VMEM is
        # 128 MB, so sizing the budget to the actual footprint (+ margin)
        # is free.
        halo_tile = (BZ + 2 * _H) * (TY + 2 * _H) * X
        out_tile = BZ * TY * X
        scratch_f = 2 * (3 + 3) * halo_tile  # psi(3) + tnp/tg/live, 2 slots
        if mu is not None:
            scratch_f += 2 * 3 * out_tile
        io_f = 2 * (3 + 1 + (3 if mu is not None else 0)) * out_tile
        R_ = n_taps // 2
        stack_f = (
            (2 * (2 * K + 1) + 6) * out_tile
            + (2 * K + 1) * BZ * (TY + 2 * _H) * X
            + 4 * (BZ + 2 * R_) * (TY + 2 * R_) * X
        )
        need_mb = (4 * (scratch_f + io_f + stack_f) >> 20) + 8
        vmem_limit_mb = min(120, max(32, need_mb))
    cparams = (
        pltpu.CompilerParams(vmem_limit_bytes=vmem_limit_mb << 20)
        if vmem_limit_mb and not interpret
        else None
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        scratch_shapes=scratch,
        interpret=interpret,
        **({"compiler_params": cparams} if cparams else {}),
    )(*args)

    if mu is not None:
        psi_new, tnp_new, vel_new, mx_tiles = outs
    else:
        psi_new, tnp_new, mx_tiles = outs
        vel_new = None
    return psi_new, tnp_new, vel_new, jnp.max(mx_tiles)


def pad_for_db(vol: jnp.ndarray, x_to: int = 0) -> jnp.ndarray:
    """Edge-pad a volume by the fixed kernel halo (loop-invariant inputs).

    x_to: additionally LANE-PACK — edge-pad the x (lane) axis up to x_to
    so sub-128 grids reach a Mosaic-compilable lane extent. The kernel's
    logical-X clamping (see :func:`_gd_tile_compute`) keeps the padded
    lanes inert; the pad content merely needs to be finite."""
    lead = [(0, 0)] * (vol.ndim - 3)
    xp = max(0, x_to - vol.shape[-1]) if x_to else 0
    return jnp.pad(vol, lead + [(_H, _H), (_H, _H), (0, xp)], mode="edge")


def refresh_padded(buf: jnp.ndarray, center: jnp.ndarray) -> jnp.ndarray:
    """Write `center` into the interior of an edge-padded buffer and refresh
    the replicated border strips.

    Loop-state companion of :func:`pad_for_db`: a full jnp.pad each
    iteration reads AND writes the whole volume (~52 MB at 128^3, 420 MB at
    256^3 for psi); updating the carried padded buffer in place (XLA turns
    the dynamic_update_slice on a loop-carried buffer into an in-place
    write) costs only the interior write plus four O(halo * face) strips.
    """
    nd = center.ndim
    zax, yax = nd - 3, nd - 2
    Z, Y = center.shape[zax], center.shape[yax]
    start = (0,) * (nd - 3) + (_H, _H, 0)
    buf = jax.lax.dynamic_update_slice(buf, center, start)

    def rep(a, ax):
        return jnp.repeat(a, _H, axis=ax)

    # y strips from the center's edge columns (z extent: interior rows)
    lo_y = rep(jax.lax.slice_in_dim(center, 0, 1, axis=yax), yax)
    hi_y = rep(jax.lax.slice_in_dim(center, Y - 1, Y, axis=yax), yax)
    buf = jax.lax.dynamic_update_slice(buf, lo_y, (0,) * (nd - 3) + (_H, 0, 0))
    buf = jax.lax.dynamic_update_slice(
        buf, hi_y, (0,) * (nd - 3) + (_H, _H + Y, 0)
    )
    # z strips from the (now y-padded) edge rows — corners included
    row_lo = jax.lax.slice_in_dim(buf, _H, _H + 1, axis=zax)
    row_hi = jax.lax.slice_in_dim(buf, _H + Z - 1, _H + Z, axis=zax)
    buf = jax.lax.dynamic_update_slice(
        buf, rep(row_lo, zax), (0,) * (nd - 3) + (0, 0, 0)
    )
    buf = jax.lax.dynamic_update_slice(
        buf, rep(row_hi, zax), (0,) * (nd - 3) + (_H + Z, 0, 0)
    )
    return buf


def unpad_db(buf: jnp.ndarray, x_logical: int = 0) -> jnp.ndarray:
    """Interior of an _H-edge-padded array (x sliced to x_logical if
    lane-packed)."""
    nd = buf.ndim
    sl = (Ellipsis, slice(_H, buf.shape[nd - 3] - _H),
          slice(_H, buf.shape[nd - 2] - _H),
          slice(None, x_logical or None))
    return buf[sl]


# ---------------------------------------------------------------------------
# Y-FOLDED fused GD iteration (X=64 grids at full 128-lane VPU width)
# ---------------------------------------------------------------------------
#
# The lane-packing path (x_pad_to=128) makes sub-128 grids compile but
# wastes HALF the VPU on dead lanes at X=64 — and the fused body is
# VPU-throughput-bound, so the waste is a straight 2x. This variant packs
# y-PAIRS into the lane dim instead (see the fold helpers above): no dead
# lanes. The price: x shifts become segment-local (edge clamp per 64-lane
# segment) and y accesses mix sublane slices with 64-lane segment swaps
# (odd offsets) — ~15% more VPU ops for 2x more useful lanes.


def _gd_tile_compute_fold(
    sp_ref, st_ref, sg_ref, live_slice, vel_at, psi_out, tnp_out, vel_out,
    mx_out, iz, alpha, w_reg, *, BZ, TYf, Z, Y, X, K, taps, n_taps, mu,
    e_out=None, e_pre_out=None, reg_out=None, z_base=None, xmats=None,
    xmats_precision=None, live_x=None
):
    """Folded-layout variant of :func:`_gd_tile_compute` (same math; the
    docstrings there cover the structure). Tiles span the WHOLE folded-y
    extent: (BZ + 2*_H, TYf + 2*_HF, 2X), real y = 2*row + segment.

    e_pre_out / reg_out (verbose-trace bundle, both or neither): per-tile
    partials of the PRE-update data energy sum (phi_n_psi - phi_g)^2 and
    the PRE-update regulariser sum ||J(disp(psi))||_F^2 — the two
    quantities the reference prints per iteration (solver.cu:132-142).
    The Jacobian reuses the six neighbour shifts already loaded for the
    Laplacian, so the verbose bundle costs ~30 extra VPU ops/voxel and is
    only materialised when requested.

    z_base: traced GLOBAL z of local row 0 (nonzero inside a z-sharded
    solve, where the caller feeds ICI-halo-exchanged pads and Z is the
    GLOBAL depth — mirrors the z_base/z_global contract of
    :func:`_gd_tile_compute`)."""
    R = n_taps // 2
    Rf = (R + 1) // 2     # folded rows covering the conv reach
    DZ = BZ + 2 * R
    DYf = TYf + 2 * Rf
    XF = 2 * X
    H, HF = _H, _HF
    has_vel = vel_at is not None
    z0 = iz * BZ
    if z_base is not None:
        z0 = z0 + z_base

    sp = sp_ref[...]
    st = st_ref[...]
    sg = sg_ref[...]

    # ---- masks on the extended (DZ, DYf, XF) region ----
    shape_d = (DZ, DYf, XF)
    gz = jax.lax.broadcasted_iota(jnp.int32, shape_d, 0) + (z0 - R)
    gz = jnp.clip(gz, 0, Z - 1)
    lane_d = jax.lax.broadcasted_iota(jnp.int32, shape_d, 2)
    seg_d = (lane_d >= X).astype(jnp.int32)
    ry = 2 * (jax.lax.broadcasted_iota(jnp.int32, shape_d, 1) - Rf) + seg_d
    gy = jnp.clip(ry, 0, Y - 1)
    lx_d = lane_d - seg_d * X
    mz = ((gz > 0) & (gz < Z - 1)).astype(jnp.float32)
    my = ((gy > 0) & (gy < Y - 1)).astype(jnp.float32)
    mx = ((lx_d > 0) & (lx_d < X - 1)).astype(jnp.float32)

    oz_off = H - R    # tile z offset of extended row 0
    oyf = HF - Rf     # tile folded-row offset of extended row 0

    def ext(t, dz=0, oy=0):
        """Extended region of a full tile, shifted dz in z / oy in REAL y."""
        tz = t[..., oz_off + dz: oz_off + dz + DZ, :, :]
        return _shift_y_fold(tz, oy, oyf, DYf)

    def matx(a, m):
        """Contract the lane axis with a block-diagonal (2X, 2X) operator
        on the MXU (see :func:`_x_matrices_fold`; leading dims merge for
        free — no relayout). Precision: see ``xmats_precision`` in
        :func:`fused_gd_multi_fold`."""
        s3 = a.shape
        return jnp.dot(
            a.reshape(s3[0] * s3[1], s3[2]), m,
            preferred_element_type=jnp.float32,
            precision=xmats_precision,
        ).reshape(s3)

    def grad_of(c):
        if c == 0:
            t_c = ext(st)
            if xmats is not None:
                return matx(t_c, xmats[1])  # mask folded into gx columns
            return (
                (_shift_x_fold(t_c, 1, X) - _shift_x_fold(t_c, -1, X))
                * 0.5 * mx
            )
        if c == 1:
            return (ext(st, oy=1) - ext(st, oy=-1)) * 0.5 * my
        return (ext(st, dz=1) - ext(st, dz=-1)) * 0.5 * mz

    update_sq = None
    reg_sq = None
    diff = ext(st) - ext(sg)
    for c in range(3):
        p_c = sp[c]
        pce = ext(p_c)
        syp = ext(p_c, oy=1)
        sym = ext(p_c, oy=-1)
        szp = ext(p_c, dz=1)
        szm = ext(p_c, dz=-1)
        if xmats is not None:
            lap_x = matx(pce, xmats[2])
            sxp = sxm = None
        else:
            sxp = _shift_x_fold(pce, 1, X)
            sxm = _shift_x_fold(pce, -1, X)
            lap_x = (sxp + sxm - 2.0 * pce) * mx
        lap_y = (syp + sym - 2.0 * pce) * my
        lap_z = (szp + szm - 2.0 * pce) * mz
        neg_lap = -(lap_x + lap_y + lap_z)

        if reg_out is not None:
            # Jacobian of the DISPLACEMENT (reference Differentiator mode
            # 1, vector_fields.cu:415-472): central diffs of psi_c minus
            # the identity's unit diagonal, vanishing on boundary slices
            # exactly like the masked diffs
            if xmats is not None:
                jx = matx(pce, xmats[1]) - (1.0 if c == 0 else 0.0) * mx
            else:
                jx = ((sxp - sxm) * 0.5 - (1.0 if c == 0 else 0.0)) * mx
            jy = ((syp - sym) * 0.5 - (1.0 if c == 1 else 0.0)) * my
            jz = ((szp - szm) * 0.5 - (1.0 if c == 2 else 0.0)) * mz
            j2 = (jx * jx + jy * jy + jz * jz)[R:R + BZ, Rf:Rf + TYf, :]
            reg_sq = j2 if reg_sq is None else reg_sq + j2

        dU = diff * grad_of(c) + w_reg * neg_lap  # (DZ, DYf, XF)

        dU_ctr = dU[R:R + BZ, Rf:Rf + TYf, :]
        if xmats is not None:
            acc = matx(dU_ctr, xmats[0])
        else:
            acc = jnp.zeros((BZ, TYf, XF), jnp.float32)
            for k in range(n_taps):
                acc = acc + taps[n_taps - 1 - k] * _shift_x_fold(
                    dU_ctr, k - R, X
                )
        dU_zc = dU[R:R + BZ]
        for k in range(n_taps):
            acc = acc + taps[n_taps - 1 - k] * _shift_y_fold(
                dU_zc, k - R, Rf, TYf
            )
        for k in range(n_taps):
            acc = acc + taps[n_taps - 1 - k] * dU[k:k + BZ, Rf:Rf + TYf, :]

        if has_vel:
            v_new = mu * vel_at(c) + acc
            vel_out[c] = v_new
            upd = alpha * v_new
        else:
            upd = alpha * acc
        psi_out[c] = sp[c, H:H + BZ, HF:HF + TYf, :] - upd
        if mx_out is not None:
            update_sq = (
                upd * upd if update_sq is None else update_sq + upd * upd
            )

    if mx_out is not None:
        mx_out[:] = jnp.full((1, 8, 128), jnp.max(update_sq), jnp.float32)

    if reg_out is not None:
        d0 = diff[R:R + BZ, Rf:Rf + TYf, :]
        e_pre_out[:] = jnp.full((1, 8, 128), jnp.sum(d0 * d0), jnp.float32)
        reg_out[:] = jnp.full((1, 8, 128), jnp.sum(reg_sq), jnp.float32)

    # ---- bounded-window trilinear warp of the live tsdf at psi' ----
    shape_o = (BZ, TYf, XF)
    lane_o = jax.lax.broadcasted_iota(jnp.int32, shape_o, 2)
    seg_o = (lane_o >= X).astype(jnp.int32)
    vx = (lane_o - seg_o * X).astype(jnp.float32)
    vy = (
        2 * jax.lax.broadcasted_iota(jnp.int32, shape_o, 1) + seg_o
    ).astype(jnp.float32)
    vz = (
        jax.lax.broadcasted_iota(jnp.int32, shape_o, 0) + z0
    ).astype(jnp.float32)
    hi = K - 1e-4
    dx = jnp.clip(jnp.clip(psi_out[0], 0.0, X - 1) - vx, -K, hi)
    dy = jnp.clip(jnp.clip(psi_out[1], 0.0, Y - 1) - vy, -K, hi)
    dz = jnp.clip(jnp.clip(psi_out[2], 0.0, Z - 1) - vz, -K, hi)

    wxs = [jnp.maximum(0.0, 1.0 - jnp.abs(dx - ox)) for ox in range(-K, K + 1)]
    # y handled by FOLDED-ROW reindexing instead of per-oy shifts: the sum
    # over real offsets oy is re-indexed over folded-row offsets d and
    # TARGET segment t — live[y + oy] for voxel (row r, seg s) lives at
    # folded (r + d, t) with oy = 2d + t - s. The t == s ("plain") term is
    # a free static row slice with hat weight at offset 2d; the t != s
    # ("swapped") term is ONE segment swap with hat weight at offset
    # 2d + (1 - 2s). The hat's compact support makes the out-of-window
    # corner terms vanish automatically. 25 per-oy shifts per z-step (10
    # of them odd: 2 rolls + select each) become 3 swaps + 6 weight FMAs.
    # The swapped x-accumulation reuses the UNSWAPPED rows via
    # sum_ox wx[ox]*swap(p[ox]) == swap(sum_ox swap(wx[ox])*p[ox]).
    seg_f = seg_o.astype(jnp.float32)
    swap_delta = 1.0 - 2.0 * seg_f  # +1 on segment 0, -1 on segment 1
    # folded offsets covering |oy| <= K for BOTH segments (out-of-window
    # corner terms vanish via the hat support)
    ds = range(-((K + 1) // 2), (K + 1) // 2 + 1)
    w_plain = {d: jnp.maximum(0.0, 1.0 - jnp.abs(dy - 2.0 * d)) for d in ds}
    w_swap = {
        d: jnp.maximum(0.0, 1.0 - jnp.abs(dy - (2.0 * d + swap_delta)))
        for d in ds
    }
    wxs_sw = [_swap_segments(w) for w in wxs]

    if K == 1:
        # K=1 pruning (numerically IDENTICAL — only terms whose hat
        # weight is exactly zero are dropped): |dy| < 1, so the PLAIN
        # y-terms at d = +-1 (real offsets +-2) vanish, and of the two
        # outer SWAP terms each output segment needs exactly one —
        # segment 0 reads d=-1 (real oy=-1), segment 1 reads d=+1
        # (real oy=+1). The two surviving outer swap terms are merged
        # into ONE accumulation over per-segment-selected rows: the
        # post-swap segment-s lanes come from the PRE-swap other-segment
        # lanes, so rows are combined as (seg1 lanes <- d=-1, seg0 lanes
        # <- d=+1) before the shared wxs_sw accumulation. 27 FMAs/oz
        # drop to ~12 + 4 selects.
        lane_w = jax.lax.broadcasted_iota(jnp.int32, shape_o, 2)
        is_seg0 = lane_w < X
        w_swap_pm = jnp.where(is_seg0, w_swap[-1], w_swap[1])

        def warp_body(i, acc):
            oz = i - K
            if live_x is not None:
                # loop-invariant x-shifts prestacked by the caller (the
                # VMEM-resident multi-iteration kernel computes them once
                # per launch instead of (2K+1)^2 roll+edge-fix passes per
                # iteration)
                lxz = [live_x(oz, j) for j in range(2 * K + 1)]
            else:
                lz = live_slice(oz)
                lxz = [
                    _shift_x_fold(lz, ox, X) for ox in range(-K, K + 1)
                ]
            rows0 = [t[:, HF:HF + TYf, :] for t in lxz]
            a = jnp.zeros(shape_o, jnp.float32)
            b = jnp.zeros(shape_o, jnp.float32)
            bpm = jnp.zeros(shape_o, jnp.float32)
            for ox in range(3):
                rm = lxz[ox][:, HF - 1:HF - 1 + TYf, :]
                rp = lxz[ox][:, HF + 1:HF + 1 + TYf, :]
                # pre-swap: seg1 lanes feed post-swap seg0 (d=-1) and
                # seg0 lanes feed post-swap seg1 (d=+1)
                rcmb = jnp.where(is_seg0, rp, rm)
                a = a + wxs[ox] * rows0[ox]
                b = b + wxs_sw[ox] * rows0[ox]
                bpm = bpm + wxs_sw[ox] * rcmb
            acc_y = (
                w_plain[0] * a
                + w_swap[0] * _swap_segments(b)
                + w_swap_pm * _swap_segments(bpm)
            )
            wz = jnp.maximum(0.0, 1.0 - jnp.abs(dz - oz.astype(jnp.float32)))
            return acc + wz * acc_y
    else:
        def warp_body(i, acc):
            oz = i - K
            if live_x is not None:
                lxz = [live_x(oz, j) for j in range(2 * K + 1)]
            else:
                lz = live_slice(oz)  # (BZ, TYf + 2*_HF, XF)
                lxz = [
                    _shift_x_fold(lz, ox, X) for ox in range(-K, K + 1)
                ]
            acc_y = jnp.zeros(shape_o, jnp.float32)
            for d in ds:
                rows = [t[:, HF + d:HF + d + TYf, :] for t in lxz]
                a = jnp.zeros(shape_o, jnp.float32)
                b = jnp.zeros(shape_o, jnp.float32)
                for ox in range(2 * K + 1):
                    a = a + wxs[ox] * rows[ox]
                    b = b + wxs_sw[ox] * rows[ox]
                acc_y = acc_y + w_plain[d] * a + w_swap[d] * _swap_segments(b)
            wz = jnp.maximum(0.0, 1.0 - jnp.abs(dz - oz.astype(jnp.float32)))
            return acc + wz * acc_y

    tnp_val = jax.lax.fori_loop(
        0, 2 * K + 1, warp_body, jnp.zeros(shape_o, jnp.float32)
    )
    tnp_out[:] = tnp_val

    if e_out is not None:
        d = tnp_val - sg[H:H + BZ, HF:HF + TYf, :]
        e_out[:] = jnp.full((1, 8, 128), jnp.sum(d * d), jnp.float32)


def _make_fold_kernel(BZ, TYf, Z, Y, X, K, taps, n_taps, mu, n_tiles,
                      with_energy=False, with_zbase=False,
                      use_xmats=False, xmats_precision=None):
    """Double-buffered manual-DMA kernel over z-tiles of the folded
    layout (whole folded-y rows per tile); structure mirrors
    :func:`_make_db_kernel`. with_zbase: a trailing int32 SMEM operand
    carries the global z of local row 0 (z-sharded use; Z is then the
    GLOBAL depth)."""
    has_vel = mu is not None
    BH = BZ + 2 * _H
    TH = TYf + 2 * _HF

    def kernel(*refs):
        refs = list(refs)
        scal_ref = refs.pop(0)
        zb_ref = refs.pop(0) if with_zbase else None
        xm_ref = refs.pop(0) if use_xmats else None
        if has_vel:
            (psi_ref, tnp_ref, tg_ref, live_ref, vel_ref,
             psi_out, tnp_out, vel_out, mx_out, *rest) = refs
        else:
            (psi_ref, tnp_ref, tg_ref, live_ref,
             psi_out, tnp_out, mx_out, *rest) = refs
            vel_ref = vel_out = s_vel = None
        e_out = rest.pop(0) if with_energy else None
        if has_vel:
            (s_psi, s_tnp, s_tg, s_live, s_vel, sems) = rest
        else:
            (s_psi, s_tnp, s_tg, s_live, sems) = rest

        iz = pl.program_id(0)
        slot = jax.lax.rem(iz, 2)
        alpha = scal_ref[0]
        w_reg = scal_ref[1]

        def tile_copies(f, s):
            zs = f * BZ
            cps = [
                pltpu.make_async_copy(
                    psi_ref.at[:, pl.ds(zs, BH), :, :], s_psi.at[s],
                    sems.at[s, 0],
                ),
                pltpu.make_async_copy(
                    tnp_ref.at[pl.ds(zs, BH), :, :], s_tnp.at[s],
                    sems.at[s, 1],
                ),
                pltpu.make_async_copy(
                    tg_ref.at[pl.ds(zs, BH), :, :], s_tg.at[s],
                    sems.at[s, 2],
                ),
                pltpu.make_async_copy(
                    live_ref.at[pl.ds(zs, BH), :, :], s_live.at[s],
                    sems.at[s, 3],
                ),
            ]
            if has_vel:
                cps.append(
                    pltpu.make_async_copy(
                        vel_ref.at[:, pl.ds(zs, BZ), :, :], s_vel.at[s],
                        sems.at[s, 4],
                    )
                )
            return cps

        @pl.when(iz == 0)
        def _():
            for c in tile_copies(0, 0):
                c.start()

        @pl.when(iz + 1 < n_tiles)
        def _():
            for c in tile_copies(iz + 1, 1 - slot):
                c.start()

        for c in tile_copies(iz, slot):
            c.wait()

        _gd_tile_compute_fold(
            s_psi.at[slot], s_tnp.at[slot], s_tg.at[slot],
            lambda oz: s_live[slot, pl.ds(_H + oz, BZ), :, :],
            (lambda c: s_vel[slot, c]) if has_vel else None,
            psi_out, tnp_out, vel_out if has_vel else None, mx_out,
            iz, alpha, w_reg,
            BZ=BZ, TYf=TYf, Z=Z, Y=Y, X=X, K=K, taps=taps, n_taps=n_taps,
            mu=mu, e_out=e_out,
            z_base=zb_ref[0] if with_zbase else None,
            xmats=(
                (xm_ref[0], xm_ref[1], xm_ref[2]) if use_xmats else None
            ),
            xmats_precision=xmats_precision,
        )

    return kernel


def fused_gd_iteration_fold(
    psi_f: jnp.ndarray,  # f32[3, Z, Yf, 2X] FOLDED, unpadded
    tnp_f: jnp.ndarray,  # f32[Z, Yf, 2X]
    vel,  # f32[3, Z, Yf, 2X] or None
    tg_pad: jnp.ndarray,  # pad_for_fold output (loop-invariant)
    live_pad: jnp.ndarray,  # pad_for_fold output (loop-invariant)
    alpha: jnp.ndarray,
    w_reg: jnp.ndarray,
    taps_static: Tuple[float, ...],
    *,
    K: int = 2,
    BZ: int = 0,
    momentum=None,
    interpret: bool = False,
    with_energy: bool = False,
    use_xmats: bool = False,
    xmats_precision=None,
):
    """One fused solver iteration in the Y-FOLDED layout: returns
    (psi_f', tnp_f', vel', max||update||^2, e_data) on UNPADDED folded
    arrays (the per-iteration pad is rebuilt here — at 64^3 the padded
    buffers are ~1 MB, so the copy is noise). Numerics identical to the
    lane-packed kernel / XLA window step."""
    return fused_gd_iteration_fold_padded(
        pad_folded(psi_f), pad_folded(tnp_f), vel, tg_pad, live_pad,
        alpha, w_reg, taps_static, K=K, BZ=BZ, momentum=momentum,
        interpret=interpret, with_energy=with_energy,
        use_xmats=use_xmats, xmats_precision=xmats_precision,
    )


def fused_gd_iteration_fold_padded(
    psi_pad: jnp.ndarray,  # f32[3, Z+2_H, Yf+2_HF, 2X] folded, padded
    tnp_pad: jnp.ndarray,  # f32[Z+2_H, Yf+2_HF, 2X]
    vel,  # f32[3, Z, Yf, 2X] or None (UNPADDED)
    tg_pad: jnp.ndarray,  # pad_for_fold-layout (loop-invariant)
    live_pad: jnp.ndarray,  # pad_for_fold-layout (loop-invariant)
    alpha: jnp.ndarray,
    w_reg: jnp.ndarray,
    taps_static: Tuple[float, ...],
    *,
    K: int = 2,
    BZ: int = 0,
    momentum=None,
    interpret: bool = False,
    with_energy: bool = False,
    z_base=None,
    z_global: int = 0,
    use_xmats: bool = False,
    xmats_precision=None,
):
    """Fold-kernel iteration on CALLER-padded arrays. Single-chip callers
    build the pads with :func:`pad_folded` (edge-replicated halos); a
    z-SHARDED caller feeds ICI-halo-exchanged z rows instead and passes
    z_base (traced global z of local row 0) + z_global (global depth) so
    the kernel's boundary masks and warp clamps act in GLOBAL coordinates
    — the fold counterpart of :func:`fused_gd_iteration_db_padded`'s
    z_base/z_global contract. Returns UNPADDED folded outputs."""
    _, ZP, YP, XF = psi_pad.shape
    Z, Yf = ZP - 2 * _H, YP - 2 * _HF
    X = XF // 2
    Y = Yf * 2
    n_taps = len(taps_static)
    assert n_taps % 2 == 1 and n_taps <= 2 * _H - 1
    assert 1 <= K <= _H
    assert XF == 128, "fold kernel packs X=64 into 128 lanes"
    if not BZ:
        BZ = 16
        while Z % BZ:
            BZ //= 2
    assert Z % BZ == 0
    nz = Z // BZ
    mu = float(momentum) if momentum is not None else None
    with_zbase = z_base is not None

    kernel = _make_fold_kernel(
        BZ, Yf, z_global if with_zbase else Z, Y, X, K, taps_static,
        n_taps, mu, nz, with_energy=with_energy, with_zbase=with_zbase,
        use_xmats=use_xmats, xmats_precision=xmats_precision,
    )
    BH = BZ + 2 * _H
    TH = Yf + 2 * _HF

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    if with_zbase:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    if use_xmats:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    in_specs += [pl.BlockSpec(memory_space=pl.ANY)] * (
        5 if mu is not None else 4
    )
    out_specs = [
        pl.BlockSpec((3, BZ, Yf, XF), lambda i: (0, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((BZ, Yf, XF), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((3, Z, Yf, XF), jnp.float32),
        jax.ShapeDtypeStruct((Z, Yf, XF), jnp.float32),
    ]
    if mu is not None:
        out_specs.append(
            pl.BlockSpec((3, BZ, Yf, XF), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        out_shapes.append(jax.ShapeDtypeStruct((3, Z, Yf, XF), jnp.float32))
    out_specs.append(
        pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM)
    )
    out_shapes.append(jax.ShapeDtypeStruct((nz, 8, 128), jnp.float32))
    if with_energy:
        out_specs.append(
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        out_shapes.append(jax.ShapeDtypeStruct((nz, 8, 128), jnp.float32))

    scratch = [
        pltpu.VMEM((2, 3, BH, TH, XF), jnp.float32),  # s_psi
        pltpu.VMEM((2, BH, TH, XF), jnp.float32),  # s_tnp
        pltpu.VMEM((2, BH, TH, XF), jnp.float32),  # s_tg
        pltpu.VMEM((2, BH, TH, XF), jnp.float32),  # s_live
    ]
    n_in = 4
    if mu is not None:
        scratch.append(pltpu.VMEM((2, 3, BZ, Yf, XF), jnp.float32))
        n_in = 5
    scratch.append(pltpu.SemaphoreType.DMA((2, n_in)))

    # scoped-vmem: double-buffered halo tiles + out blocks + body temps
    halo_f = BH * TH * XF
    out_f = BZ * Yf * XF
    need = 2 * 6 * halo_f + (8 if mu is not None else 5) * out_f * 2
    need += (2 * (2 * K + 1) + 8) * out_f + 6 * (BZ + 6) * (Yf + 4) * XF
    vmem_mb = min(110, max(32, (4 * need >> 20) + 8))
    cparams = (
        {"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb << 20)}
        if not interpret
        else {}
    )

    scal = jnp.stack([alpha.astype(jnp.float32), w_reg.astype(jnp.float32)])
    args = [scal]
    if with_zbase:
        args.append(jnp.asarray([z_base], jnp.int32))
    if use_xmats:
        args.append(jnp.asarray(_x_matrices_fold(taps_static, X)))
    args += [psi_pad, tnp_pad, tg_pad, live_pad]
    if mu is not None:
        args.append(vel)

    outs = list(pl.pallas_call(
        kernel,
        grid=(nz,),
        in_specs=tuple(in_specs),
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        scratch_shapes=scratch,
        interpret=interpret,
        **cparams,
    )(*args))

    e_data = None
    if with_energy:
        e_tiles = outs.pop()
        e_data = 0.5 * jnp.sum(e_tiles[:, 0, 0])
    if mu is not None:
        psi_new, tnp_new, vel_new, mx_tiles = outs
    else:
        psi_new, tnp_new, mx_tiles = outs
        vel_new = None
    return psi_new, tnp_new, vel_new, jnp.max(mx_tiles), e_data


@functools.partial(
    jax.jit,
    static_argnames=("K", "BZ", "TY", "taps_static", "interpret"),
)
def fused_gd_step(
    psi: jnp.ndarray,  # f32[3, Z, Y, X]
    tnp: jnp.ndarray,  # f32[Z, Y, X]
    tg: jnp.ndarray,  # f32[Z, Y, X]
    live: jnp.ndarray,  # f32[Z, Y, X]
    alpha: jnp.ndarray,
    w_reg: jnp.ndarray,
    taps_static: Tuple[float, ...],
    K: int = 3,
    BZ: int = 8,
    TY: int = 0,
    interpret: bool = False,
):
    """One fused solver iteration. Returns (psi', tnp', max||update||^2).

    Compatibility wrapper over :func:`fused_gd_iteration_db` (the single
    maintained fused-iteration body — the original round-1 manual-DMA
    kernel without double buffering was superseded by it and removed).
    Unlike the production loop path this pads psi/tnp on every call; use
    :func:`fused_gd_iteration_db_padded` + :func:`refresh_padded` inside
    solver loops.
    """
    psi_new, tnp_new, _, mx_sq = fused_gd_iteration_db(
        psi, tnp, None, pad_for_db(tg), pad_for_db(live), alpha, w_reg,
        taps_static, K=K, BZ=BZ, TY=TY, momentum=None, interpret=interpret,
    )
    return psi_new, tnp_new, mx_sq


def estimate_inverse_window_pallas(
    psi: jnp.ndarray,
    iters: int = 48,
    K: int = 2,
    BZ: int = 0,
    init=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fixed-point inverse (vector_fields.cu:111-138 semantics) with each
    displacement interpolation running as the pipelined Pallas window-warp
    kernel — the TPU tail-path companion of fields.estimate_inverse_window
    (same window semantics, C=3 field sampling per step). ``init`` warm-
    starts the iteration (previous frame's inverse); None = identity.

    The loop-invariant displacement tiles are pre-stacked ONCE and the
    ``ident -`` epilogue is fused into the kernel (sub_ident), so each
    fixed-point step is exactly one pallas pass over psi_inv."""
    dims = psi.shape[1:]
    Z, Y, X = dims
    zz = jax.lax.broadcasted_iota(jnp.float32, dims, 0)
    yy = jax.lax.broadcasted_iota(jnp.float32, dims, 1)
    xx = jax.lax.broadcasted_iota(jnp.float32, dims, 2)
    ident = jnp.stack([xx, yy, zz], axis=0)
    disp = psi - ident
    BZr, TY = _warp_tiling(Z, Y, X, K, BZ, 0)
    disp_t = prestack_warp_vol(disp, K, BZr, TY)

    def body(_, psi_inv):
        return _window_warp_stacked(
            disp_t, psi_inv, K=K, BZ=BZr, TY=TY, sub_ident=True,
            interpret=interpret,
        )

    return jax.lax.fori_loop(0, iters, body, ident if init is None else init)


# ---------------------------------------------------------------------------
# BlockSpec-stacked fused iteration for small grids (lane extent < 128)
# ---------------------------------------------------------------------------
#
# The manual-DMA double-buffered kernel fails Mosaic compilation when the
# lane extent is below 128 (minimal repro: a bare double-buffered copy with
# X=64 slices dies in the compile helper, while every individual construct
# and the BlockSpec-pipelined warp kernel compile fine at 64 lanes). A
# whole-volume grid=() variant also fails for >= 32^3 (the fully-unrolled
# body's vreg count blows up the Mosaic compiler). This variant therefore
# keeps the proven tile geometry and compute body but feeds the halo tiles
# through the standard BlockSpec pipeline: inputs are pre-stacked into
# overlapping (z, y)-tiles (as in window_warp_pallas) and the pipeline
# double-buffers them automatically. The per-iteration stack rebuild for
# psi/tnp is ~3 volume copies — trivial at the <= 64^3 sizes this serves.


def _stack_db(vol: jnp.ndarray, BZ: int = 8, TY: int = 0) -> jnp.ndarray:
    """Edge-pad by the fixed halo and stack overlapping (z, y)-tiles for
    :func:`fused_gd_iteration_stacked` (channel dim added for scalars)."""
    squeeze = vol.ndim == 3
    if squeeze:
        vol = vol[None]
    C, Z, Y, X = vol.shape
    if TY == 0:
        TY = min(32, Y)
    vol_pad = jnp.pad(
        vol, [(0, 0), (_H, _H), (_H, _H), (0, 0)], mode="edge"
    )
    return _stack_overlapping_zy(vol_pad, Z // BZ, Y // TY, BZ, TY, _H)


def fused_gd_iteration_stacked(
    psi: jnp.ndarray,  # f32[3, Z, Y, X]
    tnp: jnp.ndarray,  # f32[Z, Y, X]
    vel,  # f32[3, Z, Y, X] or None
    tg_t: jnp.ndarray,  # stacked tiles of tg (loop-invariant; _stack_db)
    live_t: jnp.ndarray,  # stacked tiles of live (loop-invariant)
    alpha: jnp.ndarray,
    w_reg: jnp.ndarray,
    taps_static: Tuple[float, ...],
    *,
    K: int = 2,
    BZ: int = 8,
    TY: int = 0,
    momentum=None,
    interpret: bool = False,
):
    """One fused solver iteration for small grids via BlockSpec stacking.

    Same compute body (and numbers) as :func:`fused_gd_iteration_db`;
    returns (psi', tnp', vel', max||update||^2).
    """
    Z, Y, X = tnp.shape
    if TY == 0:
        TY = min(32, Y)
    n_taps = len(taps_static)
    assert n_taps % 2 == 1 and n_taps <= 2 * _H - 1
    assert 1 <= K <= _H
    assert Z % BZ == 0 and Y % TY == 0 and TY % 8 == 0, (Z, BZ, Y, TY)
    nz, ny = Z // BZ, Y // TY
    mu = float(momentum) if momentum is not None else None
    has_vel = mu is not None

    psi_t = _stack_db(psi, BZ, TY)
    tnp_t = _stack_db(tnp, BZ, TY)

    def kernel(*refs):
        if has_vel:
            (scal_ref, psi_ref, tnp_ref, tg_ref, live_ref, vel_ref,
             psi_out, tnp_out, vel_out, mx_out) = refs
        else:
            (scal_ref, psi_ref, tnp_ref, tg_ref, live_ref,
             psi_out, tnp_out, mx_out) = refs
        _gd_tile_compute(
            psi_ref.at[0, 0], tnp_ref.at[0, 0, 0], tg_ref.at[0, 0, 0],
            lambda oz: live_ref[0, 0, 0, pl.ds(_H + oz, BZ), :, :],
            (lambda c: vel_ref[c]) if has_vel else None,
            psi_out, tnp_out, vel_out if has_vel else None, mx_out,
            pl.program_id(0), pl.program_id(1), scal_ref[0], scal_ref[1],
            BZ=BZ, TY=TY, Z=Z, Y=Y, X=X, K=K, taps=taps_static,
            n_taps=n_taps, mu=mu,
        )

    TH = TY + 2 * _H
    BH = BZ + 2 * _H

    def tile6(c_extent):
        return pl.BlockSpec(
            (1, 1, c_extent, BH, TH, X),
            lambda i, j: (i, j, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        tile6(3),
        tile6(1),
        tile6(1),
        tile6(1),
    ]
    scal = jnp.stack([alpha.astype(jnp.float32), w_reg.astype(jnp.float32)])
    args = [scal, psi_t, tnp_t, tg_t, live_t]
    out_specs = [
        pl.BlockSpec(
            (3, BZ, TY, X), lambda i, j: (0, i, j, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (BZ, TY, X), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((3, Z, Y, X), jnp.float32),
        jax.ShapeDtypeStruct((Z, Y, X), jnp.float32),
    ]
    if has_vel:
        in_specs.append(
            pl.BlockSpec(
                (3, BZ, TY, X), lambda i, j: (0, i, j, 0),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(vel)
        out_specs.append(out_specs[0])
        out_shapes.append(out_shapes[0])
    out_specs.append(
        pl.BlockSpec(
            (1, 1, 8, 128), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        )
    )
    out_shapes.append(jax.ShapeDtypeStruct((nz, ny, 8, 128), jnp.float32))

    outs = pl.pallas_call(
        kernel,
        grid=(nz, ny),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        interpret=interpret,
    )(*args)
    if has_vel:
        psi_new, tnp_new, vel_new, mx_tiles = outs
    else:
        psi_new, tnp_new, mx_tiles = outs
        vel_new = None
    return psi_new, tnp_new, vel_new, jnp.max(mx_tiles)


# ---------------------------------------------------------------------------
# ping-pong fused GD iteration (V3 state flow: no per-iteration refresh)
# ---------------------------------------------------------------------------
#
# Profiling the double-buffered kernel's production loop at 256^3 shows
# ~2.5 ms/iter spent OUTSIDE the kernel in refresh_padded: XLA cannot prove
# the dynamic_update_slice on the loop-carried padded buffer may alias
# through the pallas custom-call, so it copies the whole 214 MB buffer
# every iteration. This variant eliminates the refresh entirely: the loop
# carries ONLY edge-padded arrays with halo _HP = 8 (a sublane multiple),
# and the kernel WRITES the padded output itself through ANY-memory-space
# outputs via explicit VMEM->HBM DMAs — center blocks land at offsets
# (_HP + i*BZ, _HP + j*TY) which are 8-aligned by construction, and
# boundary tiles additionally write their adjacent halo strips as replicas
# of their own edge voxels (exactly the data refresh_padded maintained).
# Input tiles read (BZ+16, TY+16) slices at aligned starts; the compute
# body is the shared _gd_tile_compute with H=8.

_HP = 8  # ping-pong halo: >= _H and a sublane multiple, so padded-state
# write offsets stay aligned


def pad_for_pp(vol: jnp.ndarray, x_to: int = 0) -> jnp.ndarray:
    """Edge-pad a volume by the ping-pong halo (+ optional lane packing)."""
    lead = [(0, 0)] * (vol.ndim - 3)
    xp = max(0, x_to - vol.shape[-1]) if x_to else 0
    return jnp.pad(vol, lead + [(_HP, _HP), (_HP, _HP), (0, xp)], mode="edge")


def unpad_pp(buf: jnp.ndarray, x_logical: int = 0) -> jnp.ndarray:
    """Interior of an _HP-edge-padded array (x sliced if lane-packed)."""
    nd = buf.ndim
    sl = (Ellipsis, slice(_HP, buf.shape[nd - 3] - _HP),
          slice(_HP, buf.shape[nd - 2] - _HP),
          slice(None, x_logical or None))
    return buf[sl]


def stack_live_shifts(live_pad: jnp.ndarray, K: int,
                      x_logical: int = 0) -> jnp.ndarray:
    """(Z', Y', X) padded live volume -> (2K+1, Z', Y', X) stack of
    edge-clamped x-shifts (shift ox at index ox+K). Loop-invariant: built
    once per solve, so the warp's per-tile lane rolls become direct reads."""
    XL = x_logical or live_pad.shape[-1]
    idx_all = np.arange(live_pad.shape[-1])
    outs = [
        live_pad[..., np.clip(idx_all + ox, 0, XL - 1)]
        for ox in range(-K, K + 1)
    ]
    return jnp.stack(outs, axis=0)


def _x_matrices(taps_static, XP: int, XL: int) -> np.ndarray:
    """(3, XP, XP) stacked lane-axis operators for the MXU path: Sobolev
    x-convolution (edge-clamped replicate pad), x central difference and x
    second difference with the boundary-vanishing masks folded into the
    output columns. out[.., x] = sum_x' a[.., x'] * M[x', x]."""
    n = len(taps_static)
    R = n // 2
    bx = np.zeros((XP, XP), np.float32)
    gx = np.zeros((XP, XP), np.float32)
    lx = np.zeros((XP, XP), np.float32)
    for x in range(XP):
        for k in range(n):
            src_ = min(max(x + k - R, 0), XL - 1)
            bx[src_, x] += taps_static[n - 1 - k]
        m = 1.0 if 0 < x < XL - 1 else 0.0
        gx[min(x + 1, XL - 1), x] += 0.5 * m
        gx[max(x - 1, 0), x] -= 0.5 * m
        lx[min(x + 1, XL - 1), x] += m
        lx[max(x - 1, 0), x] += m
        lx[x, x] -= 2.0 * m
    return np.stack([bx, gx, lx])


def _x_matrices_fold(taps_static, X: int) -> np.ndarray:
    """Block-diagonal (3, 2X, 2X) lane-axis operators for the FOLDED
    layout: each 64-lane segment is an independent x-row, so the fold
    kernel's x-conv / x-diff / x-second-diff are the :func:`_x_matrices`
    blocks repeated on both diagonal blocks (segment-local edge clamps
    and boundary masks included)."""
    m = _x_matrices(taps_static, X, X)
    out = np.zeros((3, 2 * X, 2 * X), np.float32)
    out[:, :X, :X] = m
    out[:, X:, X:] = m
    return out


def _make_pp_kernel(BZ, TY, Z, Y, X, K, taps, n_taps, mu, nz, ny, XL,
                    stacked=False, use_xmats=False, with_energy=False):
    """Ping-pong kernel body: double-buffered input DMA (as _make_db_kernel)
    + explicit padded-state output DMA with boundary replica strips.

    stacked: the live input is a (2K+1)-stack of pre-x-shifted volumes.
    use_xmats: an extra (3, X, X) VMEM input carries the lane-axis
    conv/diff operators evaluated on the MXU."""
    H = _HP
    TH = TY + 2 * H
    BH = BZ + 2 * H
    has_vel = mu is not None
    n_tiles = nz * ny
    NS = 2 * K + 1 if stacked else 1

    def kernel(*refs):
        refs = list(refs)
        scal_ref = refs.pop(0)
        xm_ref = refs.pop(0) if use_xmats else None
        if has_vel:
            (psi_ref, tnp_ref, tg_ref, live_ref, vel_ref,
             psi_out, tnp_out, vel_out, mx_out, *rest) = refs
        else:
            (psi_ref, tnp_ref, tg_ref, live_ref,
             psi_out, tnp_out, mx_out, *rest) = refs
            vel_ref = vel_out = s_vel = None
        e_out = rest.pop(0) if with_energy else None
        if has_vel:
            (s_psi, s_tnp, s_tg, s_live, s_vel, s_po, s_to,
             s_zs_p, s_zs_t, s_ys_p, s_ys_t, s_cs_p, s_cs_t,
             in_sems, out_sems) = rest
        else:
            (s_psi, s_tnp, s_tg, s_live, s_po, s_to,
             s_zs_p, s_zs_t, s_ys_p, s_ys_t, s_cs_p, s_cs_t,
             in_sems, out_sems) = rest

        iz = pl.program_id(0)
        iy = pl.program_id(1)
        flat = iz * ny + iy
        slot = jax.lax.rem(flat, 2)
        alpha = scal_ref[0]
        w_reg = scal_ref[1]

        def in_copies(f, s):
            izf = f // ny
            iyf = jax.lax.rem(f, ny)
            zs = izf * BZ
            ys = iyf * TY
            cps = [
                pltpu.make_async_copy(
                    psi_ref.at[:, pl.ds(zs, BH), pl.ds(ys, TH), :],
                    s_psi.at[s], in_sems.at[s, 0],
                ),
                pltpu.make_async_copy(
                    tnp_ref.at[pl.ds(zs, BH), pl.ds(ys, TH), :],
                    s_tnp.at[s], in_sems.at[s, 1],
                ),
                pltpu.make_async_copy(
                    tg_ref.at[pl.ds(zs, BH), pl.ds(ys, TH), :],
                    s_tg.at[s], in_sems.at[s, 2],
                ),
                pltpu.make_async_copy(
                    (
                        live_ref.at[:, pl.ds(zs, BH), pl.ds(ys, TH), :]
                        if stacked
                        else live_ref.at[pl.ds(zs, BH), pl.ds(ys, TH), :]
                    ),
                    s_live.at[s], in_sems.at[s, 3],
                ),
            ]
            if has_vel:
                cps.append(
                    pltpu.make_async_copy(
                        vel_ref.at[:, pl.ds(zs, BZ), pl.ds(ys, TY), :],
                        s_vel.at[s], in_sems.at[s, 4],
                    )
                )
            return cps

        def out_copies(f, s):
            """(copy, condition) pairs for tile f's padded-state writes.
            condition None = unconditional. Strip writes replicate the
            tile's own edge voxels into the adjacent halo regions —
            exactly the data refresh_padded maintained."""
            izf = f // ny
            iyf = jax.lax.rem(f, ny)
            zs = izf * BZ
            ys = iyf * TY
            zlo, zhi = izf == 0, izf == nz - 1
            ylo, yhi = iyf == 0, iyf == ny - 1
            out = [
                # center blocks (aligned: H + k*8-multiples)
                (pltpu.make_async_copy(
                    s_po.at[s],
                    psi_out.at[:, pl.ds(H + zs, BZ), pl.ds(H + ys, TY), :],
                    out_sems.at[s, 0]), None),
                (pltpu.make_async_copy(
                    s_to.at[s],
                    tnp_out.at[pl.ds(H + zs, BZ), pl.ds(H + ys, TY), :],
                    out_sems.at[s, 1]), None),
                # z halo strips (rows [0,H) / [H+Z, H+Z+H))
                (pltpu.make_async_copy(
                    s_zs_p.at[s],
                    psi_out.at[:, pl.ds(0, H), pl.ds(H + ys, TY), :],
                    out_sems.at[s, 2]), zlo),
                (pltpu.make_async_copy(
                    s_zs_t.at[s],
                    tnp_out.at[pl.ds(0, H), pl.ds(H + ys, TY), :],
                    out_sems.at[s, 3]), zlo),
                (pltpu.make_async_copy(
                    s_zs_p.at[s],
                    psi_out.at[:, pl.ds(H + Z, H), pl.ds(H + ys, TY), :],
                    out_sems.at[s, 2]), zhi),
                (pltpu.make_async_copy(
                    s_zs_t.at[s],
                    tnp_out.at[pl.ds(H + Z, H), pl.ds(H + ys, TY), :],
                    out_sems.at[s, 3]), zhi),
                # y halo strips (cols [0,H) / [H+Y, H+Y+H))
                (pltpu.make_async_copy(
                    s_ys_p.at[s],
                    psi_out.at[:, pl.ds(H + zs, BZ), pl.ds(0, H), :],
                    out_sems.at[s, 4]), ylo),
                (pltpu.make_async_copy(
                    s_ys_t.at[s],
                    tnp_out.at[pl.ds(H + zs, BZ), pl.ds(0, H), :],
                    out_sems.at[s, 5]), ylo),
                (pltpu.make_async_copy(
                    s_ys_p.at[s],
                    psi_out.at[:, pl.ds(H + zs, BZ), pl.ds(H + Y, H), :],
                    out_sems.at[s, 4]), yhi),
                (pltpu.make_async_copy(
                    s_ys_t.at[s],
                    tnp_out.at[pl.ds(H + zs, BZ), pl.ds(H + Y, H), :],
                    out_sems.at[s, 5]), yhi),
                # corner blocks (z-halo x y-halo regions)
                (pltpu.make_async_copy(
                    s_cs_p.at[s],
                    psi_out.at[:, pl.ds(0, H), pl.ds(0, H), :],
                    out_sems.at[s, 6]), zlo & ylo),
                (pltpu.make_async_copy(
                    s_cs_t.at[s],
                    tnp_out.at[pl.ds(0, H), pl.ds(0, H), :],
                    out_sems.at[s, 7]), zlo & ylo),
                (pltpu.make_async_copy(
                    s_cs_p.at[s],
                    psi_out.at[:, pl.ds(0, H), pl.ds(H + Y, H), :],
                    out_sems.at[s, 6]), zlo & yhi),
                (pltpu.make_async_copy(
                    s_cs_t.at[s],
                    tnp_out.at[pl.ds(0, H), pl.ds(H + Y, H), :],
                    out_sems.at[s, 7]), zlo & yhi),
                (pltpu.make_async_copy(
                    s_cs_p.at[s],
                    psi_out.at[:, pl.ds(H + Z, H), pl.ds(0, H), :],
                    out_sems.at[s, 6]), zhi & ylo),
                (pltpu.make_async_copy(
                    s_cs_t.at[s],
                    tnp_out.at[pl.ds(H + Z, H), pl.ds(0, H), :],
                    out_sems.at[s, 7]), zhi & ylo),
                (pltpu.make_async_copy(
                    s_cs_p.at[s],
                    psi_out.at[:, pl.ds(H + Z, H), pl.ds(H + Y, H), :],
                    out_sems.at[s, 6]), zhi & yhi),
                (pltpu.make_async_copy(
                    s_cs_t.at[s],
                    tnp_out.at[pl.ds(H + Z, H), pl.ds(H + Y, H), :],
                    out_sems.at[s, 7]), zhi & yhi),
            ]
            if has_vel:
                pass  # vel rides the standard output pipeline
            return out

        def start_out(f, s):
            for cp, cond in out_copies(f, s):
                if cond is None:
                    cp.start()
                else:
                    @pl.when(cond)
                    def _(cp=cp):
                        cp.start()

        def wait_out(f, s):
            for cp, cond in out_copies(f, s):
                if cond is None:
                    cp.wait()
                else:
                    @pl.when(cond)
                    def _(cp=cp):
                        cp.wait()

        # ---- input double buffering (as in the db kernel) ----
        @pl.when(flat == 0)
        def _():
            for c in in_copies(0, 0):
                c.start()

        @pl.when(flat + 1 < n_tiles)
        def _():
            for c in in_copies(flat + 1, 1 - slot):
                c.start()

        for c in in_copies(flat, slot):
            c.wait()

        # before computing into output slot `slot`, its previous user's
        # DMAs (tile flat-2) must have drained
        @pl.when(flat >= 2)
        def _():
            wait_out(flat - 2, slot)

        xm = (xm_ref[0], xm_ref[1], xm_ref[2]) if use_xmats else None
        _gd_tile_compute(
            s_psi.at[slot], s_tnp.at[slot], s_tg.at[slot],
            (
                None if stacked
                else (lambda oz: s_live[slot, pl.ds(H + oz, BZ), :, :])
            ),
            (lambda c: s_vel[slot, c]) if has_vel else None,
            s_po.at[slot], s_to.at[slot],
            vel_out if has_vel else None, mx_out,
            iz, iy, alpha, w_reg,
            BZ=BZ, TY=TY, Z=Z, Y=Y, X=X, K=K, taps=taps, n_taps=n_taps,
            mu=mu, XL=XL, H=H,
            live_x=(
                (lambda oz, ox: s_live[slot, ox + K, pl.ds(H + oz, BZ), :, :])
                if stacked
                else None
            ),
            xmats=xm,
            e_out=e_out,
        )

        # ---- boundary replica strips from the freshly computed center ----
        zlo, zhi = iz == 0, iz == nz - 1
        ylo, yhi = iy == 0, iy == ny - 1

        @pl.when(zlo)
        def _():
            row_p = s_po[slot, :, 0:1, :, :]
            row_t = s_to[slot, 0:1, :, :]
            s_zs_p[slot] = jnp.broadcast_to(row_p, (3, H, TY, X))
            s_zs_t[slot] = jnp.broadcast_to(row_t, (H, TY, X))

        @pl.when(zhi)
        def _():
            row_p = s_po[slot, :, BZ - 1:BZ, :, :]
            row_t = s_to[slot, BZ - 1:BZ, :, :]
            s_zs_p[slot] = jnp.broadcast_to(row_p, (3, H, TY, X))
            s_zs_t[slot] = jnp.broadcast_to(row_t, (H, TY, X))

        @pl.when(ylo)
        def _():
            col_p = s_po[slot, :, :, 0:1, :]
            col_t = s_to[slot, :, 0:1, :]
            s_ys_p[slot] = jnp.broadcast_to(col_p, (3, BZ, H, X))
            s_ys_t[slot] = jnp.broadcast_to(col_t, (BZ, H, X))

        @pl.when(yhi)
        def _():
            col_p = s_po[slot, :, :, TY - 1:TY, :]
            col_t = s_to[slot, :, TY - 1:TY, :]
            s_ys_p[slot] = jnp.broadcast_to(col_p, (3, BZ, H, X))
            s_ys_t[slot] = jnp.broadcast_to(col_t, (BZ, H, X))

        @pl.when((zlo | zhi) & (ylo | yhi))
        def _():
            zi = jnp.where(zlo, 0, BZ - 1)
            yi = jnp.where(ylo, 0, TY - 1)
            # corner voxel: dynamic z (major) + the y pick via the already
            # built y-strip (static sublane index 0 of the H-wide strip)
            del yi  # the y side is already baked into the y-strip
            crn_p = s_ys_p[slot, :, pl.ds(zi, 1), 0:1, :]
            crn_t = s_ys_t[slot, pl.ds(zi, 1), 0:1, :]
            s_cs_p[slot] = jnp.broadcast_to(crn_p, (3, H, H, X))
            s_cs_t[slot] = jnp.broadcast_to(crn_t, (H, H, X))

        start_out(flat, slot)

        # drain everything at the end (tiles flat-1 and flat)
        @pl.when(flat == n_tiles - 1)
        def _():
            wait_out(flat, slot)
            if n_tiles >= 2:
                wait_out(flat - 1, 1 - slot)

    return kernel


def fused_gd_iteration_pp(
    psi_pad: jnp.ndarray,  # f32[3, Z+2*_HP, Y+2*_HP, X] (pad_for_pp)
    tnp_pad: jnp.ndarray,  # f32[Z+2*_HP, Y+2*_HP, X]
    vel,  # f32[3, Z, Y, X] or None
    tg_pad: jnp.ndarray,  # loop-invariant, pad_for_pp
    live_pad: jnp.ndarray,  # loop-invariant, pad_for_pp
    alpha: jnp.ndarray,
    w_reg: jnp.ndarray,
    taps_static: Tuple[float, ...],
    *,
    K: int = 2,
    BZ: int = 0,
    TY: int = 0,
    momentum=None,
    interpret: bool = False,
    x_logical: int = 0,
    vmem_limit_mb: int = 0,
    use_xmats: bool = False,
    with_energy: bool = False,
):
    """One fused solver iteration with PING-PONG padded state: returns
    (psi_pad', tnp_pad', vel', max||update||^2, e_data) where the padded
    outputs are ready to feed straight back in — no refresh step. Numerics
    identical to :func:`fused_gd_iteration_db_padded` +
    :func:`refresh_padded` (MXU x-operators reassociate lane sums — f32
    round-off level).

    with_energy: also return e_data = 0.5*sum((tnp'-tg)^2) (the reference's
    data energy, reductor.cpp:38-43) accumulated from in-kernel per-tile
    partials; None otherwise. In-kernel because any outside consumer of the
    loop-carried padded buffers forces XLA to copy them every iteration
    (the custom-call may alias them) — measured ~2x per-iteration cost.

    live_pad may be either the (Z', Y', X) padded live volume or the
    (2K+1, Z', Y', X) pre-shifted stack from :func:`stack_live_shifts`.
    use_xmats: evaluate the x-axis convolution/stencils as MXU matmuls.
    BOTH measured SLOWER than the plain VPU body on v5e at 128^3/256^3
    (head-to-head device traces 2026-08-17: plain 0.63 ms/iter, +23%
    xmats, +26% stack — the f32 banded matmul wastes X/s of its FLOPs and
    the stack adds ~70% live DMA) — kept as measured options, off by
    default.
    """
    H = _HP
    stacked = live_pad.ndim == 4
    Z, Y, X = (
        tnp_pad.shape[0] - 2 * H,
        tnp_pad.shape[1] - 2 * H,
        tnp_pad.shape[2],
    )
    if not BZ or not TY:
        dBZ, dTY = _db_tiles(Z, Y, X)
        BZ = BZ or dBZ
        TY = TY or dTY
    n_taps = len(taps_static)
    assert n_taps % 2 == 1 and n_taps <= 2 * _H - 1
    assert 1 <= K <= _H, f"window K={K} must fit the compute halo {_H}"
    assert Z % BZ == 0 and Y % TY == 0 and TY % 8 == 0, (Z, BZ, Y, TY)
    assert tg_pad.shape == (Z + 2 * H, Y + 2 * H, X)

    nz, ny = Z // BZ, Y // TY
    # the lo/hi edge strips of one axis share scratch+semaphores; a tile
    # that is BOTH (single-tile axis) would race its own strip DMA
    assert nz >= 2 and ny >= 2, (
        f"ping-pong kernel needs >= 2 tiles per axis (nz={nz}, ny={ny}); "
        "use fused_gd_iteration_db_padded for single-tile grids"
    )
    grid = (nz, ny)
    mu = float(momentum) if momentum is not None else None
    kernel = _make_pp_kernel(
        BZ, TY, Z, Y, X, K, taps_static, n_taps, mu, nz, ny, x_logical,
        stacked=stacked, use_xmats=use_xmats, with_energy=with_energy,
    )

    TH = TY + 2 * H
    BH = BZ + 2 * H
    NS = 2 * K + 1 if stacked else 1

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    if use_xmats:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    in_specs += [
        pl.BlockSpec(memory_space=pl.ANY)
    ] * (5 if mu is not None else 4)
    out_specs = [
        pl.BlockSpec(memory_space=pl.ANY),  # psi_pad'
        pl.BlockSpec(memory_space=pl.ANY),  # tnp_pad'
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((3, Z + 2 * H, Y + 2 * H, X), jnp.float32),
        jax.ShapeDtypeStruct((Z + 2 * H, Y + 2 * H, X), jnp.float32),
    ]
    if mu is not None:
        out_specs.append(
            pl.BlockSpec(
                (3, BZ, TY, X), lambda i, j: (0, i, j, 0),
                memory_space=pltpu.VMEM,
            )
        )
        out_shapes.append(jax.ShapeDtypeStruct((3, Z, Y, X), jnp.float32))
    out_specs.append(
        pl.BlockSpec(
            (1, 1, 8, 128), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        )
    )
    out_shapes.append(jax.ShapeDtypeStruct(grid + (8, 128), jnp.float32))
    if with_energy:
        out_specs.append(
            pl.BlockSpec(
                (1, 1, 8, 128), lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        out_shapes.append(jax.ShapeDtypeStruct(grid + (8, 128), jnp.float32))

    scratch = [
        pltpu.VMEM((2, 3, BH, TH, X), jnp.float32),  # s_psi
        pltpu.VMEM((2, BH, TH, X), jnp.float32),  # s_tnp
        pltpu.VMEM((2, BH, TH, X), jnp.float32),  # s_tg
        pltpu.VMEM(
            (2, NS, BH, TH, X) if stacked else (2, BH, TH, X), jnp.float32
        ),  # s_live
    ]
    n_in = 4
    if mu is not None:
        scratch.append(pltpu.VMEM((2, 3, BZ, TY, X), jnp.float32))  # s_vel
        n_in = 5
    scratch += [
        pltpu.VMEM((2, 3, BZ, TY, X), jnp.float32),  # s_po
        pltpu.VMEM((2, BZ, TY, X), jnp.float32),  # s_to
        pltpu.VMEM((2, 3, H, TY, X), jnp.float32),  # s_zs_p
        pltpu.VMEM((2, H, TY, X), jnp.float32),  # s_zs_t
        pltpu.VMEM((2, 3, BZ, H, X), jnp.float32),  # s_ys_p
        pltpu.VMEM((2, BZ, H, X), jnp.float32),  # s_ys_t
        pltpu.VMEM((2, 3, H, H, X), jnp.float32),  # s_cs_p
        pltpu.VMEM((2, H, H, X), jnp.float32),  # s_cs_t
        pltpu.SemaphoreType.DMA((2, n_in)),  # in_sems
        pltpu.SemaphoreType.DMA((2, 8)),  # out_sems
    ]

    if not vmem_limit_mb:
        halo_tile = BH * TH * X
        out_tile = BZ * TY * X
        scratch_f = 2 * (5 + NS) * halo_tile + 2 * 5 * out_tile
        if mu is not None:
            scratch_f += 2 * 6 * out_tile
        R_ = n_taps // 2
        stack_f = (
            (2 * (2 * K + 1) + 6) * out_tile
            + (2 * K + 1) * BZ * TH * X
            + 4 * (BZ + 2 * R_) * (TY + 2 * R_) * X
        )
        need_mb = (4 * (scratch_f + stack_f) >> 20) + 8
        vmem_limit_mb = min(120, max(32, need_mb))
    cparams = (
        pltpu.CompilerParams(vmem_limit_bytes=vmem_limit_mb << 20)
        if not interpret
        else None
    )

    scal = jnp.stack([alpha.astype(jnp.float32), w_reg.astype(jnp.float32)])
    args = [scal]
    if use_xmats:
        args.append(
            jnp.asarray(_x_matrices(taps_static, X, x_logical or X))
        )
    args += [psi_pad, tnp_pad, tg_pad, live_pad]
    if mu is not None:
        args.append(vel)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=tuple(in_specs),
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        scratch_shapes=scratch,
        interpret=interpret,
        **({"compiler_params": cparams} if cparams else {}),
    )(*args)

    outs = list(outs)
    e_data = None
    if with_energy:
        e_tiles = outs.pop()
        e_data = 0.5 * jnp.sum(e_tiles[:, :, 0, 0])
    if mu is not None:
        psi_new, tnp_new, vel_new, mx_tiles = outs
    else:
        psi_new, tnp_new, mx_tiles = outs
        vel_new = None
    return psi_new, tnp_new, vel_new, jnp.max(mx_tiles), e_data


# ---------------------------------------------------------------------------
# VMEM-RESIDENT multi-iteration fold kernel (the 64^3 headline workload)
# ---------------------------------------------------------------------------
#
# At 64^3 the whole folded solver state (~11 MB padded) FITS IN VMEM, so
# the per-iteration HBM round trip of fused_gd_iteration_fold — read state,
# write state, rebuild the edge pad in XLA, launch again — is pure
# overhead: the VPU body is ~0.073 ms while the measured per-iteration
# time was 0.130 ms. This kernel runs n_inner GD iterations inside ONE
# launch: state lives in VMEM scratch, the edge-pad rebuild is a VMEM
# value op, and only the first/last iteration touch HBM. The math per
# iteration is _gd_tile_compute_fold verbatim (single whole-volume tile).


def unpad_folded(f: jnp.ndarray, H: int = _H, HF: int = _HF) -> jnp.ndarray:
    """Strip pad_folded halos: (..., Z+2H, Yf+2HF, 2X) -> (..., Z, Yf, 2X)."""
    nd = f.ndim
    f = jax.lax.slice_in_dim(f, H, f.shape[nd - 3] - H, axis=nd - 3)
    return jax.lax.slice_in_dim(f, HF, f.shape[nd - 2] - HF, axis=nd - 2)


def _pad_folded_val(v, Z, Yf, X, H, HF):
    """pad_folded as a VMEM value op (in-kernel rebuild of the edge pad):
    z halos replicate edge z-rows; folded-y halos hold the y-CLAMPED rows
    (both lane segments = the edge y, built with one 64-lane segment
    swap — the in-kernel mirror of _yclamp_row_fold)."""
    zlo = jnp.broadcast_to(v[0:1], (H,) + v.shape[1:])
    zhi = jnp.broadcast_to(v[Z - 1:Z], (H,) + v.shape[1:])
    vz = jnp.concatenate([zlo, v, zhi], axis=0)
    r0 = vz[:, 0:1, :]
    r1 = vz[:, Yf - 1:Yf, :]
    lane = jax.lax.broadcasted_iota(jnp.int32, r0.shape, 2)
    lo_row = jnp.where(lane < X, r0, _swap_segments(r0))
    hi_row = jnp.where(lane >= X, r1, _swap_segments(r1))
    lo = jnp.broadcast_to(lo_row, (Z + 2 * H, HF, 2 * X))
    hi = jnp.broadcast_to(hi_row, (Z + 2 * H, HF, 2 * X))
    return jnp.concatenate([lo, vz, hi], axis=1)


def _make_multi_fold_kernel(Z, Yf, X, K, taps, n_taps, mu, n_inner,
                            with_energy, with_verbose=False,
                            use_xmats=False, xmats_precision=None,
                            prestack_live=False):
    H, HF = _H, _HF
    has_vel = mu is not None
    XF = 2 * X
    Y = 2 * Yf

    def kernel(*refs):
        refs = list(refs)
        scal_ref = refs.pop(0)
        xm_ref = refs.pop(0) if use_xmats else None
        psi_in = refs.pop(0)
        tnp_in = refs.pop(0)
        tg_in = refs.pop(0)
        live_in = refs.pop(0)
        vel_in = refs.pop(0) if has_vel else None
        psi_out = refs.pop(0)
        tnp_out = refs.pop(0)
        vel_out = refs.pop(0) if has_vel else None
        mx_out = refs.pop(0)
        e_out = refs.pop(0) if with_energy else None
        e_pre_out = refs.pop(0) if with_verbose else None
        reg_out = refs.pop(0) if with_verbose else None
        s_psi = refs.pop(0)
        s_tnp = refs.pop(0)
        s_tg = refs.pop(0)
        s_live = refs.pop(0)
        s_vel = refs.pop(0) if has_vel else None
        s_np = refs.pop(0)
        s_nt = refs.pop(0)
        s_lx = (
            [refs.pop(0) for _ in range(2 * K + 1)] if prestack_live
            else None
        )
        sems = refs.pop(0)

        alpha = scal_ref[0]
        w_reg = scal_ref[1]
        xm = (xm_ref[0], xm_ref[1], xm_ref[2]) if use_xmats else None

        cin = [
            pltpu.make_async_copy(psi_in, s_psi, sems.at[0]),
            pltpu.make_async_copy(tnp_in, s_tnp, sems.at[1]),
            pltpu.make_async_copy(tg_in, s_tg, sems.at[2]),
            pltpu.make_async_copy(live_in, s_live, sems.at[3]),
        ]
        if has_vel:
            cin.append(pltpu.make_async_copy(vel_in, s_vel, sems.at[4]))
        for c in cin:
            c.start()
        for c in cin:
            c.wait()

        if prestack_live:
            # the warp's x-shifts of the live volume are loop-invariant:
            # compute them ONCE per launch (vs (2K+1)^2 roll+edge-fix
            # passes per iteration), bit-identical — shifting the whole
            # padded tile commutes with the per-oz z slicing
            lv = s_live[...]
            for j, ox in enumerate(range(-K, K + 1)):
                s_lx[j][...] = _shift_x_fold(lv, ox, X)

        def make_iter(with_mx):
            def one_iter(it, carry):
                _gd_tile_compute_fold(
                    s_psi, s_tnp, s_tg,
                    lambda oz: s_live[pl.ds(H + oz, Z), :, :],
                    (lambda c: s_vel[c]) if has_vel else None,
                    s_np, s_nt, s_vel if has_vel else None,
                    mx_out.at[pl.ds(it, 1)] if with_mx else None,
                    0, alpha, w_reg,
                    BZ=Z, TYf=Yf, Z=Z, Y=Y, X=X, K=K, taps=taps,
                    n_taps=n_taps, mu=mu,
                    e_out=e_out.at[pl.ds(it, 1)] if with_energy else None,
                    e_pre_out=(
                        e_pre_out.at[pl.ds(it, 1)] if with_verbose else None
                    ),
                    reg_out=(
                        reg_out.at[pl.ds(it, 1)] if with_verbose else None
                    ),
                    xmats=xm,
                    xmats_precision=xmats_precision,
                    live_x=(
                        (lambda oz, j: s_lx[j][pl.ds(H + oz, Z), :, :])
                        if prestack_live
                        else None
                    ),
                )
                # rebuild the padded state in VMEM for the next iteration
                for c in range(3):
                    s_psi[c] = _pad_folded_val(s_np[c], Z, Yf, X, H, HF)
                s_tnp[...] = _pad_folded_val(s_nt[...], Z, Yf, X, H, HF)
                return carry

            return one_iter

        if with_verbose:
            # every iteration's norm feeds the verbose history rows
            jax.lax.fori_loop(
                0, n_inner, make_iter(True), jnp.int32(0), unroll=False
            )
        else:
            # only the LAST iteration's norm is consumed (the chunk-level
            # stopping check uses mx_vec[-1]); skipping the per-voxel
            # update-norm accumulation on the other n_inner - 1 steps
            # saves ~8 VPU ops/voxel on them. Zero the unread rows so the
            # output block is fully initialised.
            mx_out[...] = jnp.zeros(mx_out.shape, jnp.float32)
            jax.lax.fori_loop(
                0, n_inner - 1, make_iter(False), jnp.int32(0),
                unroll=False,
            )
            make_iter(True)(n_inner - 1, jnp.int32(0))

        cout = [
            pltpu.make_async_copy(s_psi, psi_out, sems.at[0]),
            pltpu.make_async_copy(s_tnp, tnp_out, sems.at[1]),
        ]
        if has_vel:
            cout.append(pltpu.make_async_copy(s_vel, vel_out, sems.at[2]))
        for c in cout:
            c.start()
        for c in cout:
            c.wait()

    return kernel


def fused_gd_multi_fold(
    psi_pad: jnp.ndarray,  # f32[3, Z+2H, Yf+2HF, 2X] pad_folded state
    tnp_pad: jnp.ndarray,  # f32[Z+2H, Yf+2HF, 2X]
    vel,  # f32[3, Z, Yf, 2X] or None
    tg_pad: jnp.ndarray,  # pad_for_fold output (loop-invariant)
    live_pad: jnp.ndarray,  # pad_for_fold output (loop-invariant)
    alpha: jnp.ndarray,
    w_reg: jnp.ndarray,
    taps_static: Tuple[float, ...],
    *,
    K: int = 2,
    n_inner: int = 16,
    momentum=None,
    interpret: bool = False,
    with_energy: bool = False,
    with_verbose: bool = False,
    use_xmats: bool = False,
    xmats_precision=None,
    prestack_live: bool = True,
):
    """``n_inner`` fused GD iterations in ONE kernel launch, all state
    VMEM-resident (see module comment above). State arrays are PADDED
    (pad_folded) so consecutive calls chain with no re-padding. Returns
    (psi_pad', tnp_pad', vel', mx_sq[n_inner], e_data[n_inner] | None):
    per-ITERATION data-energy vector, so callers can stop at chunk
    granularity yet check per-iteration stall values. mx_sq: only the
    LAST row is computed unless with_verbose (the chunk stop consumes
    mx_sq[-1]; the other rows are zeroed — skipping their per-voxel
    norm accumulation saves ~8 VPU ops/voxel). Numerics per iteration
    identical to :func:`fused_gd_iteration_fold`.

    with_verbose: additionally return per-iteration PRE-update data and
    regulariser energies — (..., e_pre[n_inner], e_reg[n_inner]) appended
    to the 5-tuple — matching the row convention of the solver's energy
    history (the reference's per-iteration verbose print,
    solver.cu:132-142): row i = energies BEFORE update i, norm OF update
    i. This is what makes ``record_energy`` work with ``inner_steps``.
    """
    ZP, YP, XF = tnp_pad.shape
    Z, Yf = ZP - 2 * _H, YP - 2 * _HF
    X = XF // 2
    n_taps = len(taps_static)
    assert n_taps % 2 == 1 and n_taps <= 2 * _H - 1
    assert 1 <= K <= _H
    assert XF == 128, "fold kernels pack X=64 into 128 lanes"
    mu = float(momentum) if momentum is not None else None
    has_vel = mu is not None

    kernel = _make_multi_fold_kernel(
        Z, Yf, X, K, taps_static, n_taps, mu, n_inner, with_energy,
        with_verbose, use_xmats=use_xmats, xmats_precision=xmats_precision,
        prestack_live=prestack_live,
    )

    n_in = 5 if has_vel else 4
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    if use_xmats:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    in_specs += [pl.BlockSpec(memory_space=pl.ANY)] * n_in
    out_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((3, ZP, YP, XF), jnp.float32),
        jax.ShapeDtypeStruct((ZP, YP, XF), jnp.float32),
    ]
    if has_vel:
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        out_shapes.append(jax.ShapeDtypeStruct((3, Z, Yf, XF), jnp.float32))
    out_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    out_shapes.append(jax.ShapeDtypeStruct((n_inner, 8, 128), jnp.float32))
    if with_energy:
        out_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        out_shapes.append(
            jax.ShapeDtypeStruct((n_inner, 8, 128), jnp.float32)
        )
    if with_verbose:
        for _ in range(2):  # e_pre, e_reg
            out_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
            out_shapes.append(
                jax.ShapeDtypeStruct((n_inner, 8, 128), jnp.float32)
            )

    scratch = [
        pltpu.VMEM((3, ZP, YP, XF), jnp.float32),  # s_psi
        pltpu.VMEM((ZP, YP, XF), jnp.float32),  # s_tnp
        pltpu.VMEM((ZP, YP, XF), jnp.float32),  # s_tg
        pltpu.VMEM((ZP, YP, XF), jnp.float32),  # s_live
    ]
    if has_vel:
        scratch.append(pltpu.VMEM((3, Z, Yf, XF), jnp.float32))
    scratch += [
        pltpu.VMEM((3, Z, Yf, XF), jnp.float32),  # s_np
        pltpu.VMEM((Z, Yf, XF), jnp.float32),  # s_nt
    ]
    if prestack_live:
        # loop-invariant x-shifted live copies (see the kernel comment);
        # (2K+1) x ~1.4 MB at 64^3 — well inside the 100 MB VMEM budget
        scratch += [
            pltpu.VMEM((ZP, YP, XF), jnp.float32) for _ in range(2 * K + 1)
        ]
    scratch.append(pltpu.SemaphoreType.DMA((n_in,)))

    cparams = (
        {"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=100 << 20)}
        if not interpret
        else {}
    )

    scal = jnp.stack([alpha.astype(jnp.float32), w_reg.astype(jnp.float32)])
    args = [scal]
    if use_xmats:
        args.append(jnp.asarray(_x_matrices_fold(taps_static, X)))
    args += [psi_pad, tnp_pad, tg_pad, live_pad]
    if has_vel:
        args.append(vel)

    outs = list(pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=tuple(in_specs),
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        scratch_shapes=scratch,
        interpret=interpret,
        **cparams,
    )(*args))

    e_pre = e_reg = None
    if with_verbose:
        reg_tiles = outs.pop()
        pre_tiles = outs.pop()
        e_reg = 0.5 * reg_tiles[:, 0, 0]
        e_pre = 0.5 * pre_tiles[:, 0, 0]
    e_data = None
    if with_energy:
        e_tiles = outs.pop()
        e_data = 0.5 * e_tiles[:, 0, 0]
    if has_vel:
        psi_new, tnp_new, vel_new, mx_tiles = outs
    else:
        psi_new, tnp_new, mx_tiles = outs
        vel_new = None
    base = (psi_new, tnp_new, vel_new, mx_tiles[:, 0, 0], e_data)
    if with_verbose:
        return base + (e_pre, e_reg)
    return base


# ---------------------------------------------------------------------------
# multi-step C=3 inverse fixed-point kernel
# ---------------------------------------------------------------------------
#
# The windowed inverse fixed point q <- ident - disp(q) is POINTWISE in q:
# q(v) depends only on q(v) itself and on disp values within K voxels of v
# (|q - ident| <= max|disp| <= K by the window bound, at EVERY step — the
# bound is not cumulative). So all n steps can run per-tile in ONE pipeline
# launch against the same loop-invariant disp halo tile, and the per-step
# hat weights are computed ONCE for all three channels (the single-channel
# warp kernel recomputes them per channel because channels ride its grid).
# At 256^3 this replaces 3-4 single-channel passes x 3 channels of HBM
# round trips with one pass — the warm-inverse tail was ~28 ms of the
# ~103 ms production frame (docs/BENCHLOG.md round-3 tail attack).
# Matches fields.estimate_inverse_window semantics exactly
# (vector_fields.cu:111-138 fixed point, window sampler).


def _make_inverse_multi_kernel(BZ, TY, Y, X, K, Zg, n_steps,
                               sample_only=False):
    def kernel(vol_ref, q_ref, out_ref):
        # vol_ref: f32[1, 1, 3, BZ+2K, TY+2K, X] disp halo tile ([x, y, z])
        # q_ref / out_ref: f32[3, BZ, TY, X] absolute coords
        #
        # sample_only: ONE pass that returns the sampled 3-channel field
        # values at the q positions (shared per-axis weights) instead of
        # iterating the inverse fixed point — the C=3 bounded-window field
        # sampler (fields.sample_trilinear_window on a [3,Z,Y,X] field) as
        # a single pipeline launch; used for the compositive composition
        # psi0 o (id + delta), solver.py.
        iz = pl.program_id(0)
        iy = pl.program_id(1)
        z0 = iz * BZ
        y0 = iy * TY
        shape_o = (BZ, TY, X)
        vx = jax.lax.broadcasted_iota(jnp.int32, shape_o, 2).astype(
            jnp.float32
        )
        vy = (jax.lax.broadcasted_iota(jnp.int32, shape_o, 1) + y0).astype(
            jnp.float32
        )
        vz = (jax.lax.broadcasted_iota(jnp.int32, shape_o, 0) + z0).astype(
            jnp.float32
        )
        hi = K - 1e-4

        def step_body(_, q3):
            qx, qy, qz = q3
            dx = jnp.clip(jnp.clip(qx, 0.0, X - 1) - vx, -K, hi)
            dy = jnp.clip(jnp.clip(qy, 0.0, Y - 1) - vy, -K, hi)
            dz = jnp.clip(jnp.clip(qz, 0.0, Zg - 1) - vz, -K, hi)
            # per-axis weights once per STEP (shared by all 3 channels)
            wxs = [
                jnp.maximum(0.0, 1.0 - jnp.abs(dx - ox))
                for ox in range(-K, K + 1)
            ]
            wys = [
                jnp.maximum(0.0, 1.0 - jnp.abs(dy - oy))
                for oy in range(-K, K + 1)
            ]

            def warp_body(i, accs):
                oz = i - K
                wz = jnp.maximum(
                    0.0, 1.0 - jnp.abs(dz - oz.astype(jnp.float32))
                )
                outs = []
                for c in range(3):
                    lz = vol_ref[0, 0, c, pl.ds(K + oz, BZ), :, :]
                    lxz = [
                        _shift_x_edge(lz, ox, X) for ox in range(-K, K + 1)
                    ]
                    acc_y = jnp.zeros(shape_o, jnp.float32)
                    for oy in range(-K, K + 1):
                        acc_x = jnp.zeros(shape_o, jnp.float32)
                        for ox in range(-K, K + 1):
                            lzy = lxz[ox + K][:, K + oy : K + oy + TY, :]
                            acc_x = acc_x + wxs[ox + K] * lzy
                        acc_y = acc_y + wys[oy + K] * acc_x
                    outs.append(accs[c] + wz * acc_y)
                return tuple(outs)

            z3 = (
                jnp.zeros(shape_o, jnp.float32),
                jnp.zeros(shape_o, jnp.float32),
                jnp.zeros(shape_o, jnp.float32),
            )
            ax, ay, az = jax.lax.fori_loop(0, 2 * K + 1, warp_body, z3)
            if sample_only:
                return (ax, ay, az)
            return (vx - ax, vy - ay, vz - az)

        qx, qy, qz = jax.lax.fori_loop(
            0, n_steps, step_body, (q_ref[0], q_ref[1], q_ref[2])
        )
        out_ref[0] = qx
        out_ref[1] = qy
        out_ref[2] = qz

    return kernel


@functools.partial(
    jax.jit, static_argnames=("iters", "K", "BZ", "TY", "interpret")
)
def estimate_inverse_window_pallas_multi(
    psi: jnp.ndarray,
    iters: int = 3,
    K: int = 2,
    BZ: int = 8,
    TY: int = 0,
    init=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """All ``iters`` windowed inverse fixed-point steps in ONE pipelined
    Pallas launch (see the module comment above): the disp halo tiles are
    stacked once and every step runs per-tile in VMEM with shared per-step
    weights. Exact vs step-chained :func:`estimate_inverse_window_pallas`
    / fields.estimate_inverse_window. ``init`` warm-starts (previous
    frame's inverse); None = identity."""
    dims = psi.shape[1:]
    Z, Y, X = dims
    zz = jax.lax.broadcasted_iota(jnp.float32, dims, 0)
    yy = jax.lax.broadcasted_iota(jnp.float32, dims, 1)
    xx = jax.lax.broadcasted_iota(jnp.float32, dims, 2)
    ident = jnp.stack([xx, yy, zz], axis=0)
    disp = psi - ident
    # C=3 halo tiles + 3-channel q live per grid step: keep tiles small
    # (BZ=8, TY<=32 at X=256 is ~9 MB incl. weights/shift temps)
    if TY == 0:
        TY = Y
        while TY > 8 and TY * X > 32 * 256:
            TY //= 2
        while Y % TY:
            TY //= 2
    while Z % BZ:
        BZ //= 2
    disp_t = prestack_warp_vol(disp, K, BZ, TY)
    q0 = ident if init is None else init

    cparams = (
        {"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=100 << 20)}
        if not interpret
        else {}
    )
    return pl.pallas_call(
        _make_inverse_multi_kernel(BZ, TY, Y, X, K, Z, iters),
        grid=(Z // BZ, Y // TY),
        in_specs=[
            pl.BlockSpec(
                (1, 1, 3, BZ + 2 * K, TY + 2 * K, X),
                lambda i, j: (i, j, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (3, BZ, TY, X),
                lambda i, j: (0, i, j, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (3, BZ, TY, X), lambda i, j: (0, i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((3, Z, Y, X), jnp.float32),
        interpret=interpret,
        **cparams,
    )(disp_t, q0)


def _make_compose_weight_kernel(BZ, TY, Y, X, Kf, Kw, Zg):
    def kernel(field_ref, wvol_ref, pos_ref, out_ref, wout_ref):
        # field_ref: f32[1, 1, 3, BZ+2Kf, TY+2Kf, X] psi0 halo tile
        # wvol_ref:  f32[1, 1, 1, BZ+2Kw, TY+2Kw, X] weight_n halo tile
        # pos_ref:   f32[3, BZ, TY, X] ABSOLUTE g = id + delta (the fused
        #            loop's state is absolute, so passing it directly
        #            saves a full-volume subtract + re-add)
        # out_ref:   f32[3, BZ, TY, X] psi_new = psi0 o g
        # wout_ref:  f32[1, BZ, TY, X] weight_n floor-sampled at psi_new
        iz = pl.program_id(0)
        iy = pl.program_id(1)
        z0 = iz * BZ
        y0 = iy * TY
        shape_o = (BZ, TY, X)
        vx = jax.lax.broadcasted_iota(jnp.int32, shape_o, 2).astype(
            jnp.float32
        )
        vy = (jax.lax.broadcasted_iota(jnp.int32, shape_o, 1) + y0).astype(
            jnp.float32
        )
        vz = (jax.lax.broadcasted_iota(jnp.int32, shape_o, 0) + z0).astype(
            jnp.float32
        )
        hi = Kf - 1e-4
        dx = jnp.clip(jnp.clip(pos_ref[0], 0.0, X - 1) - vx, -Kf, hi)
        dy = jnp.clip(jnp.clip(pos_ref[1], 0.0, Y - 1) - vy, -Kf, hi)
        dz = jnp.clip(jnp.clip(pos_ref[2], 0.0, Zg - 1) - vz, -Kf, hi)
        wxs = [
            jnp.maximum(0.0, 1.0 - jnp.abs(dx - ox))
            for ox in range(-Kf, Kf + 1)
        ]
        wys = [
            jnp.maximum(0.0, 1.0 - jnp.abs(dy - oy))
            for oy in range(-Kf, Kf + 1)
        ]

        def field_body(i, accs):
            oz = i - Kf
            wz = jnp.maximum(0.0, 1.0 - jnp.abs(dz - oz.astype(jnp.float32)))
            outs = []
            for c in range(3):
                lz = field_ref[0, 0, c, pl.ds(Kf + oz, BZ), :, :]
                lxz = [_shift_x_edge(lz, ox, X) for ox in range(-Kf, Kf + 1)]
                acc_y = jnp.zeros(shape_o, jnp.float32)
                for oy in range(-Kf, Kf + 1):
                    acc_x = jnp.zeros(shape_o, jnp.float32)
                    for ox in range(-Kf, Kf + 1):
                        lzy = lxz[ox + Kf][:, Kf + oy: Kf + oy + TY, :]
                        acc_x = acc_x + wxs[ox + Kf] * lzy
                    acc_y = acc_y + wys[oy + Kf] * acc_x
                outs.append(accs[c] + wz * acc_y)
            return tuple(outs)

        z3 = (
            jnp.zeros(shape_o, jnp.float32),
            jnp.zeros(shape_o, jnp.float32),
            jnp.zeros(shape_o, jnp.float32),
        )
        px, py, pz = jax.lax.fori_loop(0, 2 * Kf + 1, field_body, z3)
        out_ref[0] = px
        out_ref[1] = py
        out_ref[2] = pz

        # ---- weight_n floor-sampled at the just-computed psi_new ----
        # (|psi_new - v| <= Kw by the total-window bound); floor semantics
        # identical to _make_warp_kernel(floor=True)
        fx = jnp.clip(jnp.floor(jnp.clip(px, 0.0, X - 1)) - vx, -Kw, Kw)
        fy = jnp.clip(jnp.floor(jnp.clip(py, 0.0, Y - 1)) - vy, -Kw, Kw)
        fz = jnp.clip(jnp.floor(jnp.clip(pz, 0.0, Zg - 1)) - vz, -Kw, Kw)
        ixs = [(fx == ox).astype(jnp.float32) for ox in range(-Kw, Kw + 1)]
        iys = [(fy == oy).astype(jnp.float32) for oy in range(-Kw, Kw + 1)]

        def weight_body(i, acc):
            oz = i - Kw
            wz = (fz == oz.astype(jnp.float32)).astype(jnp.float32)
            lz = wvol_ref[0, 0, 0, pl.ds(Kw + oz, BZ), :, :]
            lxz = [_shift_x_edge(lz, ox, X) for ox in range(-Kw, Kw + 1)]
            acc_y = jnp.zeros(shape_o, jnp.float32)
            for oy in range(-Kw, Kw + 1):
                acc_x = jnp.zeros(shape_o, jnp.float32)
                for ox in range(-Kw, Kw + 1):
                    lzy = lxz[ox + Kw][:, Kw + oy: Kw + oy + TY, :]
                    acc_x = acc_x + ixs[ox + Kw] * lzy
                acc_y = acc_y + iys[oy + Kw] * acc_x
            return acc + wz * acc_y

        wout_ref[0] = jax.lax.fori_loop(
            0, 2 * Kw + 1, weight_body, jnp.zeros(shape_o, jnp.float32)
        )

    return kernel


@functools.partial(
    jax.jit, static_argnames=("Kf", "Kw", "BZ", "TY", "interpret")
)
def compose_weight_pallas(
    field: jnp.ndarray,   # f32[3, Z, Y, X] psi0 (absolute coords)
    pos: jnp.ndarray,     # f32[3, Z, Y, X] ABSOLUTE g = id + delta
    weight: jnp.ndarray,  # f32[Z, Y, X] weight_n
    Kf: int = 1,
    Kw: int = 2,
    BZ: int = 8,
    TY: int = 0,
    interpret: bool = False,
):
    """Compositive-tail fusion: psi_new = psi0 o g AND
    weight_n_psi = floor-sample(weight_n, psi_new) in ONE pipeline launch.

    Replaces window_warp_field3_pallas + a separate floor warp in the
    production tail (solver.estimate_psi_compositive total_window mode):
    the floor sample's position IS the composition's output, so fusing
    saves a full psi_new HBM round trip and the second launch; taking the
    loop's ABSOLUTE state g directly also saves the delta subtract /
    ident re-add round trips. |g - id| <= Kf is the increment window
    bound. Semantics: fields.sample_trilinear_window on the 3-channel
    field at window Kf + fields.sample_nearest_floor_window on the weight
    at window Kw (reference utils.hpp:51-122 trilinear fetch + the
    nearest-voxel weight rule).
    """
    dims = field.shape[1:]
    Z, Y, X = dims
    if TY == 0:
        TY = Y
        while TY > 8 and TY * X > 32 * 256:
            TY //= 2
        while Y % TY:
            TY //= 2
    while Z % BZ:
        BZ //= 2
    field_t = prestack_warp_vol(field, Kf, BZ, TY)
    weight_t = prestack_warp_vol(weight[None], Kw, BZ, TY)

    cparams = (
        {"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=100 << 20)}
        if not interpret
        else {}
    )
    psi_new, wout = pl.pallas_call(
        _make_compose_weight_kernel(BZ, TY, Y, X, Kf, Kw, Z),
        grid=(Z // BZ, Y // TY),
        in_specs=[
            pl.BlockSpec(
                (1, 1, 3, BZ + 2 * Kf, TY + 2 * Kf, X),
                lambda i, j: (i, j, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, 1, BZ + 2 * Kw, TY + 2 * Kw, X),
                lambda i, j: (i, j, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (3, BZ, TY, X),
                lambda i, j: (0, i, j, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (3, BZ, TY, X), lambda i, j: (0, i, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, BZ, TY, X), lambda i, j: (0, i, j, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((3, Z, Y, X), jnp.float32),
            jax.ShapeDtypeStruct((1, Z, Y, X), jnp.float32),
        ),
        interpret=interpret,
        **cparams,
    )(field_t, weight_t, pos)
    return psi_new, wout[0]


@functools.partial(
    jax.jit, static_argnames=("K", "BZ", "TY", "interpret")
)
def window_warp_field3_pallas(
    field: jnp.ndarray,
    pos: jnp.ndarray,
    K: int = 1,
    BZ: int = 8,
    TY: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Bounded-window trilinear sample of a 3-CHANNEL field in ONE launch.

    out[c](v) = trilinear(field[c]) at pos(v), with |pos - v| <= K — the
    Pallas counterpart of ``fields.sample_trilinear_window`` on a
    [3, Z, Y, X] field, with the per-axis hat weights computed ONCE and
    shared by all three channels (three single-channel warp launches
    recompute them per channel and re-read pos three times). Used for the
    compositive composition psi_new = psi0 o (id + delta) (solver.py),
    which profiled at 16 ms @256^3 through the XLA sampler — the single
    largest non-inverse tail of the production frame.

    Reference semantics: utils.hpp:51-86 trilinear fetch at a warped
    coordinate, vector_fields.cu field composition.
    """
    dims = field.shape[1:]
    Z, Y, X = dims
    if TY == 0:
        TY = Y
        while TY > 8 and TY * X > 32 * 256:
            TY //= 2
        while Y % TY:
            TY //= 2
    while Z % BZ:
        BZ //= 2
    field_t = prestack_warp_vol(field, K, BZ, TY)

    cparams = (
        {"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=100 << 20)}
        if not interpret
        else {}
    )
    return pl.pallas_call(
        _make_inverse_multi_kernel(BZ, TY, Y, X, K, Z, 1, sample_only=True),
        grid=(Z // BZ, Y // TY),
        in_specs=[
            pl.BlockSpec(
                (1, 1, 3, BZ + 2 * K, TY + 2 * K, X),
                lambda i, j: (i, j, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (3, BZ, TY, X),
                lambda i, j: (0, i, j, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (3, BZ, TY, X), lambda i, j: (0, i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((3, Z, Y, X), jnp.float32),
        interpret=interpret,
        **cparams,
    )(field_t, pos)
