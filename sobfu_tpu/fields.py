"""Field math: trilinear sampling, stencils, warps, deformation fields.

Array conventions (TPU-first):
  * scalar volumes are ``f32[Z, Y, X]`` — axis order (z, y, x) so the flat
    index equals the reference's ``z*dimY*dimX + y*dimX + x`` layout and X,
    the innermost axis, maps onto TPU lanes.
  * vector fields are ``f32[3, Z, Y, X]`` with channel order (x, y, z):
    channels-first keeps the last axis wide for the VPU.
  * a deformation field ``psi`` stores ABSOLUTE target coordinates in voxel
    units, not displacements (reference src/sobfu/cuda/vector_fields.cu:64-79);
    identity init writes (x, y, z) per voxel and ``displacement`` subtracts it
    (vector_fields.cu:24-26).

Numerical contracts preserved from the reference:
  * trilinear interpolation clamps coordinates to [0, dim-1]
    (include/sobfu/cuda/utils.hpp:51-122); the interpolated TSDF weight is
    the weight of the floor corner voxel (utils.hpp:83).
  * first-order stencils (gradient / Jacobian) are central differences that
    evaluate to ZERO on boundary slices — at x==0 the reference sets both
    sample indices to x+1 (vector_fields.cu:165-179), making the difference
    vanish.
  * the "Laplacian" is the NEGATED 6-neighbour Laplacian, ``6*f - sum of
    neighbours``, with boundary neighbours clamped to the centre so the
    per-axis contribution vanishes at boundaries (vector_fields.cu:291-337).
  * the inverse deformation field is a 48-step fixed-point iteration
    ``psi_inv <- id - disp(psi) o psi_inv`` (vector_fields.cu:111-138).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# shifts / padding helpers
# ---------------------------------------------------------------------------


def _pad_zeros(f: jnp.ndarray, axis: int, before: int, after: int) -> jnp.ndarray:
    pad = [(0, 0)] * f.ndim
    pad[axis] = (before, after)
    return jnp.pad(f, pad)


def _slice(f: jnp.ndarray, axis: int, start: int, size: int) -> jnp.ndarray:
    return jax.lax.slice_in_dim(f, start, start + size, axis=axis)


def central_diff(f: jnp.ndarray, axis: int) -> jnp.ndarray:
    """(f[i+1] - f[i-1]) / 2 in the interior, 0 on the two boundary slices."""
    n = f.shape[axis]
    interior = (_slice(f, axis, 2, n - 2) - _slice(f, axis, 0, n - 2)) * 0.5
    return _pad_zeros(interior, axis, 1, 1)


def second_diff(f: jnp.ndarray, axis: int) -> jnp.ndarray:
    """f[i+1] + f[i-1] - 2 f[i] in the interior, 0 on boundary slices."""
    n = f.shape[axis]
    interior = (
        _slice(f, axis, 2, n - 2)
        + _slice(f, axis, 0, n - 2)
        - 2.0 * _slice(f, axis, 1, n - 2)
    )
    return _pad_zeros(interior, axis, 1, 1)


def conv1d_replicate(f: jnp.ndarray, taps: jnp.ndarray, axis: int) -> jnp.ndarray:
    """1-D correlation with edge-replicate padding along ``axis``.

    out[i] = sum_j taps[r - j] * f[clamp(i + j)], j in [-r, r] — exactly the
    reference's axis convolution (src/sobfu/cuda/solver.cu:286-288 with
    clamp-to-edge halo loads). taps length must be odd.
    """
    s = taps.shape[0]
    r = s // 2
    axis = axis % f.ndim
    n = f.shape[axis]
    fpad = jnp.pad(
        f, [(r, r) if a == axis else (0, 0) for a in range(f.ndim)], mode="edge"
    )
    out = jnp.zeros_like(f)
    for u in range(s):
        out = out + taps[u] * _slice(fpad, axis, 2 * r - u, n)
    return out


@functools.lru_cache(maxsize=None)
def _conv_shift_mats(s: int, n: int) -> np.ndarray:
    """Static 0/1 shift matrices P[j, u, i] = 1[clamp(i + j - r) == u].

    P[j] @ projects f onto its edge-clamped shift by (j - r); a weighted sum
    over j with the (flipped) taps yields the banded+corner conv matrix used
    by :func:`conv1d_replicate_mxu`.
    """
    r = s // 2
    P = np.zeros((s, n, n), np.float32)
    i = np.arange(n)
    for jj in range(s):
        u = np.clip(i + (jj - r), 0, n - 1)
        P[jj, u, i] = 1.0
    return P


def conv1d_replicate_mxu(f: jnp.ndarray, taps: jnp.ndarray, axis: int) -> jnp.ndarray:
    """:func:`conv1d_replicate` evaluated as ONE banded-matrix contraction.

    out[..., i] = sum_u f[..., u] * A[u, i] with
    A[u, i] = sum_j taps[r - j] * 1[clamp(i + j) == u] — numerically the same
    replicate-pad correlation (f32 round-off differs: the MXU accumulates a
    dot product instead of a shifted-add chain). On TPU the contraction runs
    on the systolic array, replacing ``s`` full-volume shifted FMA passes
    with a single matmul whose (n x n) operand lives in VMEM — the hot-loop
    Sobolev convolutions (solver.cu:237-459) become MXU work instead of VPU
    streaming passes.
    """
    s = int(taps.shape[0])
    axis = axis % f.ndim
    n = f.shape[axis]
    P = jnp.asarray(_conv_shift_mats(s, n))
    A = jnp.einsum("j,jui->ui", taps[::-1], P)
    # contract `axis` of f with dim 0 of A, placing the result dim back in
    # position via dot_general (XLA keeps the lane axis resident when axis
    # is not the minor one)
    sub_in = list(range(f.ndim))
    sub_out = list(range(f.ndim))
    sub_in[axis] = f.ndim  # 'u'
    out = jnp.einsum(
        f,
        sub_in,
        A,
        [f.ndim, axis],
        sub_out,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out


@functools.lru_cache(maxsize=None)
def _conv_valid_shift_mats(s: int, n_in: int) -> np.ndarray:
    """Static 0/1 matrices Q[k, u, i] = 1[u == i + k] of shape (s, n_in, n_in - s + 1)."""
    n_out = n_in - s + 1
    Q = np.zeros((s, n_in, n_out), np.float32)
    i = np.arange(n_out)
    for k in range(s):
        Q[k, i + k, i] = 1.0
    return Q


def conv1d_valid_mxu(f_ext: jnp.ndarray, taps: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Valid-mode banded-matmul convolution of an already-extended input.

    out[..., i, ...] = sum_k taps[s-1-k] * f_ext[..., i+k, ...] — the halo
    (s//2 rows each side) must already be present in ``f_ext`` along ``axis``.
    Matches the z-convolution of the chunked solve (explicit neighbour halos)
    as one MXU contraction.
    """
    s = int(taps.shape[0])
    axis = axis % f_ext.ndim
    n_in = f_ext.shape[axis]
    Q = jnp.asarray(_conv_valid_shift_mats(s, n_in))
    B = jnp.einsum("k,kui->ui", taps[::-1], Q)
    sub_in = list(range(f_ext.ndim))
    sub_out = list(range(f_ext.ndim))
    sub_in[axis] = f_ext.ndim
    return jnp.einsum(
        f_ext,
        sub_in,
        B,
        [f_ext.ndim, axis],
        sub_out,
        precision=jax.lax.Precision.HIGHEST,
    )


# ---------------------------------------------------------------------------
# deformation field
# ---------------------------------------------------------------------------


def identity_field(dims_zyx: Tuple[int, int, int], dtype=jnp.float32) -> jnp.ndarray:
    """Identity deformation: psi[c, z, y, x] = (x, y, z)[c] in voxel units."""
    Z, Y, X = dims_zyx
    zz, yy, xx = jnp.meshgrid(
        jnp.arange(Z, dtype=dtype),
        jnp.arange(Y, dtype=dtype),
        jnp.arange(X, dtype=dtype),
        indexing="ij",
    )
    return jnp.stack([xx, yy, zz], axis=0)


def displacement(psi: jnp.ndarray) -> jnp.ndarray:
    """psi - identity (voxel units)."""
    return psi - identity_field(psi.shape[1:], psi.dtype)


# ---------------------------------------------------------------------------
# trilinear sampling
# ---------------------------------------------------------------------------


def _corner_indices(coords: jnp.ndarray, dims_zyx: Tuple[int, int, int]):
    """Clamped floor/ceil corner indices + fractional weights.

    coords: f32[3, ...] channel order (x, y, z), voxel units.
    Returns ((x0,y0,z0), (x1,y1,z1), (fx,fy,fz)) with ints clamped in-range.
    """
    Z, Y, X = dims_zyx
    cx = jnp.clip(coords[0], 0.0, X - 1)
    cy = jnp.clip(coords[1], 0.0, Y - 1)
    cz = jnp.clip(coords[2], 0.0, Z - 1)
    x0f = jnp.floor(cx)
    y0f = jnp.floor(cy)
    z0f = jnp.floor(cz)
    fx = cx - x0f
    fy = cy - y0f
    fz = cz - z0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    z0 = z0f.astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, X - 1)
    y1 = jnp.minimum(y0 + 1, Y - 1)
    z1 = jnp.minimum(z0 + 1, Z - 1)
    return (x0, y0, z0), (x1, y1, z1), (fx, fy, fz)


def _flat(x, y, z, X: int, Y: int):
    return (z * Y + y) * X + x


def _blend(c000, c100, c010, c110, c001, c101, c011, c111, fx, fy, fz):
    """Trilinear blend; c<abc> is the corner at x-offset a, y-offset b, z-offset c."""
    c00 = c000 + (c100 - c000) * fx
    c10 = c010 + (c110 - c010) * fx
    c01 = c001 + (c101 - c001) * fx
    c11 = c011 + (c111 - c011) * fx
    c0 = c00 + (c10 - c00) * fy
    c1 = c01 + (c11 - c01) * fy
    return c0 + (c1 - c0) * fz


@jax.jit
def sample_trilinear(vol: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Clamped trilinear sampling of a scalar volume f32[Z,Y,X].

    coords: f32[3, ...] channels (x, y, z) in voxel units.
    Mirrors reference interpolate_tsdf (utils.hpp:51-86).
    """
    Z, Y, X = vol.shape
    (x0, y0, z0), (x1, y1, z1), (fx, fy, fz) = _corner_indices(coords, (Z, Y, X))
    v = vol.reshape(-1)
    take = lambda xi, yi, zi: jnp.take(v, _flat(xi, yi, zi, X, Y))
    return _blend(
        take(x0, y0, z0), take(x1, y0, z0), take(x0, y1, z0), take(x1, y1, z0),
        take(x0, y0, z1), take(x1, y0, z1), take(x0, y1, z1), take(x1, y1, z1),
        fx, fy, fz,
    )


@functools.partial(jax.jit, static_argnames=("max_disp",))
def sample_trilinear_window(
    vol: jnp.ndarray, psi: jnp.ndarray, max_disp: int = 4
) -> jnp.ndarray:
    """Gather-free trilinear sampling for bounded displacements.

    TPU-native replacement for the reference's texture-fetch trilinear
    interpolation (utils.hpp:51-86): random gathers are slow on TPU, so the
    warp is rewritten as a sum of STATIC shifts weighted by per-axis hat
    functions::

        out(v) = sum_{o in [-K, K+1]^3}  wx(v,ox) wy(v,oy) wz(v,oz)
                                         * vol[clamp(v + o)]
        w_ax(v,o) = max(0, 1 - |coord_ax(v) - (v_ax + o)|)

    which is exactly trilinear interpolation whenever every component of the
    (clamped) displacement ``psi - id`` lies in ``(-K, K+1)``; out-of-window
    targets clamp to the window edge. The triple sum is factorised per axis,
    costing (2K+2) + (2K+2)^2 + (2K+2)^3 fused elementwise FMAs — all
    VPU-friendly shifts, no gathers, no host sync.

    Use :func:`sample_trilinear` (exact for any displacement) when the
    deformation can exceed ``max_disp`` voxels.

    vol may have leading batch/channel dims: f32[..., Z, Y, X]; the output
    matches vol's shape. psi is f32[3, Z, Y, X].
    """

    def hat(d, o):
        return jnp.maximum(0.0, 1.0 - jnp.abs(d - o))

    return _window_sample(vol, psi, int(max_disp), hat, floor_coords=False)


@functools.partial(jax.jit, static_argnames=("max_disp",))
def sample_nearest_floor_window(
    vol: jnp.ndarray, psi: jnp.ndarray, max_disp: int = 4
) -> jnp.ndarray:
    """Gather-free floor-corner sampling (the reference's warped-weight rule)
    for bounded displacements; window semantics as in
    :func:`sample_trilinear_window`."""

    def mask(d, o):
        return (d == o).astype(vol.dtype)

    return _window_sample(vol, psi, int(max_disp), mask, floor_coords=True)


def _window_sample(vol, psi, K, weight_fn, floor_coords):
    """Core of the bounded-window samplers.

    The volume is edge-padded ONCE by K+1 on each spatial axis; every
    shifted term is then a pure static slice of the padded array — a flat,
    fusion-friendly graph (one pad + W^3 slice-FMAs) instead of W^3 chained
    pad/concat ops, which XLA compiles pathologically slowly.
    """
    Z, Y, X = vol.shape[-3:]
    ident = identity_field((Z, Y, X), psi.dtype)
    cx = jnp.clip(psi[0], 0.0, X - 1)
    cy = jnp.clip(psi[1], 0.0, Y - 1)
    cz = jnp.clip(psi[2], 0.0, Z - 1)
    if floor_coords:
        cx, cy, cz = jnp.floor(cx), jnp.floor(cy), jnp.floor(cz)
    # clamp displacements into the open window (-K, K): the needed corner
    # offsets then span exactly [-K, K] — 2K+1 taps per axis instead of
    # 2K+2, a (W+1)^3/W^3 ~ 1.7x FLOP saving at K=2
    hi = K if floor_coords else K - 1e-4  # floor masks need exact integers
    dx = jnp.clip(cx - ident[0], -K, hi)
    dy = jnp.clip(cy - ident[1], -K, hi)
    dz = jnp.clip(cz - ident[2], -K, hi)

    P = K
    lead = [(0, 0)] * (vol.ndim - 3)
    vpad = jnp.pad(vol, lead + [(P, P)] * 3, mode="edge")

    def view(oz, oy, ox):
        idx = (Ellipsis,
               slice(P + oz, P + oz + Z),
               slice(P + oy, P + oy + Y),
               slice(P + ox, P + ox + X))
        return vpad[idx]

    offsets = range(-K, K + 1)
    # weights are recomputed inline per term: 2 extra fused VPU ops each,
    # but no W-sized set of materialised weight volumes (at 256^3 those
    # temps alone exceeded HBM limits)
    out = jnp.zeros_like(vol)
    for oz in offsets:
        acc_y = jnp.zeros_like(vol)
        for oy in offsets:
            acc_x = jnp.zeros_like(vol)
            for ox in offsets:
                acc_x = acc_x + weight_fn(dx, ox) * view(oz, oy, ox)
            acc_y = acc_y + weight_fn(dy, oy) * acc_x
        out = out + weight_fn(dz, oz) * acc_y
    return out


def sample_trilinear_window_zoffset(
    vol_full: jnp.ndarray, psi_local: jnp.ndarray, z0, max_disp: int = 4
) -> jnp.ndarray:
    """Windowed trilinear sampling of a z-BLOCK from a full volume.

    For z-sharded/chunked solvers: psi_local covers global rows
    [z0, z0 + Zl) with ABSOLUTE coordinates; vol_full is the whole
    (replicated / all-gathered / halo-extended) volume, optionally with
    leading channel dims f32[..., Z, Y, X]. Window semantics identical to
    :func:`sample_trilinear_window`; z0 may be a traced scalar.
    """

    def hat(d, o):
        return jnp.maximum(0.0, 1.0 - jnp.abs(d - o))

    return _window_sample_zoffset(
        vol_full, psi_local, z0, int(max_disp), hat, floor_coords=False
    )


def sample_nearest_floor_window_zoffset(
    vol_full: jnp.ndarray, psi_local: jnp.ndarray, z0, max_disp: int = 4
) -> jnp.ndarray:
    """Windowed floor-corner sampling of a z-block (warped-weight rule)."""

    def mask(d, o):
        return (d == o).astype(vol_full.dtype)

    return _window_sample_zoffset(
        vol_full, psi_local, z0, int(max_disp), mask, floor_coords=True
    )


def _window_sample_zoffset(vol_full, psi_local, z0, K, weight_fn, floor_coords):
    Zl = psi_local.shape[-3]
    Z, Y, X = vol_full.shape[-3:]
    zz, yy, xx = jnp.meshgrid(
        jnp.arange(Zl, dtype=jnp.float32) + jnp.asarray(z0, jnp.float32),
        jnp.arange(Y, dtype=jnp.float32),
        jnp.arange(X, dtype=jnp.float32),
        indexing="ij",
    )
    cx = jnp.clip(psi_local[0], 0.0, X - 1)
    cy = jnp.clip(psi_local[1], 0.0, Y - 1)
    cz = jnp.clip(psi_local[2], 0.0, Z - 1)
    if floor_coords:
        cx, cy, cz = jnp.floor(cx), jnp.floor(cy), jnp.floor(cz)
    hi = K if floor_coords else K - 1e-4
    dx = jnp.clip(cx - xx, -K, hi)
    dy = jnp.clip(cy - yy, -K, hi)
    dz = jnp.clip(cz - zz, -K, hi)

    P = K
    lead = [(0, 0)] * (vol_full.ndim - 3)
    vpad = jnp.pad(vol_full, lead + [(P, P)] * 3, mode="edge")
    zax = vol_full.ndim - 3

    z0i = jnp.asarray(z0, jnp.int32)
    out = jnp.zeros(vol_full.shape[:-3] + psi_local.shape[1:], vol_full.dtype)
    for oz in range(-K, K + 1):
        vz = jax.lax.dynamic_slice_in_dim(vpad, z0i + (P + oz), Zl, axis=zax)
        acc_y = jnp.zeros_like(out)
        for oy in range(-K, K + 1):
            vzy = jax.lax.slice_in_dim(vz, P + oy, P + oy + Y, axis=zax + 1)
            acc_x = jnp.zeros_like(out)
            for ox in range(-K, K + 1):
                acc_x = acc_x + weight_fn(dx, ox) * jax.lax.slice_in_dim(
                    vzy, P + ox, P + ox + X, axis=zax + 2
                )
            acc_y = acc_y + weight_fn(dy, oy) * acc_x
        out = out + weight_fn(dz, oz) * acc_y
    return out


@functools.partial(jax.jit, static_argnames=("iters", "max_disp"))
def estimate_inverse_window(
    psi: jnp.ndarray,
    iters: int = 48,
    max_disp: int = 4,
    init: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Fixed-point inverse using the gather-free window sampler.

    Same iteration as :func:`estimate_inverse` (vector_fields.cu:111-138) but
    each displacement interpolation is a bounded-window shift sum; valid when
    the deformation magnitude stays under ``max_disp`` voxels.

    init: optional warm start (e.g. the previous frame's inverse — the
    fixed point moves little frame-to-frame, so far fewer iterations reach
    the same accuracy as the reference's 48-from-identity). None = identity
    (reference semantics).
    """
    ident = identity_field(psi.shape[1:], psi.dtype)
    disp = psi - ident

    def body(_, psi_inv):
        return ident - sample_trilinear_window(disp, psi_inv, max_disp)

    return jax.lax.fori_loop(0, iters, body, ident if init is None else init)


@jax.jit
def sample_nearest_floor(vol: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Value at the clamped floor corner (the reference's warped-weight rule)."""
    Z, Y, X = vol.shape
    (x0, y0, z0), _, _ = _corner_indices(coords, (Z, Y, X))
    return jnp.take(vol.reshape(-1), _flat(x0, y0, z0, X, Y))


@jax.jit
def sample_field_trilinear(field: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Clamped trilinear sampling of a vector field f32[C,Z,Y,X] -> f32[C, ...].

    Mirrors reference interpolate_field (utils.hpp:88-122).
    """
    C, Z, Y, X = field.shape
    (x0, y0, z0), (x1, y1, z1), (fx, fy, fz) = _corner_indices(coords, (Z, Y, X))
    v = field.reshape(C, -1)
    take = lambda xi, yi, zi: jnp.take(v, _flat(xi, yi, zi, X, Y), axis=1)
    return _blend(
        take(x0, y0, z0), take(x1, y0, z0), take(x0, y1, z0), take(x1, y1, z0),
        take(x0, y0, z1), take(x1, y0, z1), take(x0, y1, z1), take(x1, y1, z1),
        fx[None], fy[None], fz[None],
    )


@functools.partial(
    jax.jit, static_argnames=("max_disp", "cap", "floor")
)
def sample_hybrid_window_exact(
    vol: jnp.ndarray,
    psi: jnp.ndarray,
    max_disp: int = 2,
    cap: int = 0,
    floor: bool = False,
) -> jnp.ndarray:
    """EXACT arbitrary-displacement warp at near window-warp cost.

    TPU's XLA gather is serialized and slow (~170 ms for one scalar 128^3
    warp vs ~25 ms windowed, BENCHLOG round 5), but in real scenes only a
    small fraction of voxels carry displacement beyond the window (the
    moving object; the regularised background stays sub-voxel). Strategy:

      1. windowed warp everywhere (gather-free, exact in-window),
      2. fixed-capacity compaction of the OUT-OF-WINDOW voxels
         (cumsum-scatter, the marching-cubes trick),
      3. exact gather for just those ``<= cap`` voxels, scattered back.

    Matches :func:`sample_trilinear` (or the floor rule with
    ``floor=True``) for EVERY voxel — in-window voxels via the window
    sampler's exactness (same interpolation, f32 rounding differs in the
    last bits), out-of-window voxels via the exact fallback. When
    the out-of-window count exceeds ``cap`` (default: 1/8 of the volume)
    a `lax.cond` falls back to the full exact gather — never silently
    wrong, just slower on scenes where most of the volume moved.
    """
    dims = vol.shape
    Z, Y, X = dims
    N = Z * Y * X
    if cap <= 0:
        cap = max(1024, N // 8)
    cap = min(cap, N)
    K = int(max_disp)
    ident = identity_field(dims, psi.dtype)
    disp = psi - ident
    # the window sampler is exact for components in (-K, K + 1); use a
    # small interior margin so boundary rounding never misclassifies
    eps = jnp.float32(1e-3)
    in_w = jnp.all(
        (disp > -K + eps) & (disp < K + 1 - eps), axis=0
    )
    bad = jnp.logical_not(in_w).reshape(-1)
    cnt = jnp.cumsum(bad.astype(jnp.int32))
    total = cnt[-1]

    sample_exact = sample_nearest_floor if floor else sample_trilinear

    def exact_path(_):
        return sample_exact(vol, psi).reshape(dims)

    def hybrid_path(_):
        base = (
            sample_nearest_floor_window(vol, psi, max_disp=K)
            if floor
            else sample_trilinear_window(vol, psi, max_disp=K)
        )
        # fixed-capacity compaction: slot i <- flat index of the i-th bad
        # voxel; good voxels (and overflow) land in the dead slot `cap`
        slots = jnp.where(bad, jnp.minimum(cnt - 1, cap), cap)
        idx_buf = jnp.zeros((cap + 1,), jnp.int32).at[slots].set(
            jnp.arange(N, dtype=jnp.int32), mode="drop"
        )
        idx = idx_buf[:cap]
        valid = jnp.arange(cap, dtype=jnp.int32) < total
        pos = psi.reshape(3, -1)[:, idx]
        vals = sample_exact(vol, pos)
        base_flat = base.reshape(-1)
        vals = jnp.where(valid, vals, base_flat[idx])
        return base_flat.at[idx].set(vals).reshape(dims)

    return jax.lax.cond(total <= cap, hybrid_path, exact_path, None)


# ---------------------------------------------------------------------------
# warping
# ---------------------------------------------------------------------------


@jax.jit
def warp_tsdf(
    tsdf: jnp.ndarray, weight: jnp.ndarray, psi: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """phi o psi: sample (tsdf, weight) at the absolute coordinates in psi.

    Mirrors reference apply_kernel (vector_fields.cu:81-100): trilinear for
    the tsdf value, floor-corner for the weight.
    """
    warped = sample_trilinear(tsdf, psi)
    warped_w = sample_nearest_floor(weight, psi)
    return warped, warped_w


@functools.partial(jax.jit, static_argnames=("iters",))
def estimate_inverse(
    psi: jnp.ndarray, iters: int = 48, init: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Fixed-point inverse: psi_inv <- id - disp(psi) o psi_inv, ``iters`` steps.

    Mirrors reference estimate_inverse (vector_fields.cu:111-138; hard-coded
    48 iterations). The displacement field is precomputed once — psi is
    constant during the iteration. ``init`` optionally warm-starts the
    iteration (None = identity, reference semantics).
    """
    ident = identity_field(psi.shape[1:], psi.dtype)
    disp = psi - ident

    def body(_, psi_inv):
        return ident - sample_field_trilinear(disp, psi_inv)

    return jax.lax.fori_loop(0, iters, body, ident if init is None else init)


# ---------------------------------------------------------------------------
# differentiators
# ---------------------------------------------------------------------------

# volume axis for each coordinate: x -> axis 2 (X), y -> axis 1 (Y), z -> axis 0 (Z)
_COORD_AXIS = (2, 1, 0)


@jax.jit
def tsdf_gradient(tsdf: jnp.ndarray) -> jnp.ndarray:
    """Central-difference gradient of a scalar volume -> f32[3,Z,Y,X] (x,y,z).

    Mirrors reference TsdfDifferentiator (vector_fields.cu:157-208): voxel-unit
    spacing, zero on boundary slices.
    """
    return jnp.stack([central_diff(tsdf, _COORD_AXIS[c]) for c in range(3)], axis=0)


@jax.jit
def jacobian(field: jnp.ndarray) -> jnp.ndarray:
    """Jacobian of a vector field -> f32[3,3,Z,Y,X], J[r,c] = d field_r / d x_c.

    Mirrors reference Differentiator mode 0 (vector_fields.cu:415-472).
    For the solver's mode 1 (Jacobian of the displacement) pass
    ``displacement(psi)`` — the identity's Jacobian is I, and the reference
    subtracts the identity before differencing, which is equivalent.
    """
    rows = []
    for r in range(3):
        rows.append(
            jnp.stack(
                [central_diff(field[r], _COORD_AXIS[c]) for c in range(3)], axis=0
            )
        )
    return jnp.stack(rows, axis=0)


def deformation_jacobian(psi: jnp.ndarray) -> jnp.ndarray:
    """Jacobian of the displacement field of psi (reference mode 1)."""
    return jacobian(displacement(psi))


@jax.jit
def interpolate_gradient(tsdf: jnp.ndarray, psi: jnp.ndarray) -> jnp.ndarray:
    """Gradient of a tsdf sampled at psi: (grad tsdf) o psi -> f32[3,Z,Y,X].

    Parity with the reference's interpolate_gradient warp-compose kernel
    (vector_fields.cu:210-240; allocated but unused by the main pipeline).
    """
    grad = tsdf_gradient(tsdf)
    return sample_field_trilinear(grad, psi)


@jax.jit
def interpolate_laplacian(field: jnp.ndarray, psi: jnp.ndarray) -> jnp.ndarray:
    """Negated Laplacian of a field sampled at psi (vector_fields.cu:242-272)."""
    lap = neg_laplacian(field)
    return sample_field_trilinear(lap, psi)


@jax.jit
def neg_laplacian(field: jnp.ndarray) -> jnp.ndarray:
    """Negated 6-neighbour Laplacian: 6f - sum(neighbours), boundary-clamped.

    Mirrors reference SecondOrderDifferentiator::laplacian
    (vector_fields.cu:291-337): per-axis contribution vanishes on that axis's
    boundary slices. Works on f32[..., Z, Y, X] (applied per channel).
    """
    lap = (
        second_diff(field, -1) + second_diff(field, -2) + second_diff(field, -3)
    )
    return -lap


# ---------------------------------------------------------------------------
# host-facing DeformationField wrapper
# ---------------------------------------------------------------------------


class DeformationField:
    """Thin stateful wrapper over a psi array (parity with the reference's
    sobfu::cuda::DeformationField, include/sobfu/vector_fields.hpp:59-112).

    dims is (X, Y, Z) like the reference's volume_dims; data is f32[3,Z,Y,X].
    """

    def __init__(self, dims_xyz: Tuple[int, int, int], data: jnp.ndarray = None):
        self.dims = tuple(int(d) for d in dims_xyz)
        zyx = (self.dims[2], self.dims[1], self.dims[0])
        self.data = identity_field(zyx) if data is None else data

    def clear(self) -> None:
        """Reset to the identity (the reference's 'clear' for psi)."""
        self.data = identity_field(self.data.shape[1:], self.data.dtype)

    def get_displacement(self) -> jnp.ndarray:
        return displacement(self.data)

    def apply(self, tsdf: jnp.ndarray, weight: jnp.ndarray):
        return warp_tsdf(tsdf, weight, self.data)

    def get_inverse(self, iters: int = 48) -> "DeformationField":
        return DeformationField(self.dims, estimate_inverse(self.data, iters))

    def no_nans(self) -> bool:
        """Parity with reference get_no_nans (vector_fields.cpp:31-79)."""
        return not bool(jnp.any(jnp.isnan(self.data)))
