"""Depth-image preprocessing ops.

TPU-native equivalents of the reference kfusion imgproc kernels
(src/kfusion/cuda/imgproc.cu). All functions are pure, jit-friendly, and
operate on whole images; the data-dependent windows of the bilateral filter
and pyramid are unrolled into static shift/mask sums that XLA fuses into a
single pass.

Conventions:
  * depth maps are ``uint16`` millimetres, shape [H, W] (reference Depth)
  * dists maps are ``float32`` metres (ray lengths)
  * normal/point maps are ``float32[H, W, 3]`` with NaN marking invalid
    pixels (the reference packs float4 with NaN sentinels)
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np



def _shift2d(a: jnp.ndarray, dy: int, dx: int, pad_value=0) -> jnp.ndarray:
    """out[y, x] = a[y+dy, x+dx], `pad_value` outside."""
    H, W = a.shape[:2]
    r = max(abs(dy), abs(dx))
    if r == 0:
        return a
    pad = [(r, r), (r, r)] + [(0, 0)] * (a.ndim - 2)
    padded = jnp.pad(a, pad, constant_values=pad_value)
    return jax.lax.slice(
        padded,
        (r + dy, r + dx) + (0,) * (a.ndim - 2),
        (r + dy + H, r + dx + W) + a.shape[2:],
    )


# ---------------------------------------------------------------------------
# bilateral filter (imgproc.cu:8-53)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("kernel_size",))
def bilateral_filter(
    depth: jnp.ndarray,
    kernel_size: int,
    sigma_spatial: float,
    sigma_depth: float,
) -> jnp.ndarray:
    """Depth-aware bilateral filter on a uint16 mm depth map.

    Faithful to the reference window semantics (imgproc.cu:18-36): offsets
    span [-k/2, k - k/2) and neighbours are clamped to EXCLUDE the last
    row/column (the reference's upper bounds are min(..., dim-1) exclusive).
    sigma_depth is given in metres and converted to millimetres.
    """
    H, W = depth.shape
    d = depth.astype(jnp.float32)
    k = int(kernel_size)
    r = k // 2
    sig_space = 0.5 / (sigma_spatial * sigma_spatial)
    sig_depth_mm = sigma_depth * 1000.0
    sig_color = 0.5 / (sig_depth_mm * sig_depth_mm)

    yy = jnp.arange(H, dtype=jnp.int32)[:, None]
    xx = jnp.arange(W, dtype=jnp.int32)[None, :]

    sum1 = jnp.zeros_like(d)
    sum2 = jnp.zeros_like(d)
    for dy in range(-r, k - r):
        for dx in range(-r, k - r):
            nb = _shift2d(d, dy, dx)
            valid = (
                (yy + dy >= 0)
                & (yy + dy <= H - 2)
                & (xx + dx >= 0)
                & (xx + dx <= W - 2)
            )
            space2 = float(dx * dx + dy * dy)
            color2 = (d - nb) * (d - nb)
            w = jnp.where(valid, jnp.exp(-(space2 * sig_space + color2 * sig_color)), 0.0)
            sum1 = sum1 + nb * w
            sum2 = sum2 + w
    return jnp.rint(sum1 / sum2).astype(jnp.uint16)


# ---------------------------------------------------------------------------
# depth truncation (imgproc.cu:60-77)
# ---------------------------------------------------------------------------


@jax.jit
def truncate_depth(depth: jnp.ndarray, max_dist_m: jnp.ndarray) -> jnp.ndarray:
    """Zero out depths beyond max_dist metres (input/output uint16 mm)."""
    max_mm = (max_dist_m * 1000.0).astype(jnp.uint16)
    return jnp.where(depth > max_mm, jnp.uint16(0), depth)


# ---------------------------------------------------------------------------
# dists: depth -> metric ray length (imgproc.cu:233-254)
# ---------------------------------------------------------------------------


@jax.jit
def compute_dists(depth: jnp.ndarray, intr: jnp.ndarray) -> jnp.ndarray:
    """dists = depth_mm * sqrt(xl^2 + yl^2 + 1) * 0.001; intr = (fx,fy,cx,cy)."""
    H, W = depth.shape
    fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]
    xl = (jnp.arange(W, dtype=jnp.float32)[None, :] - cx) / fx
    yl = (jnp.arange(H, dtype=jnp.float32)[:, None] - cy) / fy
    lam = jnp.sqrt(xl * xl + yl * yl + 1.0)
    return depth.astype(jnp.float32) * lam * 0.001


# ---------------------------------------------------------------------------
# depth pyramid (imgproc.cu:84-122)
# ---------------------------------------------------------------------------


@jax.jit
def depth_pyramid_down(depth: jnp.ndarray, sigma_depth: jnp.ndarray) -> jnp.ndarray:
    """Half-resolution downsample averaging a 5x5 window around (2y, 2x),
    keeping only values within 3*sigma (mm) of the centre."""
    H, W = depth.shape
    Ho, Wo = H // 2, W // 2
    d = depth.astype(jnp.float32)
    center = d[: 2 * Ho : 2, : 2 * Wo : 2]
    thresh = sigma_depth * 1000.0 * 3.0

    yy = jnp.arange(Ho, dtype=jnp.int32)[:, None] * 2
    xx = jnp.arange(Wo, dtype=jnp.int32)[None, :] * 2

    D = 5
    rr = D // 2
    total = jnp.zeros_like(center)
    count = jnp.zeros_like(center)
    for dy in range(-rr, D - rr):
        for dx in range(-rr, D - rr):
            nb = _shift2d(d, dy, dx)[: 2 * Ho : 2, : 2 * Wo : 2]
            valid = (
                (yy + dy >= 0)
                & (yy + dy <= H - 2)
                & (xx + dx >= 0)
                & (xx + dx <= W - 2)
                & (jnp.abs(nb - center) < thresh)
            )
            total = total + jnp.where(valid, nb, 0.0)
            count = count + valid.astype(jnp.float32)
    out = jnp.where(count == 0, 0.0, total / jnp.maximum(count, 1.0))
    return jnp.floor(out).astype(jnp.uint16)


# ---------------------------------------------------------------------------
# normals / point maps (imgproc.cu:129-226)
# ---------------------------------------------------------------------------


def _reproject(depth_m: jnp.ndarray, intr: jnp.ndarray) -> jnp.ndarray:
    """Back-project a metric depth map -> camera-space points [H, W, 3]."""
    H, W = depth_m.shape
    fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]
    u = jnp.arange(W, dtype=jnp.float32)[None, :]
    v = jnp.arange(H, dtype=jnp.float32)[:, None]
    x = depth_m * (u - cx) / fx
    y = depth_m * (v - cy) / fy
    return jnp.stack([x, y, depth_m], axis=-1)


@jax.jit
def compute_normals(depth: jnp.ndarray, intr: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel normals from right/down neighbour cross products, NaN invalid.

    Mirrors compute_normals_kernel (imgproc.cu:129-157): n = -normalize(
    (v01-v00) x (v10-v00)); invalid when any of the three depths is 0 or the
    pixel is on the last row/column.
    """
    H, W = depth.shape
    d = depth.astype(jnp.float32) * 0.001
    pts = _reproject(d, intr)

    v00 = pts
    v01 = _shift2d(pts, 0, 1)
    v10 = _shift2d(pts, 1, 0)

    n = jnp.cross(v01 - v00, v10 - v00)
    n = -n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)

    z00 = d
    z01 = _shift2d(d, 0, 1)
    z10 = _shift2d(d, 1, 0)
    yy = jnp.arange(H)[:, None]
    xx = jnp.arange(W)[None, :]
    valid = (z00 * z01 * z10 != 0) & (yy < H - 1) & (xx < W - 1)
    return jnp.where(valid[..., None], n, jnp.nan)


@jax.jit
def mask_depth(depth: jnp.ndarray, normals: jnp.ndarray) -> jnp.ndarray:
    """Zero depth where the normal is NaN (imgproc.cu:159-168)."""
    return jnp.where(jnp.isnan(normals[..., 0]), jnp.uint16(0), depth)


@jax.jit
def compute_points_normals(
    depth: jnp.ndarray, intr: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Camera-space point + normal maps, NaN where invalid (imgproc.cu:187-226)."""
    normals = compute_normals(depth, intr)
    d = depth.astype(jnp.float32) * 0.001
    pts = _reproject(d, intr)
    valid = ~jnp.isnan(normals[..., 0])
    points = jnp.where(valid[..., None], pts, jnp.nan)
    return points, normals


# ---------------------------------------------------------------------------
# half-resolution resizes (imgproc.cu:258-359)
# ---------------------------------------------------------------------------


@jax.jit
def resize_depth_normals(
    depth: jnp.ndarray, normals: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """2x2 average of depth (uint16 mm) + normals; invalid if any depth is 0."""
    H, W = depth.shape
    Ho, Wo = H // 2, W // 2
    d = depth.astype(jnp.float32)

    d00 = d[0 : 2 * Ho : 2, 0 : 2 * Wo : 2]
    d01 = d[0 : 2 * Ho : 2, 1 : 2 * Wo : 2]
    d10 = d[1 : 2 * Ho : 2, 0 : 2 * Wo : 2]
    d11 = d[1 : 2 * Ho : 2, 1 : 2 * Wo : 2]
    ok = (d00 * d01 != 0) & (d10 * d11 != 0)
    d_out = jnp.where(ok, jnp.floor((d00 + d01 + d10 + d11) / 4.0), 0.0)

    n00 = normals[0 : 2 * Ho : 2, 0 : 2 * Wo : 2]
    n01 = normals[0 : 2 * Ho : 2, 1 : 2 * Wo : 2]
    n10 = normals[1 : 2 * Ho : 2, 0 : 2 * Wo : 2]
    n11 = normals[1 : 2 * Ho : 2, 1 : 2 * Wo : 2]
    n_out = jnp.where(ok[..., None], (n00 + n01 + n10 + n11) * 0.25, jnp.nan)
    return d_out.astype(jnp.uint16), n_out


@jax.jit
def resize_points_normals(
    points: jnp.ndarray, normals: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """2x2 average of point + normal maps; NaN-invalid if any sample is NaN."""
    H, W = points.shape[:2]
    Ho, Wo = H // 2, W // 2

    def avg(a):
        a00 = a[0 : 2 * Ho : 2, 0 : 2 * Wo : 2]
        a01 = a[0 : 2 * Ho : 2, 1 : 2 * Wo : 2]
        a10 = a[1 : 2 * Ho : 2, 0 : 2 * Wo : 2]
        a11 = a[1 : 2 * Ho : 2, 1 : 2 * Wo : 2]
        return (a00 + a01 + a10 + a11) * 0.25

    p_out = avg(points)  # NaN propagates automatically, matching the guard
    n_out = avg(normals)
    return p_out, n_out


# ---------------------------------------------------------------------------
# surface rasteriser (imgproc.cu:364-448)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("height", "width", "samples_per_edge"))
def rasterise_surface(
    vertices: jnp.ndarray,
    vol2cam: jnp.ndarray,
    intr: jnp.ndarray,
    height: int,
    width: int,
    samples_per_edge: int = 4,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Render a triangle soup to camera-space point + normal maps.

    Same contract as the reference rasteriseSurface (imgproc.cu:364-448):
    triangles (volume coords) -> z-tested point map + finite-difference
    normals. The reference loops over each triangle's bounding box with an
    approximate z-test; a data-dependent loop does not map to XLA, so here
    each triangle is SAMPLED at a static barycentric lattice and splatted
    with a scatter-min z-buffer — same approximation class, compiler-friendly.

    vertices: f32[N, 3] (N divisible by 3), NaN rows ignored.
    Returns (points [H,W,3], normals [H,W,3]) with 0 marking empty pixels.
    """
    tri = vertices.reshape(-1, 3, 3)
    R = vol2cam[:3, :3]
    t = vol2cam[:3, 3]
    cam = jnp.einsum("ntj,ij->nti", tri, R) + t  # [N,3,3] camera coords

    # static barycentric lattice
    bary = []
    m = samples_per_edge
    for i in range(m + 1):
        for j in range(m + 1 - i):
            k = m - i - j
            bary.append((i / m, j / m, k / m))
    bary = jnp.asarray(bary, dtype=jnp.float32)  # [B, 3]

    pts = jnp.einsum("bk,nkc->nbc", bary, cam).reshape(-1, 3)  # [N*B, 3]

    fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]
    z = pts[:, 2]
    u = (fx * pts[:, 0] / z + cx).astype(jnp.int32)
    v = (fy * pts[:, 1] / z + cy).astype(jnp.int32)
    ok = (u >= 0) & (u < width) & (v >= 0) & (v < height) & (z > 0) & ~jnp.isnan(z)

    flat = jnp.where(ok, v * width + u, height * width)  # dump slot at the end
    zbuf = jnp.full(height * width + 1, jnp.inf, jnp.float32)
    zbuf = zbuf.at[flat].min(jnp.where(ok, z, jnp.inf))

    # keep a point only where it wins the z-test
    win = ok & (z <= jnp.take(zbuf, flat) + 1e-7)
    pmap = jnp.zeros((height * width + 1, 3), jnp.float32)
    pmap = pmap.at[jnp.where(win, flat, height * width)].set(
        jnp.where(win[:, None], pts, 0.0)
    )
    points = pmap[:-1].reshape(height, width, 3)

    # finite-difference normals like the reference's second pass
    v0 = points
    v1 = _shift2d(points, 1, 0)
    v2 = _shift2d(points, 0, 1)
    n = jnp.cross(v1 - v0, v2 - v0)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    have = (jnp.abs(points[..., 2]) > 0) & (norm[..., 0] > 1e-12)
    normals = jnp.where(have[..., None], n / jnp.maximum(norm, 1e-12), 0.0)
    return points, normals


# ---------------------------------------------------------------------------
# rendering (imgproc.hpp:30,42-46 — declared in the reference but, like
# KinFu::operator(), never implemented there; provided working here)
# ---------------------------------------------------------------------------


@jax.jit
def render_tangent_colors(normals: jnp.ndarray) -> jnp.ndarray:
    """Normal map -> RGB tangent colors, uint8 [H, W, 3].

    Standard mapping color = (n * 0.5 + 0.5); invalid (NaN) pixels black.
    Parity surface for renderTangentColors (imgproc.hpp:30).
    """
    valid = ~jnp.isnan(normals[..., 0])
    rgb = jnp.clip((normals * 0.5 + 0.5) * 255.0, 0, 255)
    return jnp.where(valid[..., None], rgb, 0.0).astype(jnp.uint8)


@jax.jit
def render_image(
    points: jnp.ndarray,
    normals: jnp.ndarray,
    light_pose: jnp.ndarray,
) -> jnp.ndarray:
    """Lambertian + specular shading of a point/normal map -> uint8 [H, W, 3].

    The classic KinectFusion display shader (parity surface for renderImage,
    imgproc.hpp:42-46): ambient + diffuse(N·L) + Blinn specular, grayscale.
    """
    valid = ~jnp.isnan(points[..., 0]) & ~jnp.isnan(normals[..., 0])
    L = light_pose[None, None, :] - points
    L = L / jnp.maximum(jnp.linalg.norm(L, axis=-1, keepdims=True), 1e-12)
    N = normals
    ndotl = jnp.abs(jnp.sum(N * L, axis=-1))
    V = -points
    V = V / jnp.maximum(jnp.linalg.norm(V, axis=-1, keepdims=True), 1e-12)
    Hv = (L + V)
    Hv = Hv / jnp.maximum(jnp.linalg.norm(Hv, axis=-1, keepdims=True), 1e-12)
    spec = jnp.abs(jnp.sum(N * Hv, axis=-1)) ** 16
    intensity = jnp.clip(0.1 + 0.75 * ndotl + 0.3 * spec, 0.0, 1.0)
    gray = jnp.where(valid, intensity * 255.0, 0.0)
    return jnp.repeat(gray[..., None], 3, axis=-1).astype(jnp.uint8)
