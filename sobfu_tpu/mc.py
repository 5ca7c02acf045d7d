"""Marching cubes on device: TSDF volume -> triangle soup.

TPU-native rework of the reference 3-stage GPU pipeline
(src/kfusion/cuda/marching_cubes.cu):
  1. occupied-voxel detection: cube index per cell with zero-weight
     early-out (marching_cubes.cu:34-79) — here a vectorised pass over the
     full grid; warp-ballot compaction (marching_cubes.cu:81-165) becomes a
     cumsum-scatter into a fixed-capacity index buffer.
  2. vertex offsets: thrust exclusive_scan (marching_cubes.cu:167-183)
     becomes `jnp.cumsum` on the compacted counts.
  3. triangle generation: 12-edge interpolation + flat per-triangle normals
     (marching_cubes.cu:185-312), scattered into a fixed-capacity buffer
     (the reference also uses a fixed 6M-point buffer,
     marching_cubes.hpp:22).

Everything up to the final host trim runs under jit with static shapes.

Lookup tables are the standard public-domain Lorensen & Cline / Bourke
constants (identical to reference marching_cubes.cpp:80-368), stored as
binary data in ``mc_tables.npz`` and consistency-checked at extraction time
(tools/extract_mc_tables.py).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_TABLE_PATH = os.path.join(os.path.dirname(__file__), "mc_tables.npz")
_tables = np.load(_TABLE_PATH)
TRI_TABLE = np.asarray(_tables["tri_table"], dtype=np.int32)  # [256, 16]
NUM_VERTS_TABLE = np.asarray(_tables["num_verts_table"], dtype=np.int32)  # [256]
EDGE_TABLE = np.asarray(_tables["edge_table"], dtype=np.int32)  # [256]

# cube corner offsets (x, y, z), reference marching_cubes.cu:222-230
CORNERS = np.asarray(
    [
        (0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0),
        (0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1),
    ],
    dtype=np.int32,
)
# the 12 cube edges as (corner_a, corner_b), reference marching_cubes.cu:235-246
EDGES = np.asarray(
    [
        (0, 1), (1, 2), (2, 3), (3, 0),
        (4, 5), (5, 6), (6, 7), (7, 4),
        (0, 4), (1, 5), (2, 6), (3, 7),
    ],
    dtype=np.int32,
)

# matches the reference's fixed output buffer (marching_cubes.hpp:22)
DEFAULT_MAX_VERTICES = 6_000_000
DEFAULT_MAX_OCCUPIED = 1 << 20


@dataclasses.dataclass
class Mesh:
    """Triangle soup: consecutive vertex triples form triangles."""

    vertices: np.ndarray  # f32[n, 3]
    normals: np.ndarray  # f32[n, 3]
    colors: "np.ndarray | None" = None  # u8[n, 3] per-vertex RGB (optional)

    @property
    def n_triangles(self) -> int:
        return self.vertices.shape[0] // 3

    def polygons(self) -> np.ndarray:
        return np.arange(self.vertices.shape[0], dtype=np.int64).reshape(-1, 3)


# ---------------------------------------------------------------------------
# stage 1: cube classification
# ---------------------------------------------------------------------------


def _corner_view(vol: jnp.ndarray, corner: np.ndarray) -> jnp.ndarray:
    """View of vol at cube corner offsets -> [Z-1, Y-1, X-1]."""
    Z, Y, X = vol.shape
    dx, dy, dz = int(corner[0]), int(corner[1]), int(corner[2])
    return jax.lax.slice(vol, (dz, dy, dx), (dz + Z - 1, dy + Y - 1, dx + X - 1))


def classify_cubes(
    tsdf: jnp.ndarray, weight: jnp.ndarray, iso: float = 0.0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cube index + vertex count per cell (reference computeCubeIndex,
    marching_cubes.cu:40-79): bit i set iff corner i's tsdf < iso; index
    forced to 0 (no triangles) when ANY corner weight is 0."""
    idx = jnp.zeros(tuple(d - 1 for d in tsdf.shape), jnp.int32)
    all_weighted = None
    for i in range(8):
        f = _corner_view(tsdf, CORNERS[i])
        w = _corner_view(weight, CORNERS[i])
        idx = idx + (f < iso).astype(jnp.int32) * (1 << i)
        ok = w != 0.0
        all_weighted = ok if all_weighted is None else (all_weighted & ok)
    idx = jnp.where(all_weighted, idx, 0)
    n_verts = jnp.take(jnp.asarray(NUM_VERTS_TABLE), idx)
    return idx, n_verts


# ---------------------------------------------------------------------------
# stages 2+3: compaction + triangle generation
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("max_occupied", "max_vertices", "flip_yz")
)
def marching_cubes(
    tsdf: jnp.ndarray,
    weight: jnp.ndarray,
    cell_size: jnp.ndarray,
    pose: jnp.ndarray,
    iso: float = 0.0,
    max_occupied: int = DEFAULT_MAX_OCCUPIED,
    max_vertices: int = DEFAULT_MAX_VERTICES,
    flip_yz: bool = True,
):
    """Extract the iso-surface -> fixed-capacity (vertices, normals, counts).

    cell_size: f32[3] metric voxel sizes (x, y, z); pose: f32[4,4] applied to
    each vertex. When flip_yz, outputs are stored as (x, -y, -z) after the
    pose, matching the reference store_point (marching_cubes.cu:273-276).

    Returns (vertices f32[max_vertices,3], normals f32[max_vertices,3],
    n_vertices i32, n_occupied i32). Slots beyond n_vertices are zero.
    """
    Z, Y, X = tsdf.shape
    cube_idx, n_verts = classify_cubes(tsdf, weight, iso)
    ci_flat = cube_idx.reshape(-1)
    nv_flat = n_verts.reshape(-1)
    n_cubes = ci_flat.shape[0]

    # --- compaction of occupied cubes (replaces ballot+atomics) ---
    occ = nv_flat > 0
    pos = jnp.cumsum(occ.astype(jnp.int32)) - occ.astype(jnp.int32)  # exclusive
    n_occupied = jnp.sum(occ.astype(jnp.int32))
    dump = max_occupied  # overflow slot
    dest = jnp.where(occ & (pos < max_occupied), pos, dump)
    ids_buf = jnp.zeros(max_occupied + 1, jnp.int32)
    cube_ids = jax.lax.iota(jnp.int32, n_cubes)
    ids_buf = ids_buf.at[dest].set(cube_ids, mode="drop")
    occ_ids = ids_buf[:max_occupied]
    slot_valid = jax.lax.iota(jnp.int32, max_occupied) < jnp.minimum(
        n_occupied, max_occupied
    )

    # --- per-occupied-cube data ---
    occ_ci = jnp.where(slot_valid, jnp.take(ci_flat, occ_ids), 0)
    occ_nv = jnp.take(jnp.asarray(NUM_VERTS_TABLE), occ_ci)
    # vertex offsets: exclusive cumsum over the compacted cubes
    offsets = jnp.cumsum(occ_nv) - occ_nv

    cx = occ_ids % (X - 1)
    cy = (occ_ids // (X - 1)) % (Y - 1)
    cz = occ_ids // ((X - 1) * (Y - 1))

    # corner tsdf values + metric corner coords
    tsdf_flat = tsdf.reshape(-1)
    f = []
    p = []
    for i in range(8):
        dx, dy, dz = (int(c) for c in CORNERS[i])
        flat = ((cz + dz) * Y + (cy + dy)) * X + (cx + dx)
        f.append(jnp.take(tsdf_flat, flat))
        p.append(
            jnp.stack(
                [
                    (cx + dx + 0.5).astype(jnp.float32) * cell_size[0],
                    (cy + dy + 0.5).astype(jnp.float32) * cell_size[1],
                    (cz + dz + 0.5).astype(jnp.float32) * cell_size[2],
                ],
                axis=-1,
            )
        )
    f = jnp.stack(f, axis=0)  # [8, cap]
    p = jnp.stack(p, axis=0)  # [8, cap, 3]

    # 12 edge-interpolated vertices (vertex_interp, marching_cubes.cu:196-203)
    edge_pts = []
    for e in range(12):
        a, b = int(EDGES[e, 0]), int(EDGES[e, 1])
        t = (iso - f[a]) / (f[b] - f[a] + 1e-15)
        edge_pts.append(p[a] + t[:, None] * (p[b] - p[a]))
    edge_pts = jnp.stack(edge_pts, axis=1)  # [cap, 12, 3]

    # triangle vertex slots: tri_table[ci, 0:15] selects edges
    tri = jnp.take(jnp.asarray(TRI_TABLE), occ_ci, axis=0)  # [cap, 16]
    sel = jnp.clip(tri[:, :15], 0, 11)  # [cap, 15]
    verts = jnp.take_along_axis(edge_pts, sel[:, :, None], axis=1)  # [cap,15,3]

    # flat per-triangle normals: n = normalize((v3-v1) x (v2-v1))
    # (marching_cubes.cu:260)
    v1 = verts[:, 0::3]
    v2 = verts[:, 1::3]
    v3 = verts[:, 2::3]
    n = jnp.cross(v3 - v1, v2 - v1)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    normals = jnp.repeat(n, 3, axis=1)  # [cap, 15, 3]

    # pose transform + reference's (x, -y, -z) store convention
    R = pose[:3, :3]
    t4 = pose[:3, 3]
    verts = jnp.einsum("cvj,ij->cvi", verts, R) + t4
    if flip_yz:
        flip = jnp.asarray([1.0, -1.0, -1.0], jnp.float32)
        verts = verts * flip
        normals = normals * flip

    # scatter into the fixed-capacity output
    slot_i = jax.lax.broadcasted_iota(jnp.int32, (max_occupied, 15), 1)
    valid = slot_valid[:, None] & (slot_i < occ_nv[:, None])
    out_idx = offsets[:, None] + slot_i
    valid = valid & (out_idx < max_vertices)
    out_idx = jnp.where(valid, out_idx, max_vertices)

    vbuf = jnp.zeros((max_vertices + 1, 3), jnp.float32)
    nbuf = jnp.zeros((max_vertices + 1, 3), jnp.float32)
    vbuf = vbuf.at[out_idx.reshape(-1)].set(
        jnp.where(valid.reshape(-1)[:, None], verts.reshape(-1, 3), 0.0),
        mode="drop",
    )
    nbuf = nbuf.at[out_idx.reshape(-1)].set(
        jnp.where(valid.reshape(-1)[:, None], normals.reshape(-1, 3), 0.0),
        mode="drop",
    )

    n_vertices = jnp.minimum(
        jnp.sum(jnp.where(slot_valid, occ_nv, 0)), max_vertices
    )
    return vbuf[:max_vertices], nbuf[:max_vertices], n_vertices, n_occupied


def extract_mesh(
    tsdf: jnp.ndarray,
    weight: jnp.ndarray,
    voxel_sizes,
    pose: Optional[np.ndarray] = None,
    iso: float = 0.0,
    max_occupied: Optional[int] = None,
    max_vertices: Optional[int] = None,
    flip_yz: bool = True,
) -> Mesh:
    """Host-facing wrapper: run MC and trim to the valid vertex count.

    Capacities default to min(reference cap, exact worst case for this
    grid) — a 24^3 debug volume then costs ~14K-cube buffers instead of the
    reference's fixed 6M-point allocation (marching_cubes.hpp:22), with
    identical results (capacity >= any possible output, so no truncation).
    """
    if pose is None:
        pose = np.eye(4, dtype=np.float32)
    n_cells = int(np.prod(tsdf.shape))
    if max_occupied is None:
        max_occupied = min(DEFAULT_MAX_OCCUPIED, n_cells)
    if max_vertices is None:
        max_vertices = min(DEFAULT_MAX_VERTICES, 15 * max_occupied)
    v, n, count, _ = marching_cubes(
        tsdf,
        weight,
        jnp.asarray(voxel_sizes, jnp.float32),
        jnp.asarray(pose, jnp.float32),
        iso=iso,
        max_occupied=max_occupied,
        max_vertices=max_vertices,
        flip_yz=flip_yz,
    )
    count = int(count)
    # BUCKETED device trim: v[:count] with the exact per-frame count would
    # lower a distinct slice program per count — on a remote-compile
    # backend that is a fresh ~3 s helper round trip EVERY frame. Round
    # the slice up to a bucket (<= ~24 distinct cached programs for any
    # capacity) and trim exactly on the host.
    bucket = min(max_vertices, max(65536, -(-count // 65536) * 65536))
    v_h = np.asarray(v[:bucket])
    n_h = np.asarray(n[:bucket])
    return Mesh(vertices=v_h[:count], normals=n_h[:count])
