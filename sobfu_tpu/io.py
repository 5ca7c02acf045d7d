"""I/O: depth/colour/mask loading, VTK mesh export, VTI field export.

Replaces the reference app's OpenCV/PCL/VTK dependencies
(src/apps/demo.cpp:177-283) with PIL + hand-rolled writers for the exact
formats the reference emits:
  * meshes  -> legacy-ASCII ``.vtk`` PolyData (pcl::io::saveVTKFile parity,
               demo.cpp:237-246)
  * fields  -> XML ``.vti`` ImageData with a 3-component vector array
               (save_field, demo.cpp:252-283)
  * depth   -> 16-bit PNGs in millimetres, masked by optional ``omask``
               images (demo.cpp:311-330)
"""

from __future__ import annotations

import os
import struct
from typing import List, Tuple

import numpy as np

from sobfu_tpu.mc import Mesh


# ---------------------------------------------------------------------------
# image loading
# ---------------------------------------------------------------------------


def load_depth(path: str) -> np.ndarray:
    """Load a 16-bit depth PNG (mm) -> uint16 [H, W].

    Uses the native libpng decoder (sobfu_tpu.native) when built; falls
    back to PIL.
    """
    if path.lower().endswith(".png"):
        try:
            from sobfu_tpu import native

            if native.available():
                return native.decode_depth(path)
        except Exception:
            pass
    from PIL import Image

    img = Image.open(path)
    arr = np.asarray(img)
    if arr.dtype == np.uint8:  # 8-bit fallback
        arr = arr.astype(np.uint16)
    if arr.ndim == 3:
        arr = arr[..., 0]
    return arr.astype(np.uint16)


def load_color(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"))


def load_mask(path: str) -> np.ndarray:
    """Object mask: nonzero pixels keep depth (demo.cpp:314-330)."""
    from PIL import Image

    arr = np.asarray(Image.open(path))
    if arr.ndim == 3:
        arr = arr[..., 0]
    return arr > 0


def apply_mask(depth: np.ndarray, mask: np.ndarray) -> np.ndarray:
    return np.where(mask, depth, 0).astype(np.uint16)


def list_frames(data_dir: str) -> Tuple[List[str], List[str], List[str]]:
    """Sorted depth/color/mask file lists from a reference-layout scene dir
    (<dir>/depth, <dir>/color, optional <dir>/omask; demo.cpp:177-198)."""
    depth_dir = os.path.join(data_dir, "depth")
    color_dir = os.path.join(data_dir, "color")
    if not os.path.isdir(depth_dir) or not os.path.isdir(color_dir):
        raise FileNotFoundError(
            f"source directory {data_dir} should contain 'color' and 'depth' folders"
        )
    depths = sorted(
        os.path.join(depth_dir, f) for f in os.listdir(depth_dir)
        if not f.startswith(".")
    )
    colors = sorted(
        os.path.join(color_dir, f) for f in os.listdir(color_dir)
        if not f.startswith(".")
    )
    mask_dir = os.path.join(data_dir, "omask")
    masks = []
    if os.path.isdir(mask_dir):
        masks = sorted(
            os.path.join(mask_dir, f) for f in os.listdir(mask_dir)
            if not f.startswith(".")
        )
    return depths, colors, masks


# ---------------------------------------------------------------------------
# VTK legacy PolyData writer (mesh export)
# ---------------------------------------------------------------------------


def save_mesh_vtk(mesh: Mesh, path: str, binary: bool = False) -> None:
    """Write a triangle mesh as legacy VTK PolyData.

    Matches the output contract of pcl::io::saveVTKFile used by the
    reference (demo.cpp:237-246): POINTS + POLYGONS sections.
    """
    v = np.asarray(mesh.vertices, dtype=np.float32)
    colors = getattr(mesh, "colors", None)
    if not binary and colors is None:
        try:
            from sobfu_tpu import native

            if native.available():
                native.write_mesh_vtk(path, v)
                return
        except Exception:
            pass
    n_pts = v.shape[0]
    n_tri = n_pts // 3
    polys = np.arange(n_pts, dtype=np.int32).reshape(-1, 3)

    with open(path, "wb") as f:
        f.write(b"# vtk DataFile Version 3.0\n")
        f.write(b"sobfu_tpu mesh\n")
        f.write(b"BINARY\n" if binary else b"ASCII\n")
        f.write(b"DATASET POLYDATA\n")
        f.write(f"POINTS {n_pts} float\n".encode())
        if binary:
            f.write(v.astype(">f4").tobytes())
            f.write(b"\n")
        else:
            np.savetxt(f, v, fmt="%.6g")
        f.write(f"POLYGONS {n_tri} {n_tri * 4}\n".encode())
        cells = np.hstack([np.full((n_tri, 1), 3, np.int32), polys])
        if binary:
            f.write(cells.astype(">i4").tobytes())
            f.write(b"\n")
        else:
            np.savetxt(f, cells, fmt="%d")
        if colors is not None and n_pts:
            # per-vertex RGB (VTK legacy COLOR_SCALARS, floats in [0, 1])
            f.write(f"POINT_DATA {n_pts}\n".encode())
            f.write(b"COLOR_SCALARS rgb 3\n")
            if binary:
                # write the original uint8 bytes directly — a float round
                # trip (x/255*255) can shift channel values down by one
                f.write(np.asarray(colors, np.uint8).tobytes())
                f.write(b"\n")
            else:
                cf = np.asarray(colors, np.float32) / 255.0
                np.savetxt(f, cf, fmt="%.4f")


def load_mesh_vtk(path: str) -> Mesh:
    """Read back an ASCII legacy VTK PolyData triangle mesh."""
    with open(path, "r") as f:
        lines = f.read().split("\n")
    i = 0
    pts = None
    while i < len(lines):
        line = lines[i]
        if line.startswith("POINTS"):
            n = int(line.split()[1])
            vals = []
            i += 1
            while len(vals) < 3 * n:
                vals.extend(float(x) for x in lines[i].split())
                i += 1
            pts = np.asarray(vals, np.float32).reshape(n, 3)
            continue
        i += 1
    if pts is None:
        raise ValueError(f"no POINTS in {path}")
    return Mesh(vertices=pts, normals=np.zeros_like(pts))


# ---------------------------------------------------------------------------
# VTI ImageData writer (deformation field export, demo.cpp:252-283)
# ---------------------------------------------------------------------------


def save_field_vti(field_disp: np.ndarray, path: str, spacing=(1.0, 1.0, 1.0)) -> None:
    """Write a displacement field f32[3, Z, Y, X] as an XML .vti file.

    Stores a 3-component 'displacement' vector per voxel (appended raw
    binary, little endian), readable by ParaView/VTK — same information
    content as the reference's save_field (demo.cpp:252-283).
    """
    C, Z, Y, X = field_disp.shape
    assert C == 3
    # interleave to (Z, Y, X, 3) in VTK's x-fastest order; ONE copy
    # (ascontiguousarray with target dtype) — the previous
    # moveaxis->reshape->astype->tobytes chain made three copies of a
    # 25 MB field at 256^3, seconds on a slow host
    data = np.ascontiguousarray(
        np.moveaxis(np.asarray(field_disp), 0, -1), dtype="<f4"
    )
    raw = data.tobytes()
    header = struct.pack("<Q", len(raw))

    with open(path, "wb") as f:
        f.write(b'<?xml version="1.0"?>\n')
        f.write(
            b'<VTKFile type="ImageData" version="1.0" byte_order="LittleEndian" '
            b'header_type="UInt64">\n'
        )
        f.write(
            f'<ImageData WholeExtent="0 {X - 1} 0 {Y - 1} 0 {Z - 1}" '
            f'Origin="0 0 0" Spacing="{spacing[0]} {spacing[1]} {spacing[2]}">\n'.encode()
        )
        f.write(f'<Piece Extent="0 {X - 1} 0 {Y - 1} 0 {Z - 1}">\n'.encode())
        f.write(b'<PointData Vectors="displacement">\n')
        f.write(
            b'<DataArray type="Float32" Name="displacement" NumberOfComponents="3" '
            b'format="appended" offset="0"/>\n'
        )
        f.write(b"</PointData>\n<CellData/>\n</Piece>\n</ImageData>\n")
        f.write(b'<AppendedData encoding="raw">\n_')
        f.write(header)
        f.write(raw)
        f.write(b"\n</AppendedData>\n</VTKFile>\n")


def load_field_vti(path: str) -> np.ndarray:
    """Read a displacement field written by :func:`save_field_vti` back as
    f32[3, Z, Y, X] (the round trip the reference never had — demo.cpp
    only wrote fields; tools/validate_cli_scene.py consumes these to
    check the LOGGED field against analytic ground truth)."""
    with open(path, "rb") as f:
        blob = f.read()
    head, _, rest = blob.partition(b'<AppendedData encoding="raw">\n_')
    import re

    m = re.search(rb'WholeExtent="0 (\d+) 0 (\d+) 0 (\d+)"', head)
    assert m, f"{path}: no WholeExtent"
    X, Y, Z = (int(m.group(i)) + 1 for i in (1, 2, 3))
    (n_bytes,) = struct.unpack("<Q", rest[:8])
    data = np.frombuffer(rest[8 : 8 + n_bytes], dtype="<f4")
    assert data.size == 3 * X * Y * Z, (data.size, X, Y, Z)
    return np.moveaxis(data.reshape(Z, Y, X, 3), -1, 0).copy()
