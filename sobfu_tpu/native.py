"""ctypes bindings for the native C++ runtime (native/sobfu_runtime.cpp).

The compute path is JAX/XLA on TPU; this module keeps the HOST runtime
native: PNG depth decode, a threaded prefetch ring that overlaps disk I/O
with TPU compute, and a fast VTK mesh writer — the tpu-native counterpart
of the reference app's C++ I/O layer (demo.cpp:177-283).

Falls back transparently to the pure-Python implementations in
:mod:`sobfu_tpu.io` when the shared library has not been built
(``tools/build_native.sh``) — the framework stays functional either way.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "lib", "libsobfu_runtime.so")
_SRC = os.path.join(os.path.dirname(__file__), "..", "native", "sobfu_runtime.cpp")

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        build_native(quiet=True)
    if not os.path.exists(_LIB_PATH):
        raise OSError("native runtime not built (run tools/build_native.sh)")
    lib = ctypes.CDLL(_LIB_PATH)
    u16p = ctypes.POINTER(ctypes.c_uint16)
    ip = ctypes.POINTER(ctypes.c_int)
    lib.decode_depth_png.argtypes = [ctypes.c_char_p, u16p, ip, ip]
    lib.decode_depth_png.restype = ctypes.c_int
    lib.apply_mask_png.argtypes = [ctypes.c_char_p, u16p, ctypes.c_int, ctypes.c_int]
    lib.apply_mask_png.restype = ctypes.c_int
    lib.loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.loader_create.restype = ctypes.c_void_p
    lib.loader_next.argtypes = [ctypes.c_void_p, u16p, ctypes.c_int, ip, ip]
    lib.loader_next.restype = ctypes.c_int
    lib.loader_destroy.argtypes = [ctypes.c_void_p]
    lib.write_mesh_vtk.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_long,
    ]
    lib.write_mesh_vtk.restype = ctypes.c_int
    _lib = lib
    return lib


def build_native(quiet: bool = False) -> bool:
    """Compile the shared library in-tree; returns True on success."""
    script = os.path.join(os.path.dirname(__file__), "..", "tools", "build_native.sh")
    try:
        subprocess.run(
            ["sh", script],
            check=True,
            capture_output=quiet,
        )
        return True
    except (subprocess.CalledProcessError, OSError):
        return False


def available() -> bool:
    try:
        _load()
        return True
    except OSError:
        return False


def decode_depth(path: str) -> np.ndarray:
    """16-bit depth PNG -> uint16 [H, W] via libpng."""
    lib = _load()
    w, h = ctypes.c_int(), ctypes.c_int()
    rc = lib.decode_depth_png(path.encode(), None, ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        raise IOError(f"decode_depth_png probe failed ({rc}): {path}")
    out = np.empty((h.value, w.value), np.uint16)
    rc = lib.decode_depth_png(
        path.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        ctypes.byref(w),
        ctypes.byref(h),
    )
    if rc != 0:
        raise IOError(f"decode_depth_png failed ({rc}): {path}")
    return out


class FrameLoader:
    """Threaded, order-preserving prefetch of depth frames (+ optional masks).

    Worker threads decode ahead while the consumer runs the TPU solve;
    ``capacity`` bounds memory. Iterate to get uint16 [H, W] arrays.
    """

    def __init__(
        self,
        depth_paths: Sequence[str],
        mask_paths: Optional[Sequence[str]] = None,
        capacity: int = 8,
        n_threads: int = 2,
        max_pixels: int = 4096 * 4096,
    ):
        self._lib = _load()
        self._n = len(depth_paths)
        self._max_pixels = max_pixels
        self._dp = (ctypes.c_char_p * self._n)(*[p.encode() for p in depth_paths])
        if mask_paths:
            assert len(mask_paths) == self._n
            self._mp = (ctypes.c_char_p * self._n)(
                *[(p.encode() if p else None) for p in mask_paths]
            )
        else:
            self._mp = None
        self._h = self._lib.loader_create(
            self._dp, self._mp, self._n, capacity, n_threads
        )

    def __iter__(self):
        buf = np.empty(self._max_pixels, np.uint16)
        w, h = ctypes.c_int(), ctypes.c_int()
        while True:
            rc = self._lib.loader_next(
                self._h,
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
                self._max_pixels,
                ctypes.byref(w),
                ctypes.byref(h),
            )
            if rc == 1:
                return
            if rc != 0:
                raise IOError(f"loader_next failed ({rc})")
            yield buf[: h.value * w.value].reshape(h.value, w.value).copy()

    def close(self):
        if self._h:
            self._lib.loader_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def write_mesh_vtk(path: str, vertices: np.ndarray) -> None:
    """Fast native VTK PolyData writer (same format as sobfu_tpu.io)."""
    lib = _load()
    v = np.ascontiguousarray(vertices, np.float32)
    rc = lib.write_mesh_vtk(
        path.encode(),
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_long(v.shape[0]),
    )
    if rc != 0:
        raise IOError(f"write_mesh_vtk failed ({rc}): {path}")
