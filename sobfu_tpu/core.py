"""Device discovery, info printing, and profiler tracing.

Parity surface with the reference device layer (src/kfusion/core.cpp:8-38:
getCudaEnabledDeviceCount / setDevice / printCudaDeviceInfo /
checkIfPreFermiGPU) rebuilt over ``jax.devices()``, plus a timeline-tracing
helper the reference never had (SURVEY.md §5 — "no GPU timeline tracing").
"""

from __future__ import annotations

import contextlib
import os
from typing import List, Optional

import jax


def get_device_count(platform: Optional[str] = None) -> int:
    """Number of accelerator devices (reference getCudaEnabledDeviceCount)."""
    try:
        return len(jax.devices(platform) if platform else jax.devices())
    except RuntimeError:
        return 0


def get_devices(platform: Optional[str] = None) -> List:
    return jax.devices(platform) if platform else jax.devices()


def print_device_info(device=None) -> None:
    """Print accelerator info (reference printCudaDeviceInfo, core.cpp)."""
    devices = [device] if device is not None else jax.devices()
    for d in devices:
        mem = getattr(d, "memory_stats", lambda: None)()
        line = f"[{d.id}] {d.device_kind} ({d.platform})"
        if mem and "bytes_limit" in mem:
            line += f", {mem['bytes_limit'] / 2**30:.1f} GiB"
        print(line)


def check_accelerator() -> bool:
    """True when a TPU/GPU backend is available (the reference aborted on
    pre-Fermi GPUs, core.cpp:31-38; here any accelerator qualifies and CPU
    still works — the same code runs on every JAX backend)."""
    return jax.default_backend() != "cpu"


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/sobfu_trace"):
    """Capture a device timeline trace viewable in TensorBoard/Perfetto.

    Usage::

        with core.profile_trace("/tmp/trace"):
            fusion(depth)
    """
    os.makedirs(log_dir, exist_ok=True)
    try:
        jax.profiler.start_trace(log_dir)
        yield log_dir
    finally:
        try:
            jax.profiler.stop_trace()
        except Exception:
            pass
