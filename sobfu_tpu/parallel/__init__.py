"""Multi-chip scaling: device meshes, spatial sharding, scene batching."""

from sobfu_tpu.parallel.sharding import (
    make_mesh,
    make_sharded_estimate_psi,
    estimate_psi_sharded,
    make_frame_step,
)

__all__ = [
    "make_mesh",
    "make_sharded_estimate_psi",
    "estimate_psi_sharded",
    "make_frame_step",
]
