"""Multi-chip scaling: device meshes, spatial sharding, scene batching."""

from sobfu_tpu.parallel.sharding import (
    make_mesh,
    estimate_psi_sharded,
    frame_step_sharded,
)

__all__ = ["make_mesh", "estimate_psi_sharded", "frame_step_sharded"]
