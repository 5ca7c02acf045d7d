"""sobfu_tpu — a TPU-native SobolevFusion framework.

A from-scratch JAX/XLA/Pallas re-design of non-rigid TSDF fusion
(Slavcheva et al., SobolevFusion, CVPR 2018) with the full capability
surface of the reference CUDA implementation (dgrzech/sobfu):

- depth preprocessing (bilateral filter, truncation, dists, pyramids,
  normal/point maps)                               -> :mod:`sobfu_tpu.ops.imgproc`
- TSDF volumes (projective integration, volume fusion, analytic SDFs)
                                                   -> :mod:`sobfu_tpu.tsdf`
- deformation fields + differentiators             -> :mod:`sobfu_tpu.fields`
- the Sobolev-gradient-descent warp-field solver   -> :mod:`sobfu_tpu.solver`
- marching cubes mesh extraction                   -> :mod:`sobfu_tpu.mc`
- rigid projective ICP                             -> :mod:`sobfu_tpu.icp`
- the end-to-end pipeline                          -> :mod:`sobfu_tpu.pipeline`
- multi-chip spatial sharding / batching           -> :mod:`sobfu_tpu.parallel`

Design stance (TPU-first, not a CUDA translation):
  * all state is jax Arrays; one jit-compiled frame step
  * the gradient-descent loop is a `lax.while_loop` whose convergence
    predicate lives on device (the reference synced to host every
    iteration: /root/reference/src/sobfu/cuda/solver.cu:172)
  * stencils/convolutions are XLA fusions or Pallas kernels
  * reductions are `jnp` ops, no hand-rolled trees
  * scaling = `shard_map` over a device mesh, halo exchange via
    collectives, scene batching via `vmap`
"""

from sobfu_tpu.config import Intr, Params, load_params
from sobfu_tpu.tsdf import TsdfVolume
from sobfu_tpu.fields import DeformationField
from sobfu_tpu.pipeline import SobFusion
from sobfu_tpu.scalar_fields import ScalarField
from sobfu_tpu.reductor import Reductor

__version__ = "0.2.0"

__all__ = [
    "Intr",
    "Params",
    "load_params",
    "TsdfVolume",
    "DeformationField",
    "SobFusion",
    "ScalarField",
    "Reductor",
    "__version__",
]
