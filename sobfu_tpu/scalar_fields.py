"""Scalar voxel fields.

Parity surface with the reference ``sobfu::cuda::ScalarField``
(include/sobfu/scalar_fields.hpp:19-78, src/sobfu/cuda/scalar_fields.cu):
a float-per-voxel field with ``clear`` and an all-voxel ``sum``. The
reference implements the sum as a two-stage block reduction with a final
CPU pass (scalar_fields.cu:23-110); on TPU it is a single ``jnp.sum`` that
never leaves the device.

The main pipeline never instantiates one (SURVEY.md §2) — this module
exists so code written against the reference API has a drop-in equivalent.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


class ScalarField:
    """float-per-voxel 3-D field. dims is (X, Y, Z); data is f32[Z, Y, X]."""

    def __init__(self, dims_xyz: Tuple[int, int, int], data: jnp.ndarray = None):
        self.dims = tuple(int(d) for d in dims_xyz)
        zyx = (self.dims[2], self.dims[1], self.dims[0])
        self.data = jnp.zeros(zyx, jnp.float32) if data is None else data

    def clear(self) -> None:
        self.data = jnp.zeros_like(self.data)

    def sum(self) -> float:
        """Sum over all voxels (reference reduce_sum, scalar_fields.hpp:72-76)."""
        return float(jnp.sum(self.data))

    def print(self) -> None:  # parity with the reference debug printer
        import numpy as np

        print(np.asarray(self.data))
