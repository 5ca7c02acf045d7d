"""Energy / convergence reductions over the voxel grid.

Parity surface with the reference ``sobfu::device::Reductor``
(include/sobfu/reductor.hpp:24-75, src/sobfu/cuda/reductor.cu). The
reference runs two-stage grid-stride reductions with a shared-memory tree +
warp shuffle finish and a FINAL STAGE ON THE CPU after a cudaMemcpy
(reductor.cpp:68-79) — a device→host sync every solver iteration. Here
every reduction is a ``jnp`` op that stays on device; the solver consumes
these from inside its ``lax.while_loop`` with no host round-trip.

The functional versions live in :mod:`sobfu_tpu.solver` (data_energy,
reg_energy_sobolev, max_update_norm); this class is the object-style
wrapper mirroring the reference's API for code written against it.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from sobfu_tpu import fields as _fields
from sobfu_tpu import solver as _solver


class Reductor:
    """Reductions over dims (X, Y, Z) voxel grids (reference reductor.hpp:24-50)."""

    def __init__(self, dims_xyz: Tuple[int, int, int]):
        self.dims = tuple(int(d) for d in dims_xyz)

    # -- energies (reference reductor.cpp:38-50) ----------------------------
    def data_energy(self, phi_global: jnp.ndarray, phi_n_psi: jnp.ndarray) -> float:
        """0.5 * sum (phi_global - phi_n_psi)^2 (reduce_data_kernel,
        reductor.cu:11-112)."""
        return float(_solver.data_energy(phi_global, phi_n_psi))

    def reg_energy_sobolev(self, psi: jnp.ndarray) -> float:
        """0.5 * sum ||J(disp(psi))||_F^2 (reduce_reg_sobolev_kernel,
        reductor.cu:114-214)."""
        return float(_solver.reg_energy_sobolev(psi))

    # -- convergence (reference reductor.cpp:52-57) -------------------------
    def max_update_norm(self, updates: jnp.ndarray) -> Tuple[float, int]:
        """(max ||update||, flat argmax index) over f32[3,Z,Y,X]
        (reduce_max_kernel, reductor.cu:342-455)."""
        norm, idx = _solver.max_update_norm(updates)
        return float(norm), int(idx)

    def voxel_max_energy(
        self,
        phi_global: jnp.ndarray,
        phi_n_psi: jnp.ndarray,
        psi: jnp.ndarray,
        w_reg: float,
    ) -> Tuple[float, int]:
        """(max per-voxel energy, flat argmax index).

        Implements the reference's reduce_voxel_max_energy_kernel
        (reductor.cu:216-340; defined there but never called): per-voxel
        energy = 0.5*(phi_g - phi_n_psi)^2 + 0.5*w_reg*||J(disp)||_F^2 with
        the Jacobian's 9 entries summed at each voxel.
        """
        d = phi_global - phi_n_psi
        J = _fields.deformation_jacobian(psi)  # [3, 3, Z, Y, X]
        e = 0.5 * d * d + 0.5 * w_reg * jnp.sum(J * J, axis=(0, 1))
        flat = e.reshape(-1)
        idx = jnp.argmax(flat)
        return float(flat[idx]), int(idx)
