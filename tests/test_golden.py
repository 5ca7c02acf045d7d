"""Golden regression: the solver's numerics must not drift across refactors.

The golden file was produced by the CPU backend at a fixed configuration
(16^3 spheres, 32 iterations); CPU float32 arithmetic is deterministic, so
any mismatch beyond small tolerance indicates a semantic change — update
the golden deliberately (tests/golden/README) if the change is intended.
"""

import os

import jax.numpy as jnp
import numpy as np

from sobfu_tpu import fields, solver
from sobfu_tpu.tsdf import init_sphere

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "solver_16.npz")


def test_solver_matches_golden():
    dims = (16, 16, 16)
    vs = 0.25 / 16
    tg, wg = init_sphere(dims, (vs,) * 3, (0.125, 0.125, 0.125), 0.04, 8 * vs, 3 * vs)
    tn, wn = init_sphere(dims, (vs,) * 3, (0.118, 0.125, 0.125), 0.04, 8 * vs, 3 * vs)
    taps = jnp.asarray(solver.sobolev_filter_1d(7, 0.1))
    psi = fields.identity_field(dims)
    res = solver.estimate_psi(
        psi, tg, wg, tn, wn, taps,
        jnp.float32(0.1), jnp.float32(0.3), jnp.int32(32), jnp.float32(-1.0),
        inverse_iters=8,
    )
    g = np.load(GOLDEN)
    np.testing.assert_allclose(np.asarray(res.psi), g["psi"], atol=1e-5)
    np.testing.assert_allclose(np.asarray(res.tsdf_n_psi), g["tnp"], atol=1e-5)
    np.testing.assert_allclose(np.asarray(res.psi_inv), g["psi_inv"], atol=1e-5)
    np.testing.assert_allclose(float(res.max_norm), g["max_norm"], rtol=1e-4)
