"""Golden regression: the solver's numerics must not drift across refactors.

Golden files are produced by the CPU backend at a fixed configuration
(16^3 spheres, 32 iterations); CPU float32 arithmetic is deterministic, so
any mismatch beyond small tolerance indicates a semantic change — update
the goldens deliberately (tests/golden/make_goldens.py) if the change is
intended. EVERY dispatch path has its own frozen golden, so a simultaneous
drift of all paths (invisible to the cross-path equivalence tests) still
fails here.
"""

import os

import jax.numpy as jnp
import numpy as np

from sobfu_tpu import fields, solver
from sobfu_tpu.tsdf import init_sphere

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _fixture():
    dims = (16, 16, 16)
    vs = 0.25 / 16
    tg, wg = init_sphere(
        dims, (vs,) * 3, (0.125, 0.125, 0.125), 0.04, 8 * vs, 3 * vs
    )
    tn, wn = init_sphere(
        dims, (vs,) * 3, (0.118, 0.125, 0.125), 0.04, 8 * vs, 3 * vs
    )
    taps = jnp.asarray(solver.sobolev_filter_1d(7, 0.1))
    psi = fields.identity_field(dims)
    return (psi, tg, wg, tn, wn, taps, jnp.float32(0.1), jnp.float32(0.3),
            jnp.int32(32), jnp.float32(-1.0))


def _check(res, name, atol=1e-5):
    g = np.load(os.path.join(GOLDEN_DIR, name))
    np.testing.assert_allclose(np.asarray(res.psi), g["psi"], atol=atol)
    np.testing.assert_allclose(np.asarray(res.tsdf_n_psi), g["tnp"], atol=atol)
    np.testing.assert_allclose(
        np.asarray(res.psi_inv), g["psi_inv"], atol=atol
    )
    np.testing.assert_allclose(float(res.max_norm), g["max_norm"], rtol=1e-4)


def test_solver_matches_golden():
    res = solver.estimate_psi(*_fixture(), inverse_iters=8)
    _check(res, "solver_16.npz")


def test_window_solver_matches_golden():
    res = solver.estimate_psi(*_fixture(), inverse_iters=8, warp_window=2)
    _check(res, "solver_16_window.npz")


def test_chunked_solver_matches_golden():
    res = solver.estimate_psi_chunked(
        *_fixture(), n_chunks=4, warp_window=2, inverse_iters=8
    )
    _check(res, "solver_16_chunked.npz")


def test_compositive_solver_matches_golden():
    res = solver.estimate_psi_compositive(
        *_fixture(), warp_window=2, inverse_iters=8
    )
    _check(res, "solver_16_compositive.npz")


def test_pyramid_solver_matches_golden():
    res = solver.estimate_psi_pyramid(
        *_fixture(), levels=2, warp_window=2, inverse_iters=8
    )
    _check(res, "solver_16_pyramid.npz")


def test_fused_interpret_matches_window_golden():
    """The fused Pallas iteration (interpret mode) reproduces the frozen
    WINDOW golden — anchoring the kernel's numerics to the same file as
    the XLA window path (slightly looser: reassociated f32 sums)."""
    args = _fixture()
    taps_static = tuple(float(t) for t in np.asarray(args[5]))
    res = solver.estimate_psi(
        *args, inverse_iters=8, warp_window=2,
        fused_db=True, taps_static=taps_static, db_interpret=True,
    )
    _check(res, "solver_16_window.npz", atol=5e-5)
