"""Fused Pallas GD-step kernel vs the reference XLA op chain.

Runs in Pallas interpret mode on CPU — the same kernel code that executes
on TPU hardware, minus the Mosaic lowering.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from sobfu_tpu import fields, solver
from sobfu_tpu.ops.pallas_kernels import fused_gd_step


def _setup(dims, seed=2):
    rng = np.random.default_rng(seed)
    tg = jnp.asarray(rng.standard_normal(dims), jnp.float32)
    live = jnp.asarray(rng.standard_normal(dims), jnp.float32)
    psi = fields.identity_field(dims) + jnp.asarray(
        rng.uniform(-1.5, 1.5, (3,) + dims), jnp.float32
    )
    tnp = jnp.asarray(rng.standard_normal(dims), jnp.float32)
    return tg, live, psi, tnp


def _xla_step(psi, tnp, tg, live, alpha, w_reg, taps, K):
    grad = fields.tsdf_gradient(tnp)
    lap = fields.neg_laplacian(psi)
    dU_S = solver.sobolev_smooth((tnp - tg)[None] * grad + w_reg * lap, taps)
    upd = alpha * dU_S
    psi_new = psi - upd
    tnp_new = fields.sample_trilinear_window(live, psi_new, K)
    return psi_new, tnp_new, float(jnp.max(jnp.sum(upd * upd, axis=0)))


@pytest.mark.parametrize("tile", [(4, 8), (8, 16), (16, 0)])
def test_fused_gd_step_matches_xla(tile):
    BZ, TY = tile
    dims = (16, 16, 32)
    tg, live, psi, tnp = _setup(dims)
    taps = solver.sobolev_filter_1d(7, 0.1)
    alpha, w_reg = jnp.float32(0.05), jnp.float32(0.2)

    psi_k, tnp_k, mx_k = fused_gd_step(
        psi, tnp, tg, live, alpha, w_reg,
        tuple(float(t) for t in taps), K=2, BZ=BZ, TY=TY, interpret=True,
    )
    psi_r, tnp_r, mx_r = _xla_step(
        psi, tnp, tg, live, alpha, w_reg, jnp.asarray(taps), 2
    )
    np.testing.assert_allclose(np.asarray(psi_k), np.asarray(psi_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tnp_k), np.asarray(tnp_r), atol=1e-5)
    np.testing.assert_allclose(float(mx_k), mx_r, rtol=1e-4)


def test_fused_gd_step_small_taps():
    dims = (8, 8, 32)
    tg, live, psi, tnp = _setup(dims, seed=5)
    taps = solver.sobolev_filter_1d(3, 0.1)
    alpha, w_reg = jnp.float32(0.02), jnp.float32(0.4)
    psi_k, tnp_k, _ = fused_gd_step(
        psi, tnp, tg, live, alpha, w_reg,
        tuple(float(t) for t in taps), K=1, BZ=4, TY=8, interpret=True,
    )
    psi_r, tnp_r, _ = _xla_step(
        psi, tnp, tg, live, alpha, w_reg, jnp.asarray(taps), 1
    )
    np.testing.assert_allclose(np.asarray(psi_k), np.asarray(psi_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tnp_k), np.asarray(tnp_r), atol=1e-5)
