"""Hardware validation of the Pallas kernels (runs only on a TPU host).

The CPU suite exercises the same kernel code in interpret mode; this file
re-validates the Mosaic-compiled artifacts against the XLA reference path
on the real chip. Skipped automatically on CPU backends (tests/conftest.py
forces CPU for the main suite, so these run via
``env JAX_PLATFORMS='' python -m pytest tests/test_tpu_hw.py`` on a TPU
host, or in a TPU CI lane).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sobfu_tpu import fields, solver

pytestmark = pytest.mark.skipif(
    jax.devices()[0].platform == "cpu", reason="needs a TPU backend"
)

DIM = 128


def _scene():
    from sobfu_tpu.tsdf import init_sphere

    vs = 1.0 / DIM
    dims = (DIM,) * 3
    tg, wg = init_sphere(dims, (vs,) * 3, (0.5, 0.5, 0.5), 0.2, 8 * vs, 3 * vs)
    tn, wn = init_sphere(dims, (vs,) * 3, (0.49, 0.5, 0.5), 0.2, 8 * vs, 3 * vs)
    return dims, tg, wg, tn, wn


def test_fused_kernel_matches_xla_on_hw():
    """8-iteration fused solve == XLA window solve on the real chip."""
    dims, tg, wg, tn, wn = _scene()
    taps = jnp.asarray(solver.sobolev_filter_1d(7, 0.1))
    taps_static = tuple(float(t) for t in np.asarray(taps))
    common = (
        fields.identity_field(dims), tg, wg, tn, wn, taps,
        jnp.float32(0.05), jnp.float32(0.2), jnp.int32(8), jnp.float32(-1.0),
    )
    fused = solver.estimate_psi(
        *common, warp_window=2, inverse_iters=4,
        fused_db=True, taps_static=taps_static,
    )
    ref = solver.estimate_psi(
        *common, warp_window=2, inverse_iters=4, conv_mxu=True,
    )
    assert float(jnp.max(jnp.abs(fused.psi - ref.psi))) < 1e-4
    assert float(jnp.max(jnp.abs(fused.tsdf_n_psi - ref.tsdf_n_psi))) < 1e-4


def test_warp_kernel_matches_xla_on_hw():
    """Pipelined window-warp kernel bit-equality on the real chip."""
    from sobfu_tpu.ops.pallas_kernels import window_warp_pallas

    dims, tg, _, _, _ = _scene()
    rng = np.random.default_rng(0)
    psi = fields.identity_field(dims) + jnp.asarray(
        rng.uniform(-1.8, 1.8, (3,) + dims), jnp.float32
    )
    out = window_warp_pallas(tg, psi, K=2)
    ref = fields.sample_trilinear_window(tg, psi, 2)
    assert float(jnp.max(jnp.abs(out - ref))) == 0.0
