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


# ---------------------------------------------------------------------------
# double-buffered fused iteration (the production TPU hot loop)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("momentum", [None, 0.9])
def test_fused_db_iteration_matches_xla(momentum):
    """fused_gd_iteration_db == XLA window step, incl. heavy-ball momentum."""
    from sobfu_tpu.ops.pallas_kernels import fused_gd_iteration_db, pad_for_db

    dims = (16, 16, 32)
    tg, live, psi, tnp = _setup(dims, seed=3)
    taps = solver.sobolev_filter_1d(7, 0.1)
    alpha, w_reg = jnp.float32(0.05), jnp.float32(0.2)
    rng = np.random.default_rng(7)
    vel = (
        jnp.asarray(rng.standard_normal((3,) + dims), jnp.float32)
        if momentum is not None
        else None
    )

    psi_k, tnp_k, vel_k, mx_k = fused_gd_iteration_db(
        psi, tnp, vel, pad_for_db(tg), pad_for_db(live), alpha, w_reg,
        tuple(float(t) for t in taps), K=2, BZ=8, TY=16,
        momentum=momentum, interpret=True,
    )

    grad = fields.tsdf_gradient(tnp)
    lap = fields.neg_laplacian(psi)
    dU_S = solver.sobolev_smooth(
        (tnp - tg)[None] * grad + w_reg * lap, jnp.asarray(taps)
    )
    if momentum is not None:
        vel_r = momentum * vel + dU_S
        upd = alpha * vel_r
        np.testing.assert_allclose(
            np.asarray(vel_k), np.asarray(vel_r), atol=1e-5
        )
    else:
        upd = alpha * dU_S
        assert vel_k is None
    psi_r = psi - upd
    tnp_r = fields.sample_trilinear_window(live, psi_r, 2)
    np.testing.assert_allclose(np.asarray(psi_k), np.asarray(psi_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tnp_k), np.asarray(tnp_r), atol=1e-5)
    np.testing.assert_allclose(
        float(mx_k), float(jnp.max(jnp.sum(upd * upd, axis=0))), rtol=1e-4
    )


@pytest.mark.parametrize("momentum", [None, 0.9])
def test_estimate_psi_fused_db_full_solve(momentum):
    """The fused_db solve agrees with the XLA window solve over a full
    multi-iteration run (while_loop path, convergence norm included)."""
    from sobfu_tpu.tsdf import init_sphere

    dim = 16
    vs = 1.0 / dim
    dims = (dim,) * 3
    tg, wg = init_sphere(dims, (vs,) * 3, (0.5, 0.5, 0.5), 0.2, 8 * vs, 3 * vs)
    tn, wn = init_sphere(dims, (vs,) * 3, (0.47, 0.5, 0.5), 0.21, 8 * vs, 3 * vs)
    taps = jnp.asarray(solver.sobolev_filter_1d(7, 0.1))
    taps_static = tuple(float(t) for t in np.asarray(taps))
    common = (
        fields.identity_field(dims), tg, wg, tn, wn, taps,
        jnp.float32(0.05), jnp.float32(0.2), jnp.int32(12), jnp.float32(-1.0),
    )
    ref = solver.estimate_psi(*common, warp_window=2, momentum=momentum)
    fus = solver.estimate_psi(
        *common, warp_window=2, momentum=momentum,
        fused_db=True, taps_static=taps_static, db_interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(fus.psi), np.asarray(ref.psi), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(fus.tsdf_n_psi), np.asarray(ref.tsdf_n_psi), atol=2e-5
    )
    assert abs(float(fus.max_norm) - float(ref.max_norm)) < 1e-6
    assert int(fus.iters) == int(ref.iters) == 12


def test_solver_fused_dispatch_flags():
    """Auto fused dispatch: off on CPU; explicit knob respected; explicit
    Z_CHUNKS beats auto-fused (explicit beats auto)."""
    from sobfu_tpu.config import Params
    from sobfu_tpu.solver import Solver

    p = Params()
    p.warp_window = 2
    s = Solver(p)
    assert s.fused_pallas is False  # CPU platform: auto stays off

    p2 = Params()
    p2.warp_window = 2
    p2.fused_pallas = True
    s2 = Solver(p2)
    assert s2.fused_pallas is True
    assert s2.z_chunks == 0  # fused supersedes auto-chunking

    p3 = Params()
    p3.warp_window = 2
    p3.z_chunks = 4
    s3 = Solver(p3)
    assert s3.fused_pallas is False and s3.z_chunks == 4

    p4 = Params()
    p4.fused_pallas = True  # no warp_window: production default applied
    s4 = Solver(p4)
    assert s4.warp_window == 2


@pytest.mark.parametrize("dims,TY", [((16, 16, 32), 0), ((16, 32, 32), 8)])
def test_window_warp_pallas_matches_xla(dims, TY):
    """Pipelined (z, y, channel)-tiled warp kernel == the XLA window
    samplers, for scalar and C=3 field inputs, trilinear and floor."""
    from sobfu_tpu.ops.pallas_kernels import window_warp_pallas

    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.standard_normal(dims), jnp.float32)
    fld = jnp.asarray(rng.standard_normal((3,) + dims), jnp.float32)
    psi = fields.identity_field(dims) + jnp.asarray(
        rng.uniform(-1.8, 1.8, (3,) + dims), jnp.float32
    )
    for floor in (False, True):
        out = window_warp_pallas(vol, psi, K=2, TY=TY, floor=floor,
                                 interpret=True)
        ref = (
            fields.sample_nearest_floor_window
            if floor
            else fields.sample_trilinear_window
        )(vol, psi, 2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    out3 = window_warp_pallas(fld, psi, K=2, TY=TY, interpret=True)
    ref3 = fields.sample_trilinear_window(fld, psi, 2)
    np.testing.assert_allclose(np.asarray(out3), np.asarray(ref3), atol=1e-5)


def test_inverse_window_pallas_matches_xla():
    """Pallas fixed-point inverse (prestacked disp + fused ident-sub
    epilogue) == fields.estimate_inverse_window, cold and warm-started."""
    from sobfu_tpu.ops.pallas_kernels import estimate_inverse_window_pallas

    dims = (16, 16, 32)
    rng = np.random.default_rng(3)
    psi = fields.identity_field(dims) + jnp.asarray(
        rng.uniform(-1.2, 1.2, (3,) + dims), jnp.float32
    )
    out = estimate_inverse_window_pallas(psi, iters=6, K=2, interpret=True)
    ref = fields.estimate_inverse_window(psi, iters=6, max_disp=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    warm = fields.identity_field(dims) + jnp.asarray(
        rng.uniform(-0.3, 0.3, (3,) + dims), jnp.float32
    )
    out_w = estimate_inverse_window_pallas(
        psi, iters=4, K=2, init=warm, interpret=True
    )
    ref_w = fields.estimate_inverse_window(psi, iters=4, max_disp=2, init=warm)
    np.testing.assert_allclose(np.asarray(out_w), np.asarray(ref_w), atol=1e-5)


def test_inverse_multi_kernel_matches_xla():
    """Multi-STEP C=3 inverse kernel (all fixed-point steps per-tile in
    one launch, weights shared across channels) ==
    fields.estimate_inverse_window, cold and warm-started, K=1 and K=2."""
    from sobfu_tpu.ops.pallas_kernels import (
        estimate_inverse_window_pallas_multi,
    )

    dims = (16, 16, 64)
    rng = np.random.default_rng(5)
    psi = fields.identity_field(dims) + jnp.asarray(
        rng.uniform(-1.4, 1.4, (3,) + dims), jnp.float32
    )
    for K in (1, 2):
        out = estimate_inverse_window_pallas_multi(
            psi, iters=3, K=K, interpret=True
        )
        ref = fields.estimate_inverse_window(psi, iters=3, max_disp=K)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

    warm = fields.identity_field(dims) + jnp.asarray(
        rng.uniform(-0.3, 0.3, (3,) + dims), jnp.float32
    )
    out_w = estimate_inverse_window_pallas_multi(
        psi, iters=4, K=2, init=warm, interpret=True
    )
    ref_w = fields.estimate_inverse_window(psi, iters=4, max_disp=2,
                                           init=warm)
    np.testing.assert_allclose(np.asarray(out_w), np.asarray(ref_w),
                               atol=1e-5)


def test_inverse_multigrid_matches_cold():
    """Coarse-to-fine warm inverse (half-res fixed point + fine anchor
    steps) lands within interpolation error of the cold 48-step exact
    inverse on a smooth field."""
    from sobfu_tpu import solver

    dims = (16, 16, 64)
    ident = fields.identity_field(dims)
    # smooth, Sobolev-like displacement (the production regime)
    zz, yy, xx = [ident[i] for i in (2, 1, 0)]
    disp = jnp.stack(
        [
            0.9 * jnp.sin(2 * jnp.pi * yy / dims[1]),
            0.7 * jnp.cos(2 * jnp.pi * xx / dims[2]),
            0.5 * jnp.sin(2 * jnp.pi * zz / dims[0]),
        ]
    )
    psi = ident + disp
    q_cold = fields.estimate_inverse_window(psi, iters=48, max_disp=2)
    q_mg = solver.estimate_inverse_multigrid(
        psi, iters=6, K=2, init=None, fine_iters=2, interpret=True
    )
    err = float(jnp.max(jnp.abs(q_mg - q_cold)))
    assert err < 2e-2, err
    # warm-started (production): tighter
    q_mg_w = solver.estimate_inverse_multigrid(
        psi, iters=3, K=2, init=q_cold, fine_iters=1, interpret=True
    )
    err_w = float(jnp.max(jnp.abs(q_mg_w - q_cold)))
    # this test field varies over ~16 voxels (far rougher relative to the
    # grid than a production Sobolev field — at 256^3 the measured error
    # is 1.5e-3, tools/check_inverse_multigrid.py); the bound here only
    # guards against gross breakage
    assert err_w < 2e-2, err_w
    # the FUNCTIONAL criterion — what fusion consumes is psi(q(v)) ~ v.
    # The multigrid inverse's composition residual must match the cold
    # 48-step fixed point's own residual (the interpolation-error floor)
    # to within a small additive margin, cold AND warm started.
    def resid(q):
        comp = fields.sample_field_trilinear(psi, q)
        return float(jnp.max(jnp.abs(comp - ident)))

    r_cold = resid(q_cold)
    assert resid(q_mg) <= r_cold + 2e-3, (resid(q_mg), r_cold)
    assert resid(q_mg_w) <= r_cold + 2e-3, (resid(q_mg_w), r_cold)

    # production-like SMOOTH field (wavelength = full grid extent, the
    # regime the Sobolev filter produces): tight bound, warm-started
    disp_s = jnp.stack(
        [
            1.1 * jnp.sin(2 * jnp.pi * yy / dims[1]) ** 2
            * jnp.sin(jnp.pi * xx / dims[2]),
            0.8 * jnp.sin(jnp.pi * xx / dims[2]) ** 2,
            0.6 * jnp.sin(jnp.pi * zz / dims[0])
            * jnp.sin(jnp.pi * yy / dims[1]),
        ]
    )
    psi_s = ident + disp_s
    q_cold_s = fields.estimate_inverse_window(psi_s, iters=48, max_disp=2)
    # warm start from a PERTURBED inverse (previous-frame-style, not the
    # fixed point itself)
    warm_s = q_cold_s + 0.05 * jnp.sin(2 * jnp.pi * xx / dims[2])[None]
    q_mg_s = solver.estimate_inverse_multigrid(
        psi_s, iters=3, K=2, init=warm_s, fine_iters=1, interpret=True
    )
    err_s = float(jnp.max(jnp.abs(q_mg_s - q_cold_s)))
    # measured 8.6e-3 on this 16-voxel-extent grid (the half-res coarse
    # level is only 8 voxels across — interpolation error shrinks with
    # resolution: 256^3 production measures 1.5e-3). 1.5x headroom so a
    # 2x regression FAILS here (round-4 VERDICT item 9); the production-
    # scale bound lives in test_inverse_multigrid_production_scale.
    assert err_s < 1.3e-2, err_s


def test_inverse_multigrid_production_scale():
    """Production-scale accuracy gate (round-4 VERDICT item 9): a 64^3
    grid with a full-extent smooth field — the regime the Sobolev filter
    actually produces — warm-started multigrid inverse vs the cold
    48-step fixed point. Measured 3.38e-3 vox; the 6e-3 bound is 1.8x
    headroom, so a coarse-level regression of 2x production error fails
    CI (vs the old 2e-2 blanket gate = 13x the production error)."""
    from sobfu_tpu import solver

    dims = (64, 64, 64)
    ident = fields.identity_field(dims)
    zz, yy, xx = [ident[i] for i in (2, 1, 0)]
    disp = jnp.stack(
        [
            1.4 * jnp.sin(2 * jnp.pi * yy / dims[1]) ** 2
            * jnp.sin(jnp.pi * xx / dims[2]),
            1.0 * jnp.sin(jnp.pi * xx / dims[2]) ** 2,
            0.8 * jnp.sin(jnp.pi * zz / dims[0])
            * jnp.sin(jnp.pi * yy / dims[1]),
        ]
    )
    psi = ident + disp
    q_cold = fields.estimate_inverse_window(psi, iters=48, max_disp=2)
    # previous-frame-style warm start: the fixed point perturbed, not
    # the fixed point itself
    warm = q_cold + 0.05 * jnp.sin(2 * jnp.pi * xx / dims[2])[None]
    q_mg = solver.estimate_inverse_multigrid(
        psi, iters=3, K=2, init=warm, fine_iters=1, interpret=True
    )
    err = float(jnp.max(jnp.abs(q_mg - q_cold)))
    assert err < 6e-3, err


def test_inverse_multigrid_coarse_carry():
    """Half-res inverse carry (solver inv_coarse): return_coarse hands out
    the coarse fixed point q_c; upsampling it reproduces the anchorless
    full-res output exactly, and feeding q_c back as a HALF-RES init is
    accepted and lands on the same fixed point as the full-res-carry
    path."""
    from sobfu_tpu import solver

    dims = (16, 16, 64)
    dims_c = tuple(d // 2 for d in dims)
    ident = fields.identity_field(dims)
    ident_c = fields.identity_field(dims_c)
    zz, yy, xx = [ident[i] for i in (2, 1, 0)]
    disp = jnp.stack(
        [
            0.9 * jnp.sin(2 * jnp.pi * yy / dims[1]),
            0.7 * jnp.cos(2 * jnp.pi * xx / dims[2]),
            0.5 * jnp.sin(2 * jnp.pi * zz / dims[0]),
        ]
    )
    psi = ident + disp

    q_c = solver.estimate_inverse_multigrid(
        psi, iters=3, K=2, init=None, fine_iters=0, return_coarse=True,
        interpret=True,
    )
    assert q_c.shape == (3,) + dims_c
    full = solver.estimate_inverse_multigrid(
        psi, iters=3, K=2, init=None, fine_iters=0, interpret=True
    )
    up = ident + solver._resample_disp(q_c - ident_c, dims, 2.0)
    np.testing.assert_allclose(np.asarray(up), np.asarray(full), atol=1e-6)

    # next frame: a nearby field; carry the COARSE q_c directly vs the
    # full-res-carry path (down-resamples `full`). Both warm starts must
    # land on the same fixed point; the carried start skips one
    # interpolation generation, so agreement is bounded by resample error.
    psi2 = ident + 0.9 * disp
    q2_carry = solver.estimate_inverse_multigrid(
        psi2, iters=3, K=2, init=q_c, fine_iters=0, return_coarse=True,
        interpret=True,
    )
    q2_full = solver.estimate_inverse_multigrid(
        psi2, iters=3, K=2, init=full, fine_iters=0, return_coarse=True,
        interpret=True,
    )
    d = float(jnp.max(jnp.abs(q2_carry - q2_full)))
    assert d < 5e-3, d

    # functional criterion at full res: materialised carry inverse
    # composes to ~identity as well as the full-res-carry one
    def resid(q_coarse):
        q0 = ident + solver._resample_disp(q_coarse - ident_c, dims, 2.0)
        q = fields.estimate_inverse_window(
            psi2, iters=1, max_disp=2, init=q0
        )
        comp = fields.sample_field_trilinear(psi2, q)
        return float(jnp.max(jnp.abs(comp - ident)))

    assert resid(q2_carry) <= resid(q2_full) + 1e-3, (
        resid(q2_carry), resid(q2_full),
    )


def test_field3_warp_pallas_matches_xla():
    """C=3 shared-weight field sampler (one launch, the compositive
    composition kernel) == fields.sample_trilinear_window on a 3-channel
    field, K=1 and K=2, including edge clamping."""
    from sobfu_tpu.ops.pallas_kernels import window_warp_field3_pallas

    dims = (16, 16, 64)
    rng = np.random.default_rng(7)
    ident = fields.identity_field(dims)
    field = ident + jnp.asarray(
        rng.uniform(-2.0, 2.0, (3,) + dims), jnp.float32
    )
    for K in (1, 2):
        pos = ident + jnp.asarray(
            rng.uniform(-(K - 0.05), K - 0.05, (3,) + dims), jnp.float32
        )
        out = window_warp_field3_pallas(field, pos, K=K, interpret=True)
        ref = fields.sample_trilinear_window(field, pos, max_disp=K)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4)
    # out-of-window positions clamp identically
    pos_big = ident + jnp.asarray(
        rng.uniform(-3.0, 3.0, (3,) + dims), jnp.float32
    )
    out = window_warp_field3_pallas(field, pos_big, K=1, interpret=True)
    ref = fields.sample_trilinear_window(field, pos_big, max_disp=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_compose_weight_pallas_matches_xla():
    """Fused compositive tail (psi_new = psi0 o (id + delta) AND the
    weight_n floor warp at psi_new, ONE launch) == the two XLA window
    samplers it replaces, identity added in-kernel."""
    from sobfu_tpu.ops.pallas_kernels import compose_weight_pallas

    dims = (16, 16, 64)
    rng = np.random.default_rng(11)
    ident = fields.identity_field(dims)
    Kf, Kw = 1, 2
    # |psi0 - id| <= Kw - Kf so |psi_new - v| stays within the Kw bound
    field = ident + jnp.asarray(
        rng.uniform(-0.95, 0.95, (3,) + dims), jnp.float32
    )
    delta = jnp.asarray(
        rng.uniform(-(Kf - 0.05), Kf - 0.05, (3,) + dims), jnp.float32
    )
    weight = jnp.asarray(
        (rng.uniform(0, 1, dims) > 0.4).astype(np.float32)
    )

    psi_new, wnp = compose_weight_pallas(
        field, ident + delta, weight, Kf=Kf, Kw=Kw, interpret=True
    )
    ref_psi = fields.sample_trilinear_window(field, ident + delta, max_disp=Kf)
    ref_w = fields.sample_nearest_floor_window(weight, ref_psi, max_disp=Kw)
    np.testing.assert_allclose(np.asarray(psi_new), np.asarray(ref_psi),
                               atol=1e-4)
    np.testing.assert_array_equal(np.asarray(wnp), np.asarray(ref_w))


@pytest.mark.parametrize("momentum", [None, 0.9])
def test_fused_stacked_iteration_matches_xla(momentum):
    """BlockSpec-stacked small-grid fused iteration == the XLA window step
    (the lane-width<128 fallback built on Mosaic-safe patterns)."""
    from sobfu_tpu.ops.pallas_kernels import (
        _stack_db,
        fused_gd_iteration_stacked,
    )

    dims = (16, 16, 32)
    tg, live, psi, tnp = _setup(dims, seed=11)
    tnp = fields.sample_trilinear_window(live, psi, 2)
    taps = solver.sobolev_filter_1d(7, 0.1)
    alpha, w_reg = jnp.float32(0.05), jnp.float32(0.2)
    rng = np.random.default_rng(12)
    vel = (
        jnp.asarray(rng.standard_normal((3,) + dims), jnp.float32)
        if momentum is not None
        else None
    )
    p_k, t_k, v_k, mx_k = fused_gd_iteration_stacked(
        psi, tnp, vel, _stack_db(tg, TY=16), _stack_db(live, TY=16),
        alpha, w_reg, tuple(float(t) for t in taps),
        K=2, TY=16, momentum=momentum, interpret=True,
    )
    grad = fields.tsdf_gradient(tnp)
    lap = fields.neg_laplacian(psi)
    dU_S = solver.sobolev_smooth(
        (tnp - tg)[None] * grad + w_reg * lap, jnp.asarray(taps)
    )
    if momentum is not None:
        v_r = momentum * vel + dU_S
        upd = alpha * v_r
        np.testing.assert_allclose(np.asarray(v_k), np.asarray(v_r), atol=1e-5)
    else:
        upd = alpha * dU_S
    p_r = psi - upd
    t_r = fields.sample_trilinear_window(live, p_r, 2)
    np.testing.assert_allclose(np.asarray(p_k), np.asarray(p_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(t_k), np.asarray(t_r), atol=1e-5)
    np.testing.assert_allclose(
        float(mx_k), float(jnp.max(jnp.sum(upd * upd, axis=0))), rtol=1e-4
    )


@pytest.mark.parametrize("momentum", [None, 0.9])
def test_fused_db_lane_packed_matches_xla(momentum):
    """Lane packing (x edge-padded to a Mosaic-compilable extent, logical-X
    clamping inside the kernel) reproduces the unpadded XLA window step
    exactly on the real lanes — the path that serves sub-128 grids such as
    the reference's 64^3 headline workload."""
    from sobfu_tpu.ops.pallas_kernels import fused_gd_iteration_db, pad_for_db

    dims = (16, 16, 32)
    XP = 64  # pack 32 lanes -> 64
    tg, live, psi, tnp = _setup(dims, seed=21)
    taps = solver.sobolev_filter_1d(7, 0.1)
    alpha, w_reg = jnp.float32(0.05), jnp.float32(0.2)
    rng = np.random.default_rng(22)
    vel = (
        jnp.asarray(rng.standard_normal((3,) + dims), jnp.float32)
        if momentum is not None
        else None
    )
    psi_k, tnp_k, vel_k, mx_k = fused_gd_iteration_db(
        psi, tnp, vel, pad_for_db(tg, XP), pad_for_db(live, XP),
        alpha, w_reg, tuple(float(t) for t in taps),
        K=2, BZ=8, TY=16, momentum=momentum, interpret=True, x_pad_to=XP,
    )
    grad = fields.tsdf_gradient(tnp)
    lap = fields.neg_laplacian(psi)
    dU_S = solver.sobolev_smooth(
        (tnp - tg)[None] * grad + w_reg * lap, jnp.asarray(taps)
    )
    if momentum is not None:
        vel_r = momentum * vel + dU_S
        upd = alpha * vel_r
        np.testing.assert_allclose(
            np.asarray(vel_k), np.asarray(vel_r), atol=1e-5
        )
    else:
        upd = alpha * dU_S
    psi_r = psi - upd
    tnp_r = fields.sample_trilinear_window(live, psi_r, 2)
    np.testing.assert_allclose(np.asarray(psi_k), np.asarray(psi_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tnp_k), np.asarray(tnp_r), atol=1e-5)
    # dead-lane updates are masked out of the convergence max
    np.testing.assert_allclose(
        float(mx_k), float(jnp.max(jnp.sum(upd * upd, axis=0))), rtol=1e-4
    )


def test_estimate_psi_lane_packed_full_solve():
    """estimate_psi(x_pad_to=...) == the unpadded XLA window solve across a
    full while_loop run, convergence norm and tails included."""
    from sobfu_tpu.tsdf import init_sphere

    dim = 16
    vs = 1.0 / dim
    dims = (dim,) * 3
    tg, wg = init_sphere(dims, (vs,) * 3, (0.5, 0.5, 0.5), 0.2, 8 * vs, 3 * vs)
    tn, wn = init_sphere(dims, (vs,) * 3, (0.47, 0.5, 0.5), 0.21, 8 * vs, 3 * vs)
    taps = jnp.asarray(solver.sobolev_filter_1d(7, 0.1))
    taps_static = tuple(float(t) for t in np.asarray(taps))
    common = (
        fields.identity_field(dims), tg, wg, tn, wn, taps,
        jnp.float32(0.05), jnp.float32(0.2), jnp.int32(10), jnp.float32(-1.0),
    )
    ref = solver.estimate_psi(*common, warp_window=2, momentum=0.9)
    packed = solver.estimate_psi(
        *common, warp_window=2, momentum=0.9,
        fused_db=True, taps_static=taps_static, db_interpret=True,
        x_pad_to=128,
    )
    np.testing.assert_allclose(
        np.asarray(packed.psi), np.asarray(ref.psi), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(packed.tsdf_n_psi), np.asarray(ref.tsdf_n_psi), atol=2e-5
    )
    assert abs(float(packed.max_norm) - float(ref.max_norm)) < 1e-6


@pytest.mark.parametrize("momentum", [None, 0.9])
def test_compositive_fused_matches_xla(momentum):
    """Compositive mode on the fused kernel (live = T0, psi = id + delta)
    == the XLA compositive loop, momentum included — the production speed
    path for unbounded accumulated deformation (round-2 verdict item 8)."""
    from sobfu_tpu.tsdf import init_sphere

    dim = 16
    vs = 1.0 / dim
    dims = (dim,) * 3
    tg, wg = init_sphere(dims, (vs,) * 3, (0.5, 0.5, 0.5), 0.2, 8 * vs, 3 * vs)
    tn, wn = init_sphere(dims, (vs,) * 3, (0.46, 0.5, 0.5), 0.21, 8 * vs, 3 * vs)
    taps = jnp.asarray(solver.sobolev_filter_1d(7, 0.1))
    taps_static = tuple(float(t) for t in np.asarray(taps))
    # nontrivial accumulated psi0 (compositive solves the increment on top)
    psi0 = fields.identity_field(dims) + 0.3 * jnp.sin(
        jnp.linspace(0, 3.0, int(np.prod((3,) + dims))).reshape((3,) + dims)
    )
    common = (psi0, tg, wg, tn, wn, taps,
              jnp.float32(0.05), jnp.float32(0.2),
              jnp.int32(10), jnp.float32(-1.0))
    ref = solver.estimate_psi_compositive(
        *common, warp_window=2, inverse_iters=4, momentum=momentum,
    )
    fus = solver.estimate_psi_compositive(
        *common, warp_window=2, inverse_iters=4, momentum=momentum,
        fused_db=True, taps_static=taps_static, db_interpret=True,
    )
    np.testing.assert_allclose(np.asarray(fus.psi), np.asarray(ref.psi), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(fus.tsdf_n_psi), np.asarray(ref.tsdf_n_psi), atol=2e-5
    )
    assert abs(float(fus.max_norm) - float(ref.max_norm)) < 1e-6
    assert int(fus.iters) == int(ref.iters) == 10


@pytest.mark.parametrize("momentum", [None, 0.9])
def test_compositive_fold_matches_xla(momentum):
    """Compositive mode at X=64 dispatches the Y-FOLDED kernel (round-3
    STATUS gap 5 — it lane-packed with half the VPU dead before); full
    solve == the XLA compositive loop, momentum + stall stop included."""
    from sobfu_tpu.tsdf import init_sphere

    dims = (16, 64, 64)
    vs = 1.0 / 64
    tg, wg = init_sphere(dims, (vs,) * 3, (0.125, 0.5, 0.5), 0.1,
                         8 * vs, 3 * vs)
    tn, wn = init_sphere(dims, (vs,) * 3, (0.125, 0.48, 0.5), 0.11,
                         8 * vs, 3 * vs)
    taps = jnp.asarray(solver.sobolev_filter_1d(7, 0.1))
    taps_static = tuple(float(t) for t in np.asarray(taps))
    rng = np.random.default_rng(7)
    psi0 = fields.identity_field(dims) + 0.2 * jnp.asarray(
        rng.standard_normal((3,) + dims), jnp.float32
    )
    common = (psi0, tg, wg, tn, wn, taps,
              jnp.float32(0.05), jnp.float32(0.2),
              jnp.int32(8), jnp.float32(-1.0))
    ref = solver.estimate_psi_compositive(
        *common, warp_window=1, inverse_iters=4, momentum=momentum,
        stall_window=4, stall_rel=1e-3,
    )
    fus = solver.estimate_psi_compositive(
        *common, warp_window=1, inverse_iters=4, momentum=momentum,
        stall_window=4, stall_rel=1e-3,
        fused_db=True, taps_static=taps_static, db_interpret=True,
    )
    assert int(fus.iters) == int(ref.iters) == 8
    np.testing.assert_allclose(
        np.asarray(fus.psi), np.asarray(ref.psi), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(fus.tsdf_n_psi), np.asarray(ref.tsdf_n_psi), atol=2e-5
    )
    assert abs(float(fus.max_norm) - float(ref.max_norm)) < 1e-6


@pytest.mark.parametrize("momentum", [None, 0.9])
def test_estimate_psi_pingpong_full_solve(momentum):
    """estimate_psi's ping-pong fused dispatch (multi-tile grids: the
    kernel writes the padded loop state itself, no refresh copies) == the
    XLA window solve over a full while_loop run."""
    from sobfu_tpu.tsdf import init_sphere

    dims = (32, 64, 32)  # nz=4, ny=2 with auto tiles -> ping-pong path
    vs = 1.0 / 32
    tg, wg = init_sphere(dims, (vs,) * 3, (0.5, 1.0, 0.5), 0.3, 8 * vs, 3 * vs)
    tn, wn = init_sphere(dims, (vs,) * 3, (0.45, 1.0, 0.5), 0.31, 8 * vs, 3 * vs)
    taps = jnp.asarray(solver.sobolev_filter_1d(7, 0.1))
    taps_static = tuple(float(t) for t in np.asarray(taps))
    common = (
        fields.identity_field(dims), tg, wg, tn, wn, taps,
        jnp.float32(0.05), jnp.float32(0.2), jnp.int32(10), jnp.float32(-1.0),
    )
    ref = solver.estimate_psi(*common, warp_window=2, momentum=momentum)
    pp = solver.estimate_psi(
        *common, warp_window=2, momentum=momentum,
        fused_db=True, taps_static=taps_static, db_interpret=True,
    )
    np.testing.assert_allclose(np.asarray(pp.psi), np.asarray(ref.psi), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(pp.tsdf_n_psi), np.asarray(ref.tsdf_n_psi), atol=2e-5
    )
    assert abs(float(pp.max_norm) - float(ref.max_norm)) < 1e-5
    assert int(pp.iters) == int(ref.iters) == 10


def test_pp_with_energy_matches_data_energy():
    """fused_gd_iteration_pp(with_energy=True): the in-kernel per-tile
    data-energy partials must sum to data_energy(tg, tnp') computed on
    the unpadded outputs — the stall detector consumes this instead of
    reducing the padded loop buffers outside the kernel."""
    from sobfu_tpu.ops.pallas_kernels import (
        fused_gd_iteration_pp,
        pad_for_pp,
        unpad_pp,
    )
    from sobfu_tpu.solver import data_energy

    dims = (32, 64, 32)  # nz, ny >= 2 with auto tiles
    tg, live, psi, tnp = _setup(dims, seed=11)
    taps = tuple(float(t) for t in solver.sobolev_filter_1d(7, 0.1))
    alpha, w_reg = jnp.float32(0.05), jnp.float32(0.2)

    psi_p, tnp_p, _, mx, e_data = fused_gd_iteration_pp(
        pad_for_pp(psi), pad_for_pp(tnp), None,
        pad_for_pp(tg), pad_for_pp(live), alpha, w_reg, taps,
        K=2, BZ=8, TY=16, interpret=True, with_energy=True,
    )
    e_ref = float(data_energy(tg, unpad_pp(tnp_p)))
    assert abs(float(e_data) - e_ref) < 1e-3 * max(1.0, abs(e_ref))

    # with_energy off: same outputs, e slot is None
    psi_0, tnp_0, _, mx_0, e_none = fused_gd_iteration_pp(
        pad_for_pp(psi), pad_for_pp(tnp), None,
        pad_for_pp(tg), pad_for_pp(live), alpha, w_reg, taps,
        K=2, BZ=8, TY=16, interpret=True,
    )
    assert e_none is None
    np.testing.assert_allclose(np.asarray(psi_0), np.asarray(psi_p), atol=0)
    np.testing.assert_allclose(np.asarray(tnp_0), np.asarray(tnp_p), atol=0)


def test_stall_detector_fused_pp_matches_xla():
    """The stall detector on the fused ping-pong path (in-kernel energy
    partials) must stop at the same iteration as the XLA window path and
    produce the same field."""
    from sobfu_tpu.tsdf import init_sphere

    dims = (32, 64, 32)
    vs = 1.0 / 32
    tg, wg = init_sphere(dims, (vs,) * 3, (0.5, 1.0, 0.5), 0.3, 8 * vs, 3 * vs)
    tn, wn = init_sphere(dims, (vs,) * 3, (0.45, 1.0, 0.5), 0.31, 8 * vs, 3 * vs)
    taps = jnp.asarray(solver.sobolev_filter_1d(7, 0.1))
    taps_static = tuple(float(t) for t in np.asarray(taps))
    common = (
        fields.identity_field(dims), tg, wg, tn, wn, taps,
        jnp.float32(0.05), jnp.float32(0.2), jnp.int32(256),
        jnp.float32(1e-9),  # unreachable: only the stall stop can fire
    )
    ref = solver.estimate_psi(
        *common, warp_window=2, momentum=0.9, stall_window=8, stall_rel=1e-2
    )
    pp = solver.estimate_psi(
        *common, warp_window=2, momentum=0.9, stall_window=8, stall_rel=1e-2,
        fused_db=True, taps_static=taps_static, db_interpret=True,
    )
    assert int(ref.iters) < 256  # the stall stop actually fired
    assert int(pp.iters) == int(ref.iters)
    np.testing.assert_allclose(np.asarray(pp.psi), np.asarray(ref.psi), atol=2e-5)


def test_window_warp_pallas_mixed_matches_single_mode():
    """Mixed-mode warp (channel 0 trilinear + channel 1 floor in one
    pipeline pass) == the two single-mode kernels."""
    from sobfu_tpu.ops.pallas_kernels import (
        window_warp_pallas,
        window_warp_pallas_mixed,
    )

    dims = (16, 16, 32)
    rng = np.random.default_rng(9)
    tsdf = jnp.asarray(rng.standard_normal(dims), jnp.float32)
    weight = jnp.asarray(rng.integers(0, 64, dims), jnp.float32)
    psi = fields.identity_field(dims) + jnp.asarray(
        rng.uniform(-1.8, 1.8, (3,) + dims), jnp.float32
    )
    tri, flo = window_warp_pallas_mixed(tsdf, weight, psi, K=2, interpret=True)
    tri_r = window_warp_pallas(tsdf, psi, K=2, interpret=True)
    flo_r = window_warp_pallas(weight, psi, K=2, floor=True, interpret=True)
    np.testing.assert_allclose(np.asarray(tri), np.asarray(tri_r), atol=0)
    np.testing.assert_allclose(np.asarray(flo), np.asarray(flo_r), atol=0)


def test_window_warp_fuse_pallas_matches_composition():
    """Single-pipeline weight-warp + fuse kernel == the two-stage
    composition (sample_nearest_floor_window -> fuse_volumes), bit-exact,
    including every skip rule (wnp==0, wnp==1 & tnp in {0,-1}) and the
    max_weight clamp."""
    from sobfu_tpu.ops.pallas_kernels import window_warp_fuse_pallas
    from sobfu_tpu.tsdf import fuse_volumes

    dims = (16, 16, 32)
    rng = np.random.default_rng(11)
    tg = jnp.asarray(rng.standard_normal(dims), jnp.float32)
    wg = jnp.asarray(rng.integers(0, 64, dims), jnp.float32)
    # live tsdf with exact 0.0 / -1.0 values to exercise the skip rules
    tnp = jnp.asarray(
        rng.choice([0.0, -1.0, 0.3, 0.8], size=dims), jnp.float32
    )
    # live weight with zeros and ones (both skip-rule operands)
    wn = jnp.asarray(rng.choice([0.0, 1.0, 2.0], size=dims), jnp.float32)
    psi = fields.identity_field(dims) + jnp.asarray(
        rng.uniform(-1.8, 1.8, (3,) + dims), jnp.float32
    )
    maxw = jnp.float32(64.0)

    tg2, wg2 = window_warp_fuse_pallas(
        tg, wg, tnp, wn, psi, maxw, K=2, interpret=True
    )
    wnp = fields.sample_nearest_floor_window(wn, psi, max_disp=2)
    tg_r, wg_r = fuse_volumes(tg, wg, tnp, wnp, maxw)
    np.testing.assert_allclose(np.asarray(tg2), np.asarray(tg_r), atol=0)
    np.testing.assert_allclose(np.asarray(wg2), np.asarray(wg_r), atol=0)
    # the clamp actually bound: some wg was already at max
    assert float(jnp.max(wg2)) == 64.0


def test_fold_iteration_matches_xla():
    """Y-folded fused iteration (X=64 packed as y-pairs into 128 lanes —
    no dead lanes) == the XLA window step, incl. momentum, max-norm and
    the in-kernel data energy."""
    from sobfu_tpu.ops.pallas_kernels import (
        fold_y,
        fused_gd_iteration_fold,
        pad_for_fold,
        unfold_y,
    )
    from sobfu_tpu.solver import data_energy

    dims = (16, 64, 64)
    tg, live, psi, tnp = _setup(dims, seed=13)
    taps = solver.sobolev_filter_1d(7, 0.1)
    alpha, w_reg = jnp.float32(0.05), jnp.float32(0.2)
    rng = np.random.default_rng(17)
    vel = jnp.asarray(rng.standard_normal((3,) + dims), jnp.float32)

    for mu in (None, 0.9):
        p_k, t_k, v_k, mx_k, e_k = fused_gd_iteration_fold(
            fold_y(psi), fold_y(tnp), fold_y(vel) if mu else None,
            pad_for_fold(tg), pad_for_fold(live), alpha, w_reg,
            tuple(float(t) for t in taps), K=2, BZ=8,
            momentum=mu, interpret=True, with_energy=True,
        )
        grad = fields.tsdf_gradient(tnp)
        lap = fields.neg_laplacian(psi)
        dU_S = solver.sobolev_smooth(
            (tnp - tg)[None] * grad + w_reg * lap, jnp.asarray(taps)
        )
        if mu:
            v_r = mu * vel + dU_S
            upd = alpha * v_r
            np.testing.assert_allclose(
                np.asarray(unfold_y(v_k)), np.asarray(v_r), atol=1e-5
            )
        else:
            upd = alpha * dU_S
        psi_r = psi - upd
        tnp_r = fields.sample_trilinear_window(live, psi_r, 2)
        np.testing.assert_allclose(
            np.asarray(unfold_y(p_k)), np.asarray(psi_r), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(unfold_y(t_k)), np.asarray(tnp_r), atol=1e-4
        )
        np.testing.assert_allclose(
            float(mx_k), float(jnp.max(jnp.sum(upd * upd, axis=0))),
            rtol=1e-4,
        )
        e_r = float(data_energy(tg, tnp_r))
        assert abs(float(e_k) - e_r) < 1e-3 * max(1.0, abs(e_r))


def test_estimate_psi_fold_full_solve():
    """estimate_psi auto-dispatches X=64 grids to the folded kernel; the
    full while_loop solve (+ K=1 window and the stall stop) matches the
    XLA window path."""
    from sobfu_tpu.tsdf import init_sphere

    dims = (16, 64, 64)
    vs = 1.0 / 64
    tg, wg = init_sphere(dims, (vs,) * 3, (0.125, 0.5, 0.5), 0.1,
                         8 * vs, 3 * vs)
    tn, wn = init_sphere(dims, (vs,) * 3, (0.125, 0.48, 0.5), 0.11,
                         8 * vs, 3 * vs)
    taps = jnp.asarray(solver.sobolev_filter_1d(7, 0.1))
    taps_static = tuple(float(t) for t in np.asarray(taps))
    for K, stall in ((2, 0), (1, 4)):
        common = (
            fields.identity_field(dims), tg, wg, tn, wn, taps,
            jnp.float32(0.05), jnp.float32(0.2), jnp.int32(10),
            jnp.float32(-1.0),
        )
        ref = solver.estimate_psi(
            *common, warp_window=K, momentum=0.9,
            stall_window=stall, stall_rel=1e-3,
        )
        fold = solver.estimate_psi(
            *common, warp_window=K, momentum=0.9,
            stall_window=stall, stall_rel=1e-3,
            fused_db=True, taps_static=taps_static, db_interpret=True,
        )
        assert int(fold.iters) == int(ref.iters)
        np.testing.assert_allclose(
            np.asarray(fold.psi), np.asarray(ref.psi), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(fold.tsdf_n_psi), np.asarray(ref.tsdf_n_psi),
            atol=2e-5,
        )


def test_multi_fold_matches_chained_single():
    """The VMEM-resident multi-iteration fold kernel (n_inner GD steps per
    launch) is BIT-EXACT against n_inner chained single-iteration fold
    calls — state, velocity, per-iteration max-norms AND energies."""
    from sobfu_tpu.ops.pallas_kernels import (
        fold_y,
        fused_gd_iteration_fold,
        fused_gd_multi_fold,
        pad_folded,
        pad_for_fold,
        unpad_folded,
    )

    dims = (16, 16, 64)
    tg, live, psi, tnp = _setup(dims, seed=23)
    taps = tuple(float(t) for t in solver.sobolev_filter_1d(7, 0.1))
    alpha, w_reg = jnp.float32(0.05), jnp.float32(0.2)
    tg_pad, live_pad = pad_for_fold(tg), pad_for_fold(live)
    psi_f, tnp_f = fold_y(psi), fold_y(tnp)
    vel0 = jnp.zeros_like(psi_f)

    p, t, v = psi_f, tnp_f, vel0
    mxs, es = [], []
    for _ in range(3):
        p, t, v, mx, e = fused_gd_iteration_fold(
            p, t, v, tg_pad, live_pad, alpha, w_reg, taps, K=2,
            momentum=0.9, interpret=True, with_energy=True,
        )
        mxs.append(float(mx))
        es.append(float(e))

    pm, tm, vm, mxv, ev = fused_gd_multi_fold(
        pad_folded(psi_f), pad_folded(tnp_f), vel0, tg_pad, live_pad,
        alpha, w_reg, taps, K=2, n_inner=3, momentum=0.9, interpret=True,
        with_energy=True,
    )
    np.testing.assert_array_equal(np.asarray(unpad_folded(pm)), np.asarray(p))
    np.testing.assert_array_equal(np.asarray(unpad_folded(tm)), np.asarray(t))
    np.testing.assert_array_equal(np.asarray(vm), np.asarray(v))
    # norms: without with_verbose only the LAST row is computed (the
    # chunk-level stop consumes mx_vec[-1]; skipping the rest saves ~8
    # VPU ops/voxel on n_inner - 1 steps) — earlier rows are zeroed
    np.testing.assert_allclose(float(mxv[-1]), mxs[-1], rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(mxv[:-1]), 0.0)
    np.testing.assert_allclose(np.asarray(ev), np.asarray(es), rtol=1e-6)

    # with_verbose restores the full per-iteration norm vector
    out_v = fused_gd_multi_fold(
        pad_folded(psi_f), pad_folded(tnp_f), vel0, tg_pad, live_pad,
        alpha, w_reg, taps, K=2, n_inner=3, momentum=0.9, interpret=True,
        with_energy=True, with_verbose=True,
    )
    np.testing.assert_allclose(np.asarray(out_v[3]), np.asarray(mxs),
                               rtol=1e-6)


def test_multi_fold_xmats_matches_vpu():
    """The MXU x-operator path (use_xmats: block-diagonal lane-axis conv +
    x stencils as matmuls, _x_matrices_fold) reproduces the VPU tap-loop
    fold kernel to f32-reassociation tolerance — state, velocity, norms,
    energies and the verbose bundle."""
    from sobfu_tpu.ops.pallas_kernels import (
        fold_y,
        fused_gd_multi_fold,
        pad_folded,
        pad_for_fold,
    )

    dims = (16, 16, 64)
    tg, live, psi, tnp = _setup(dims, seed=29)
    taps = tuple(float(t) for t in solver.sobolev_filter_1d(7, 0.1))
    alpha, w_reg = jnp.float32(0.05), jnp.float32(0.2)
    tg_pad, live_pad = pad_for_fold(tg), pad_for_fold(live)
    psi_p, tnp_p = pad_folded(fold_y(psi)), pad_folded(fold_y(tnp))
    vel0 = jnp.zeros((3,) + (dims[0], dims[1] // 2, 128), jnp.float32)

    outs = []
    for xm in (False, True):
        outs.append(fused_gd_multi_fold(
            psi_p, tnp_p, vel0, tg_pad, live_pad, alpha, w_reg, taps,
            K=2, n_inner=3, momentum=0.9, interpret=True,
            with_energy=True, with_verbose=True, use_xmats=xm,
        ))
    for a, b, tol in zip(outs[0], outs[1], (2e-5, 2e-5, 2e-5, 1e-6, 5e-3,
                                            5e-3, 5e-3)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=tol, rtol=1e-4
        )


def test_inner_steps_record_energy_matches_single_step():
    """record_energy WITH inner_steps (VERDICT r3 item 7): the multi-fold
    kernel's verbose bundle (pre-update data/reg energy + update norm per
    inner iteration) fills the history with rows matching the single-step
    fold path's — so --vverbose output is identical on the fast path."""
    dims = (16, 16, 64)
    tg, live, _, _ = _setup(dims, seed=31)
    wg = jnp.ones(dims, jnp.float32)
    taps = jnp.asarray(solver.sobolev_filter_1d(7, 0.1))
    taps_static = tuple(float(t) for t in np.asarray(taps))
    psi = fields.identity_field(dims)
    args = (jnp.float32(0.05), jnp.float32(0.2), jnp.int32(8),
            jnp.float32(-1.0))

    common = dict(
        inverse_iters=2, warp_window=2, momentum=0.9, fused_db=True,
        taps_static=taps_static, db_interpret=True,
        record_energy=True, energy_cap=8,
    )
    ref = solver.estimate_psi(psi, tg, wg, live, wg, taps, *args, **common)
    multi = solver.estimate_psi(
        psi, tg, wg, live, wg, taps, *args, **common, inner_steps=4,
    )
    assert int(multi.iters) == 8
    h_ref = np.asarray(ref.energy)
    h_multi = np.asarray(multi.energy)
    assert (h_multi[:, 2] > 0).all()  # all 8 rows populated
    # f32 summation-order noise between the kernel's tile reduction and
    # jnp.sum over the full volume
    np.testing.assert_allclose(h_multi, h_ref, rtol=1e-4, atol=1e-6)

    # compositive increment loop: same kernel body, same bundle
    ref_c = solver.estimate_psi_compositive(
        psi, tg, wg, live, wg, taps, *args, total_window=2, **common,
    )
    multi_c = solver.estimate_psi_compositive(
        psi, tg, wg, live, wg, taps, *args, total_window=2, **common,
        inner_steps=4,
    )
    assert int(multi_c.iters) == 8
    np.testing.assert_allclose(
        np.asarray(multi_c.energy), np.asarray(ref_c.energy),
        rtol=1e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(multi_c.psi), np.asarray(ref_c.psi), atol=1e-6
    )


def test_estimate_psi_inner_steps_matches_single_step():
    """estimate_psi(inner_steps=4) on the fold path == the single-step fold
    dispatch for a fixed iteration budget divisible by the chunk."""
    dims = (16, 16, 64)
    tg, live, _, _ = _setup(dims, seed=29)
    wg = jnp.ones(dims, jnp.float32)
    taps = jnp.asarray(solver.sobolev_filter_1d(7, 0.1))
    taps_static = tuple(float(t) for t in np.asarray(taps))
    psi = fields.identity_field(dims)
    args = (jnp.float32(0.05), jnp.float32(0.2), jnp.int32(8),
            jnp.float32(-1.0))

    ref = solver.estimate_psi(
        psi, tg, wg, live, wg, taps, *args, inverse_iters=2, warp_window=2,
        momentum=0.9, fused_db=True, taps_static=taps_static,
        db_interpret=True,
    )
    multi = solver.estimate_psi(
        psi, tg, wg, live, wg, taps, *args, inverse_iters=2, warp_window=2,
        momentum=0.9, fused_db=True, taps_static=taps_static,
        db_interpret=True, inner_steps=4,
    )
    assert int(multi.iters) == 8
    np.testing.assert_allclose(
        np.asarray(multi.psi), np.asarray(ref.psi), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(multi.tsdf_n_psi), np.asarray(ref.tsdf_n_psi), atol=1e-6
    )
    np.testing.assert_allclose(
        float(multi.max_norm), float(ref.max_norm), rtol=1e-5
    )
