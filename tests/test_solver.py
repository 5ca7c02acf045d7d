"""Solver tests: Sobolev filter, reductions, and convergence.

The reference solver tests (test/solver_test.cpp) contain no assertions —
they validate by converging. Here the same scenarios carry real assertions:
the data energy must drop substantially and the estimated field must move
the live surface onto the global one.
"""

import jax
import jax.numpy as jnp
import numpy as np

from sobfu_tpu import fields, solver
from sobfu_tpu.config import Params
from sobfu_tpu.tsdf import TsdfVolume
from sobfu_tpu.fields import DeformationField

DIM = 32
SIZE = 0.125  # keep voxel size equal to the reference 64/0.25 setup


def make_params(**kw):
    p = Params()
    p.volume_dims = (DIM, DIM, DIM)
    p.volume_size = (SIZE, SIZE, SIZE)
    p.tsdf_trunc_dist = 10.0 * SIZE / DIM
    p.eta = 2.0 * SIZE / DIM
    p.s = 7
    p.lambda_ = 0.1
    p.max_iter = 128
    p.max_update_norm = -1.0  # run all iterations
    p.alpha = 0.01
    p.w_reg = 0.4
    for k, v in kw.items():
        setattr(p, k, v)
    return p


# ---------------------------------------------------------------------------
# Sobolev filter
# ---------------------------------------------------------------------------


def test_filter_table_unit_sum():
    for (s, lam) in [(3, 0.1), (7, 0.05), (7, 0.1), (7, 0.2), (7, 0.4),
                     (9, 0.05), (9, 0.1), (11, 0.1)]:
        taps = solver.sobolev_filter_1d(s, lam)
        assert taps.shape == (s,)
        np.testing.assert_allclose(taps.sum(), 1.0, rtol=1e-6)
        np.testing.assert_allclose(taps, taps[::-1], rtol=1e-5)  # symmetric


def test_principled_solve_reproduces_table():
    """The (Id - lambda L) solve + rank-1 decomposition must reproduce the
    published s=7, lambda=0.1 taps (validates both code paths)."""
    S3 = solver.solve_sobolev_filter_3d(7, 0.1)
    taps = solver.decompose_filter_1d(S3)
    published = np.asarray([0.00030, 0.00441, 0.06571, 0.99565, 0.06571, 0.00441, 0.00030])
    np.testing.assert_allclose(taps, published, atol=2e-4)


def test_filter_fallback_for_unlisted_params():
    taps = solver.sobolev_filter_1d(5, 0.15)  # not in the table
    assert taps.shape == (5,)
    np.testing.assert_allclose(taps.sum(), 1.0, rtol=1e-6)
    assert taps[2] == taps.max()


# ---------------------------------------------------------------------------
# reductions (ports of test/reductions_test.cpp:86-101)
# ---------------------------------------------------------------------------


def test_data_energy_of_unit_difference():
    n = 16
    ones = jnp.ones((n, n, n), jnp.float32)
    zeros = jnp.zeros((n, n, n), jnp.float32)
    e = float(solver.data_energy(ones, zeros))
    np.testing.assert_allclose(e, 0.5 * n**3, rtol=1e-5)


def test_reg_energy_of_identity_is_zero():
    psi = fields.identity_field((8, 8, 8))
    assert float(solver.reg_energy_sobolev(psi)) == 0.0


def test_max_update_norm():
    upd = jnp.zeros((3, 4, 4, 4), jnp.float32)
    upd = upd.at[:, 2, 1, 3].set(jnp.asarray([3.0, 4.0, 0.0]))
    mx, idx = solver.max_update_norm(upd)
    assert float(mx) == 5.0
    assert int(idx) == (2 * 4 + 1) * 4 + 3


# ---------------------------------------------------------------------------
# convergence (solver_test.cpp:109-208 with real assertions)
# ---------------------------------------------------------------------------


def _solve(p, phi_global, phi_n, psi=None):
    s = solver.Solver(p)
    phi_global_psi_inv = TsdfVolume(p)
    phi_n_psi = TsdfVolume(p)
    phi_n_psi.tsdf = phi_n.tsdf
    phi_n_psi.weight = phi_n.weight
    psi = psi or DeformationField(p.volume_dims)
    psi_inv = DeformationField(p.volume_dims)
    res = s.estimate_psi(phi_global, phi_global_psi_inv, phi_n, phi_n_psi, psi, psi_inv)
    return res, psi, psi_inv, phi_n_psi, phi_global_psi_inv


def test_alignment_sphere_translation():
    """Gradient descent is slow by design (the reference runs 2048-8192
    iterations); with alpha=0.1 and 256 iterations the warped live surface
    must land on the global one and the energy must drop substantially."""
    p = make_params(alpha=0.1, w_reg=0.4, max_iter=256)
    c = (0.065, 0.065, 0.065)
    r = 0.01
    phi_global = TsdfVolume(p)
    phi_global.init_sphere(c, r)
    phi_n = TsdfVolume(p)
    phi_n.init_sphere((0.0625, 0.065, 0.065), r)

    e0 = float(solver.data_energy(phi_global.tsdf, phi_n.tsdf))
    res, psi, psi_inv, phi_n_psi, _ = _solve(p, phi_global, phi_n)
    e1 = float(solver.data_energy(phi_global.tsdf, phi_n_psi.tsdf))

    assert np.isfinite(e1)
    assert e1 < 0.75 * e0, (e0, e1)

    # displacement must point from the global sphere toward the live one (-x)
    d = np.asarray(fields.displacement(psi.data))
    band = np.abs(np.asarray(phi_global.tsdf)) < 0.9
    assert d[0][band].mean() < -0.02

    # zero crossings along x through the centre must now coincide
    ci = DIM // 2
    def crossings(t):
        col = np.asarray(t)[ci, ci, :]
        return np.where(np.diff(np.sign(col)) != 0)[0].tolist()
    assert crossings(phi_n_psi.tsdf) == crossings(phi_global.tsdf)

    # psi and its inverse roughly cancel in the interior
    comp = fields.sample_field_trilinear(fields.displacement(psi.data), psi_inv.data) \
        + fields.displacement(psi_inv.data)
    inner = np.asarray(comp)[:, 4:-4, 4:-4, 4:-4]
    assert np.abs(inner).max() < 0.5  # voxel units


def test_alignment_sphere_expanding():
    p = make_params(alpha=0.05, w_reg=0.4, max_iter=256)
    phi_global = TsdfVolume(p)
    phi_global.init_sphere((0.065, 0.065, 0.065), 0.01)
    phi_n = TsdfVolume(p)
    phi_n.init_sphere((0.0625, 0.065, 0.065), 0.0125)

    e0 = float(solver.data_energy(phi_global.tsdf, phi_n.tsdf))
    _, _, _, phi_n_psi, _ = _solve(p, phi_global, phi_n)
    e1 = float(solver.data_energy(phi_global.tsdf, phi_n_psi.tsdf))
    assert e1 < 0.8 * e0, (e0, e1)


def test_serial_alignment_reuses_psi():
    p = make_params(alpha=0.05, w_reg=0.4, max_iter=128)
    c0, r = (0.065, 0.065, 0.065), 0.01
    phi_global = TsdfVolume(p)
    phi_global.init_sphere(c0, r)

    # frame 1
    phi_n = TsdfVolume(p)
    phi_n.init_sphere((0.0625, 0.065, 0.066), r)
    _, psi, _, phi_n_psi, _ = _solve(p, phi_global, phi_n)
    e1 = float(solver.data_energy(phi_global.tsdf, phi_n_psi.tsdf))

    # frame 2 reuses psi as warm start (solver_test.cpp:162-208)
    phi_n2 = TsdfVolume(p)
    phi_n2.init_sphere((0.0615, 0.065, 0.066), r)
    e0_2 = float(solver.data_energy(phi_global.tsdf, phi_n2.tsdf))
    _, psi, _, phi_n2_psi, _ = _solve(p, phi_global, phi_n2, psi=psi)
    e2 = float(solver.data_energy(phi_global.tsdf, phi_n2_psi.tsdf))
    assert e2 < 0.9 * e0_2, (e0_2, e2)
    assert np.isfinite(e1) and np.isfinite(e2)


def test_convergence_criterion_stops_early():
    p = make_params(max_iter=256, max_update_norm=1e-2, alpha=0.01)
    phi_global = TsdfVolume(p)
    phi_global.init_sphere((0.065, 0.065, 0.065), 0.006)
    phi_n = TsdfVolume(p)
    phi_n.init_sphere((0.0645, 0.065, 0.065), 0.006)  # tiny shift
    res, *_ = _solve(p, phi_global, phi_n)
    assert int(res.iters) < 256
    assert float(res.max_norm) <= 1e-2


def test_identity_inputs_give_zero_updates():
    """phi_n == phi_global: gradient of the data term vanishes, psi stays id."""
    p = make_params(max_iter=8, w_reg=0.1)
    phi = TsdfVolume(p)
    phi.init_sphere((0.065, 0.065, 0.065), 0.01)
    res, psi, *_ = _solve(p, phi, phi)
    disp = np.asarray(fields.displacement(psi.data))
    assert np.abs(disp).max() < 1e-4


def test_window_warp_solver_matches_exact():
    """The gather-free bounded-window warp path must reproduce the exact
    solve when displacements stay inside the window."""
    p = make_params(alpha=0.1, w_reg=0.4, max_iter=64)
    phi_global = TsdfVolume(p)
    phi_global.init_sphere((0.065, 0.065, 0.065), 0.01)
    phi_n = TsdfVolume(p)
    phi_n.init_sphere((0.0625, 0.065, 0.065), 0.01)
    taps = jnp.asarray(solver.sobolev_filter_1d(p.s, p.lambda_))

    def run(window):
        psi = fields.identity_field((DIM, DIM, DIM))
        return solver.estimate_psi(
            psi, phi_global.tsdf, phi_global.weight, phi_n.tsdf, phi_n.weight,
            taps, jnp.float32(p.alpha), jnp.float32(p.w_reg),
            jnp.int32(p.max_iter), jnp.float32(-1.0),
            inverse_iters=8, warp_window=window,
        )

    exact = run(None)
    windowed = run(2)  # displacement ~0.6 voxel; K=2 has 3x margin and
    # compiles ~6x less HLO than K=4 (window ops scale as (2K+1)^3)
    np.testing.assert_allclose(
        np.asarray(windowed.psi), np.asarray(exact.psi), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(windowed.tsdf_n_psi), np.asarray(exact.tsdf_n_psi), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(windowed.psi_inv), np.asarray(exact.psi_inv), atol=1e-3
    )


def test_energy_recording_matches_direct_evaluation():
    """verbosity>0 records (data, reg, max_norm) per iteration; entry 0 must
    equal the energies of the initial state (reference prints these,
    solver.cu:132-142)."""
    p = make_params(alpha=0.05, max_iter=4)
    phi_g = TsdfVolume(p)
    phi_g.init_sphere((0.065, 0.065, 0.065), 0.01)
    phi_n = TsdfVolume(p)
    phi_n.init_sphere((0.064, 0.065, 0.065), 0.01)
    taps = jnp.asarray(solver.sobolev_filter_1d(p.s, p.lambda_))
    psi0 = fields.identity_field((DIM, DIM, DIM))
    res = solver.estimate_psi(
        psi0, phi_g.tsdf, phi_g.weight, phi_n.tsdf, phi_n.weight, taps,
        jnp.float32(p.alpha), jnp.float32(p.w_reg),
        jnp.int32(4), jnp.float32(-1.0),
        record_energy=True, energy_cap=4, inverse_iters=2,
    )
    hist = np.asarray(res.energy)
    assert hist.shape == (4, 3)
    # iteration 0 data energy = energy of the unwarped (identity) state
    e0 = float(solver.data_energy(phi_g.tsdf, phi_n.tsdf))
    np.testing.assert_allclose(hist[0, 0], e0, rtol=1e-4)
    np.testing.assert_allclose(hist[0, 1], 0.0, atol=1e-5)  # reg of identity
    assert (hist[:, 2] > 0).all()


def test_compositive_mode_coincides_with_additive_from_identity():
    """With psi0 = identity the compositive scheme IS the additive scheme
    (composition degenerates to addition); the two solvers must agree."""
    p = make_params(alpha=0.1, w_reg=0.4, max_iter=48)
    phi_g = TsdfVolume(p)
    phi_g.init_sphere((0.065, 0.065, 0.065), 0.01)
    phi_n = TsdfVolume(p)
    phi_n.init_sphere((0.0635, 0.065, 0.065), 0.01)
    taps = jnp.asarray(solver.sobolev_filter_1d(p.s, p.lambda_))
    args = (jnp.float32(p.alpha), jnp.float32(p.w_reg),
            jnp.int32(48), jnp.float32(-1.0))

    psi0 = fields.identity_field((DIM, DIM, DIM))
    add = solver.estimate_psi(
        psi0, phi_g.tsdf, phi_g.weight, phi_n.tsdf, phi_n.weight, taps, *args,
        inverse_iters=8, warp_window=2,
    )
    comp = solver.estimate_psi_compositive(
        psi0, phi_g.tsdf, phi_g.weight, phi_n.tsdf, phi_n.weight, taps, *args,
        inverse_iters=8, warp_window=2,
    )
    np.testing.assert_allclose(
        np.asarray(comp.psi), np.asarray(add.psi), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(comp.tsdf_n_psi), np.asarray(add.tsdf_n_psi), atol=2e-4
    )


def test_compositive_mode_tracks_beyond_window():
    """With an accumulated psi0 whose displacement EXCEEDS the window, the
    compositive solve must still reduce the data energy (the additive
    windowed solve cannot sample phi_n correctly there)."""
    p = make_params(alpha=0.15, w_reg=0.4, max_iter=192)
    vs = SIZE / DIM
    # accumulated deformation: constant +6 voxel shift in x (way > window 2)
    psi0 = fields.identity_field((DIM, DIM, DIM))
    psi0 = psi0.at[0].add(6.0)

    # phi_n shifted so that phi_n o psi0 nearly matches phi_global, with a
    # small residual motion for the solver to recover
    c = (0.065, 0.065, 0.065)
    phi_g = TsdfVolume(p)
    phi_g.init_sphere(c, 0.01)
    phi_n = TsdfVolume(p)
    # sample at x+6 voxels => feature sits at x - 6*vs in phi_n's frame;
    # add 1 voxel of residual motion
    phi_n.init_sphere((c[0] + 6 * vs - 1.0 * vs, c[1], c[2]), 0.01)

    taps = jnp.asarray(solver.sobolev_filter_1d(p.s, p.lambda_))
    res = solver.estimate_psi_compositive(
        psi0, phi_g.tsdf, phi_g.weight, phi_n.tsdf, phi_n.weight, taps,
        jnp.float32(p.alpha), jnp.float32(p.w_reg),
        jnp.int32(192), jnp.float32(-1.0),
        inverse_iters=8, warp_window=2,
    )
    t0 = fields.sample_trilinear(phi_n.tsdf, psi0)
    e_before = float(solver.data_energy(phi_g.tsdf, t0))
    e_after = float(solver.data_energy(phi_g.tsdf, res.tsdf_n_psi))
    assert np.isfinite(e_after)
    assert e_after < 0.8 * e_before, (e_before, e_after)


def test_window_guard_margin_math():
    """window_guard_margin = distance of the displacement range to the
    window-K exactness interval (-K, K+1), per the sampler's bound."""
    dims = (8, 8, 8)
    psi = fields.identity_field(dims)
    # displacement range [0, 0.5]: margin for K=1 is
    # min(min_disp - (-1), 2 - max_disp) = min(1.0, 1.5) = 1.0
    psi = psi.at[0, 0, 0, 0].add(0.5)
    assert abs(float(solver.window_guard_margin(psi, K=1)) - 1.0) < 1e-6
    # a -1.25 displacement leaves the K=1 interval: margin goes negative
    psi2 = fields.identity_field(dims).at[1, 2, 2, 2].add(-1.25)
    assert float(solver.window_guard_margin(psi2, K=1)) < 0
    # ... but stays inside K=2's (-2, 3)
    assert float(solver.window_guard_margin(psi2, K=2)) > 0


def test_window_guard_detects_out_of_window_solve():
    """The guarded-K=1 recipe (bench 64^3 headline): on a sub-voxel scene
    the K=1 solve carries a positive margin AND matches K=2 exactly; on a
    larger-motion scene the guard flags the K=1 result for the K=2 redo."""
    p = make_params(alpha=0.15, w_reg=0.3, max_iter=160)
    vs = SIZE / DIM
    c = (0.065, 0.065, 0.065)
    taps = jnp.asarray(solver.sobolev_filter_1d(p.s, p.lambda_))
    args = (jnp.float32(p.alpha), jnp.float32(p.w_reg),
            jnp.int32(160), jnp.float32(-1.0))

    def solve(shift_vox, K):
        phi_g = TsdfVolume(p)
        phi_g.init_sphere(c, 0.01)
        phi_n = TsdfVolume(p)
        phi_n.init_sphere((c[0] - shift_vox * vs, c[1], c[2]), 0.01)
        psi = fields.identity_field((DIM, DIM, DIM))
        return solver.estimate_psi(
            psi, phi_g.tsdf, phi_g.weight, phi_n.tsdf, phi_n.weight,
            taps, *args, inverse_iters=4, warp_window=K, momentum=0.9,
        )

    small1, small2 = solve(0.5, 1), solve(0.5, 2)
    # sub-voxel scene: margin comfortably above the 0.5 fallback threshold
    assert float(solver.window_guard_margin(small1.psi, K=1)) > 0.5
    # same interpolation SEMANTICS; the K=1/K=2 programs lower with
    # different slice-stack shapes, so agreement is to f32 reassociation
    # (measured 1.1e-5 over 160 momentum iterations), not bitwise
    np.testing.assert_allclose(
        np.asarray(small1.psi), np.asarray(small2.psi), atol=5e-5
    )
    # ~2.4-voxel motion: the K=1 warps CLAMP — the data force vanishes at
    # the boundary, so the field stalls just inside the window (measured
    # margin +0.15: wrong answer, positive margin). The CONSERVATIVE 0.5
    # threshold catches it; production redoes such frames at K=2.
    big1 = solve(2.4, 1)
    m_big = float(solver.window_guard_margin(big1.psi, K=1))
    assert m_big < 0.5, m_big
    # and the K=2 redo genuinely tracks further than the clamped solve
    big2 = solve(2.4, 2)
    d1 = float(jnp.max(jnp.abs(big1.psi - fields.identity_field((DIM,) * 3))))
    d2 = float(jnp.max(jnp.abs(big2.psi - fields.identity_field((DIM,) * 3))))
    assert d2 > d1, (d1, d2)


def test_compositive_increment_pyramid_reaches_plain_energy():
    """Increment pyramid (coarse warm start ON the compositive increment,
    round-5): with the same fine iteration cap it must reach at least the
    energy of the plain compositive solve — and the solve/tail outputs
    stay finite — on an UNBOUNDED accumulated field (the mode's regime)."""
    p = make_params(alpha=0.15, w_reg=0.4, max_iter=128)
    vs = SIZE / DIM
    psi0 = fields.identity_field((DIM, DIM, DIM))
    psi0 = psi0.at[0].add(6.0)  # accumulated +6 vox, way beyond window 2
    c = (0.065, 0.065, 0.065)
    phi_g = TsdfVolume(p)
    phi_g.init_sphere(c, 0.01)
    phi_n = TsdfVolume(p)
    phi_n.init_sphere((c[0] + 6 * vs - 1.2 * vs, c[1], c[2]), 0.01)
    taps = jnp.asarray(solver.sobolev_filter_1d(p.s, p.lambda_))
    args = (
        phi_g.tsdf, phi_g.weight, phi_n.tsdf, phi_n.weight, taps,
        jnp.float32(p.alpha), jnp.float32(p.w_reg),
        jnp.int32(128), jnp.float32(-1.0),
    )
    plain = solver.estimate_psi_compositive(
        psi0, *args, inverse_iters=8, warp_window=2, momentum=0.9,
    )
    pyr = solver.estimate_psi_compositive(
        psi0, *args, inverse_iters=8, warp_window=2, momentum=0.9,
        pyramid_levels=2, coarse_max_iter=96,
    )
    e_plain = float(solver.data_energy(phi_g.tsdf, plain.tsdf_n_psi))
    e_pyr = float(solver.data_energy(phi_g.tsdf, pyr.tsdf_n_psi))
    assert e_pyr <= e_plain * 1.05, (e_pyr, e_plain)
    assert not np.isnan(np.asarray(pyr.psi)).any()
    assert int(pyr.iters) > int(plain.iters)  # coarse iters counted


def test_compositive_skip_inverse_passthrough():
    """skip_inverse (the no-log production loop): psi_inv and the global
    warps come back as pass-throughs, and the SOLVE outputs are identical
    to the full run — inverse maintenance must not affect psi."""
    p = make_params(alpha=0.1, w_reg=0.4, max_iter=32)
    c = (0.065, 0.065, 0.065)
    phi_g = TsdfVolume(p)
    phi_g.init_sphere(c, 0.01)
    phi_n = TsdfVolume(p)
    phi_n.init_sphere((c[0] - 0.001, c[1], c[2]), 0.01)
    taps = jnp.asarray(solver.sobolev_filter_1d(p.s, p.lambda_))
    psi0 = fields.identity_field((DIM, DIM, DIM))
    inv0 = fields.identity_field((DIM, DIM, DIM)) + 0.123
    args = (
        psi0, phi_g.tsdf, phi_g.weight, phi_n.tsdf, phi_n.weight, taps,
        jnp.float32(p.alpha), jnp.float32(p.w_reg),
        jnp.int32(32), jnp.float32(-1.0), inv0,
    )
    full = solver.estimate_psi_compositive(*args, warp_window=2)
    skip = solver.estimate_psi_compositive(
        *args, warp_window=2, skip_inverse=True
    )
    np.testing.assert_array_equal(np.asarray(skip.psi), np.asarray(full.psi))
    np.testing.assert_array_equal(
        np.asarray(skip.tsdf_n_psi), np.asarray(full.tsdf_n_psi)
    )
    np.testing.assert_array_equal(np.asarray(skip.psi_inv), np.asarray(inv0))
    np.testing.assert_array_equal(
        np.asarray(skip.tsdf_global_psi_inv), np.asarray(phi_g.tsdf)
    )


def test_compositive_incremental_inverse_tracks_exact():
    """Incremental psi_inv maintenance (invert the bounded increment with
    the window sampler, compose with the previous inverse, exact-anchor
    refinement) must stay within 0.05 voxel of the reference's full 48-step
    exact inverse (vector_fields.cu:111-138) over accumulated frames."""
    vs = SIZE / DIM
    taps = jnp.asarray(solver.sobolev_filter_1d(7, 0.1))
    args = (jnp.float32(0.1), jnp.float32(0.4), jnp.int32(16),
            jnp.float32(-1.0))
    c = SIZE / 2
    phi_g = TsdfVolume(make_params())
    phi_g.init_sphere((c, c, c), 0.01)

    dims = (DIM, DIM, DIM)
    psi = fields.identity_field(dims)
    psi_inv = fields.identity_field(dims)
    for f in range(1, 4):
        phi_n = TsdfVolume(make_params())
        phi_n.init_sphere((c - 0.5 * vs * f, c, c), 0.01)
        res = solver.estimate_psi_compositive(
            psi, phi_g.tsdf, phi_g.weight, phi_n.tsdf, phi_n.weight, taps,
            *args, psi_inv, warp_window=2,
        )
        psi, psi_inv = res.psi, res.psi_inv
        inv_ref = fields.estimate_inverse(psi, 48)
        err = float(jnp.abs(psi_inv - inv_ref).max())
        assert err < 0.05, (f, err)


def test_conv_mxu_matches_slice_sum():
    """The MXU banded-matmul convolution path must agree with the
    slice-sum path through a full solve (monolithic + chunked).

    Small 16^3 grid: the test compiles four distinct solve programs, and
    elementwise agreement does not need volume scale."""
    from sobfu_tpu.tsdf import init_sphere

    dims = (16, 16, 16)
    vs = SIZE / 16
    c = SIZE / 2
    tg, wg = init_sphere(dims, (vs,) * 3, (c, c, c), 0.03, 8 * vs, 2 * vs)
    tn, wn = init_sphere(
        dims, (vs,) * 3, (c - 0.8 * vs, c, c), 0.03, 8 * vs, 2 * vs
    )
    taps = jnp.asarray(solver.sobolev_filter_1d(7, 0.1))
    psi0 = fields.identity_field(dims)
    common = (psi0, tg, wg, tn, wn, taps,
              jnp.float32(0.1), jnp.float32(0.4), jnp.int32(12),
              jnp.float32(-1.0))
    a = solver.estimate_psi(*common, warp_window=2, inverse_iters=2)
    b = solver.estimate_psi(*common, warp_window=2, inverse_iters=2,
                            conv_mxu=True)
    np.testing.assert_allclose(np.asarray(b.psi), np.asarray(a.psi),
                               atol=1e-5)
    c2 = solver.estimate_psi_chunked(*common, n_chunks=4, warp_window=2,
                                     inverse_iters=2)
    d = solver.estimate_psi_chunked(*common, n_chunks=4, warp_window=2,
                                    inverse_iters=2, conv_mxu=True)
    np.testing.assert_allclose(np.asarray(d.psi), np.asarray(c2.psi),
                               atol=1e-5)


def test_solver_class_verbose_prints_energies(capsys):
    """The Solver wrapper must reproduce the reference's verbose energy
    lines (solver.cu:132-142) from the recorded on-device history."""
    p = make_params(alpha=0.05, max_iter=4, verbosity=2)
    phi_g = TsdfVolume(p)
    phi_g.init_sphere((0.065, 0.065, 0.065), 0.01)
    phi_n = TsdfVolume(p)
    phi_n.init_sphere((0.064, 0.065, 0.065), 0.01)
    phi_gpi, phi_np = TsdfVolume(p), TsdfVolume(p)
    psi, psi_inv = DeformationField(p.volume_dims), DeformationField(p.volume_dims)
    s = solver.Solver(p)
    s.estimate_psi(phi_g, phi_gpi, phi_n, phi_np, psi, psi_inv)
    out = capsys.readouterr().out
    assert "iter. no. 1:" in out
    assert "data energy" in out
    assert "REACHED MAX" in out or "CONVERGED" in out


def test_momentum_accelerates_convergence():
    """Heavy-ball momentum (TPU extension) must reach a lower data energy
    than plain GD in the same iteration budget, and mu=None must leave the
    reference behaviour untouched (covered by the golden test)."""
    p = make_params(alpha=0.05, w_reg=0.4, max_iter=96)
    phi_g = TsdfVolume(p)
    phi_g.init_sphere((0.065, 0.065, 0.065), 0.01)
    phi_n = TsdfVolume(p)
    phi_n.init_sphere((0.0625, 0.065, 0.065), 0.01)
    taps = jnp.asarray(solver.sobolev_filter_1d(p.s, p.lambda_))
    args = (jnp.float32(p.alpha), jnp.float32(p.w_reg),
            jnp.int32(96), jnp.float32(-1.0))
    psi0 = fields.identity_field((DIM, DIM, DIM))

    plain = solver.estimate_psi(
        psi0, phi_g.tsdf, phi_g.weight, phi_n.tsdf, phi_n.weight, taps, *args,
        inverse_iters=2,
    )
    mom = solver.estimate_psi(
        psi0, phi_g.tsdf, phi_g.weight, phi_n.tsdf, phi_n.weight, taps, *args,
        inverse_iters=2, momentum=0.9,
    )
    e_plain = float(solver.data_energy(phi_g.tsdf, plain.tsdf_n_psi))
    e_mom = float(solver.data_energy(phi_g.tsdf, mom.tsdf_n_psi))
    assert np.isfinite(e_mom)
    assert e_mom < 0.8 * e_plain, (e_plain, e_mom)


def test_chunked_solve_matches_monolithic_window():
    """The z-chunked large-grid solve must match the monolithic windowed
    solve (same window semantics, chunk halos transparent)."""
    p = make_params(alpha=0.1, w_reg=0.4, max_iter=24)
    phi_g = TsdfVolume(p)
    phi_g.init_sphere((0.065, 0.065, 0.065), 0.01)
    phi_n = TsdfVolume(p)
    phi_n.init_sphere((0.0635, 0.065, 0.065), 0.01)
    taps = jnp.asarray(solver.sobolev_filter_1d(p.s, p.lambda_))
    args = (jnp.float32(p.alpha), jnp.float32(p.w_reg),
            jnp.int32(24), jnp.float32(-1.0))
    psi0 = fields.identity_field((DIM, DIM, DIM))

    def solve(fn, iters, **kw):
        a = (jnp.float32(p.alpha), jnp.float32(p.w_reg),
             jnp.int32(iters), jnp.float32(-1.0))
        return fn(psi0, phi_g.tsdf, phi_g.weight, phi_n.tsdf, phi_n.weight,
                  taps, *a, **kw)

    # single iteration: identical modulo float-summation order (~1e-6)
    m1 = solve(solver.estimate_psi, 1, inverse_iters=2, warp_window=2)
    c1 = solve(solver.estimate_psi_chunked, 1, n_chunks=4, warp_window=2,
               inverse_iters=2)
    np.testing.assert_allclose(np.asarray(c1.psi), np.asarray(m1.psi), atol=5e-6)

    # 24 iterations: tiny reassociation differences get amplified by the
    # gradient flow; require agreement to ~1e-3 voxel
    mono = solve(solver.estimate_psi, 24, inverse_iters=4, warp_window=2)
    chunked = solve(solver.estimate_psi_chunked, 24, n_chunks=4,
                    warp_window=2, inverse_iters=4)
    np.testing.assert_allclose(
        np.asarray(chunked.psi), np.asarray(mono.psi), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(chunked.tsdf_n_psi), np.asarray(mono.tsdf_n_psi), atol=1e-3
    )
    np.testing.assert_allclose(
        float(chunked.max_norm), float(mono.max_norm), rtol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(chunked.psi_inv), np.asarray(mono.psi_inv), atol=1e-3
    )
    # warped weights (floor-corner rule through the z-offset sampler): the
    # floor index may flip where psi differs by float noise near .0
    # boundaries, so compare allowing a small fraction of flips
    wdiff = np.mean(
        np.asarray(chunked.weight_n_psi) != np.asarray(mono.weight_n_psi)
    )
    assert wdiff < 0.01, wdiff
    gdiff = np.mean(
        np.asarray(chunked.weight_global_psi_inv)
        != np.asarray(mono.weight_global_psi_inv)
    )
    assert gdiff < 0.01, gdiff


def test_chunked_solve_z_displacement_regression():
    """Chunked must match monolithic for displacement ALONG Z (regression:
    a z0 frame mix-up clamped positive z-displacements silently — the
    x-displacement fixtures never caught it)."""
    p = make_params(alpha=0.1, w_reg=0.4, max_iter=12)
    phi_g = TsdfVolume(p)
    phi_g.init_sphere((0.065, 0.065, 0.065), 0.01)
    phi_n = TsdfVolume(p)
    # live sphere shifted +z AND -z mix via two lobes: use +z shift
    phi_n.init_sphere((0.065, 0.065, 0.0635), 0.01)
    taps = jnp.asarray(solver.sobolev_filter_1d(p.s, p.lambda_))
    args = (jnp.float32(p.alpha), jnp.float32(p.w_reg),
            jnp.int32(12), jnp.float32(-1.0))
    psi0 = fields.identity_field((DIM, DIM, DIM))

    mono = solver.estimate_psi(
        psi0, phi_g.tsdf, phi_g.weight, phi_n.tsdf, phi_n.weight, taps, *args,
        inverse_iters=2, warp_window=2,
    )
    chunked = solver.estimate_psi_chunked(
        psi0, phi_g.tsdf, phi_g.weight, phi_n.tsdf, phi_n.weight, taps, *args,
        n_chunks=4, warp_window=2, inverse_iters=2,
    )
    np.testing.assert_allclose(
        np.asarray(chunked.psi), np.asarray(mono.psi), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(chunked.tsdf_n_psi), np.asarray(mono.tsdf_n_psi), atol=5e-4
    )


def test_compositive_chunked_matches_monolithic():
    """Chunked compositive = monolithic compositive (delegated loop)."""
    p = make_params(alpha=0.1, w_reg=0.4, max_iter=16)
    vs = SIZE / DIM
    psi0 = fields.identity_field((DIM, DIM, DIM)).at[0].add(3.0)
    c = (0.065, 0.065, 0.065)
    phi_g = TsdfVolume(p)
    phi_g.init_sphere(c, 0.01)
    phi_n = TsdfVolume(p)
    phi_n.init_sphere((c[0] + 3 * vs - 0.8 * vs, c[1], c[2]), 0.01)
    taps = jnp.asarray(solver.sobolev_filter_1d(p.s, p.lambda_))
    args = (jnp.float32(p.alpha), jnp.float32(p.w_reg),
            jnp.int32(16), jnp.float32(-1.0))

    mono = solver.estimate_psi_compositive(
        psi0, phi_g.tsdf, phi_g.weight, phi_n.tsdf, phi_n.weight, taps, *args,
        inverse_iters=4, warp_window=2,
    )
    chunked = solver.estimate_psi_compositive(
        psi0, phi_g.tsdf, phi_g.weight, phi_n.tsdf, phi_n.weight, taps, *args,
        inverse_iters=4, warp_window=2, n_chunks=4,
    )
    np.testing.assert_allclose(
        np.asarray(chunked.psi), np.asarray(mono.psi), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(chunked.tsdf_n_psi), np.asarray(mono.tsdf_n_psi), atol=1e-3
    )


def test_auto_chunking_dispatch():
    """Solver auto-selects the chunked solve for windowed 128-deep grids and
    produces finite results through the class API."""
    p = Params()
    p.volume_dims = (16, 16, 128)  # (X, Y, Z): 128 deep
    p.volume_size = (0.0625, 0.0625, 0.5)
    p.tsdf_trunc_dist = 10 * 0.5 / 128
    p.eta = 2 * 0.5 / 128
    p.max_iter = 8
    p.max_update_norm = -1.0
    p.alpha = 0.05
    p.warp_window = 2
    s = solver.Solver(p)
    assert s.z_chunks == 8

    phi_g = TsdfVolume(p)
    phi_g.init_sphere((0.03, 0.03, 0.25), 0.015)
    phi_n = TsdfVolume(p)
    phi_n.init_sphere((0.03, 0.03, 0.246), 0.015)
    phi_gpi, phi_np = TsdfVolume(p), TsdfVolume(p)
    psi = DeformationField(p.volume_dims)
    psi_inv = DeformationField(p.volume_dims)
    res = s.estimate_psi(phi_g, phi_gpi, phi_n, phi_np, psi, psi_inv)
    assert int(res.iters) == 8
    assert bool(jnp.all(jnp.isfinite(res.psi)))
    assert psi.no_nans()


def test_chunked_energy_history_matches_monolithic():
    """Chunked energy recording (VERDICT r1 item 5): per-iteration
    (e_data, e_reg, max_norm) must match the monolithic solve's history."""
    p = make_params(alpha=0.1, w_reg=0.4)
    phi_g = TsdfVolume(p)
    phi_g.init_sphere((0.065, 0.065, 0.065), 0.01)
    phi_n = TsdfVolume(p)
    phi_n.init_sphere((0.065, 0.0635, 0.062), 0.01)
    taps = jnp.asarray(solver.sobolev_filter_1d(p.s, p.lambda_))
    psi0 = fields.identity_field((DIM, DIM, DIM))
    iters = 12
    args = (jnp.float32(p.alpha), jnp.float32(p.w_reg),
            jnp.int32(iters), jnp.float32(-1.0))

    mono = solver.estimate_psi(
        psi0, phi_g.tsdf, phi_g.weight, phi_n.tsdf, phi_n.weight, taps, *args,
        inverse_iters=2, warp_window=2, record_energy=True, energy_cap=iters,
    )
    chunked = solver.estimate_psi_chunked(
        psi0, phi_g.tsdf, phi_g.weight, phi_n.tsdf, phi_n.weight, taps, *args,
        n_chunks=4, warp_window=2, inverse_iters=2,
        record_energy=True, energy_cap=iters,
    )
    hm = np.asarray(mono.energy)
    hc = np.asarray(chunked.energy)
    assert hm.shape == hc.shape == (iters, 3)
    assert np.all(hm[:, 0] > 0)  # data energy actually recorded
    np.testing.assert_allclose(hc[:, 0], hm[:, 0], rtol=1e-4)  # e_data
    np.testing.assert_allclose(hc[:, 1], hm[:, 1], rtol=1e-3, atol=1e-6)  # e_reg
    np.testing.assert_allclose(hc[:, 2], hm[:, 2], rtol=1e-3)  # max_norm


def test_chunked_momentum_matches_monolithic():
    """Momentum threads through the chunked solve (ADVICE r1: it used to be
    silently ignored on auto-chunked grids)."""
    p = make_params(alpha=0.05, w_reg=0.4)
    phi_g = TsdfVolume(p)
    phi_g.init_sphere((0.065, 0.065, 0.065), 0.01)
    phi_n = TsdfVolume(p)
    phi_n.init_sphere((0.0635, 0.065, 0.0665), 0.01)
    taps = jnp.asarray(solver.sobolev_filter_1d(p.s, p.lambda_))
    psi0 = fields.identity_field((DIM, DIM, DIM))
    args = (jnp.float32(p.alpha), jnp.float32(p.w_reg),
            jnp.int32(16), jnp.float32(-1.0))

    mono = solver.estimate_psi(
        psi0, phi_g.tsdf, phi_g.weight, phi_n.tsdf, phi_n.weight, taps, *args,
        inverse_iters=2, warp_window=2, momentum=0.9,
    )
    chunked = solver.estimate_psi_chunked(
        psi0, phi_g.tsdf, phi_g.weight, phi_n.tsdf, phi_n.weight, taps, *args,
        n_chunks=4, warp_window=2, inverse_iters=2, momentum=0.9,
    )
    plain = solver.estimate_psi_chunked(
        psi0, phi_g.tsdf, phi_g.weight, phi_n.tsdf, phi_n.weight, taps, *args,
        n_chunks=4, warp_window=2, inverse_iters=2,
    )
    np.testing.assert_allclose(
        np.asarray(chunked.psi), np.asarray(mono.psi), atol=1e-3
    )
    # and momentum actually changed the numbers vs the plain chunked solve
    assert float(jnp.max(jnp.abs(chunked.psi - plain.psi))) > 1e-3


def test_auto_chunked_verbose_prints_energies(capsys):
    """--verbose must print energy lines on auto-chunked (TPU-default 128-deep
    windowed) configs too, not silently go quiet (VERDICT r1 item 5)."""
    p = Params()
    p.volume_dims = (16, 16, 128)
    p.volume_size = (0.0625, 0.0625, 0.5)
    p.tsdf_trunc_dist = 10 * 0.5 / 128
    p.eta = 2 * 0.5 / 128
    p.max_iter = 4
    p.max_update_norm = -1.0
    p.alpha = 0.05
    p.warp_window = 2
    p.verbosity = 2
    s = solver.Solver(p)
    assert s.z_chunks == 8  # the auto-chunked branch is the one under test

    phi_g = TsdfVolume(p)
    phi_g.init_sphere((0.03, 0.03, 0.25), 0.015)
    phi_n = TsdfVolume(p)
    phi_n.init_sphere((0.03, 0.03, 0.246), 0.015)
    phi_gpi, phi_np = TsdfVolume(p), TsdfVolume(p)
    psi = DeformationField(p.volume_dims)
    psi_inv = DeformationField(p.volume_dims)
    s.estimate_psi(phi_g, phi_gpi, phi_n, phi_np, psi, psi_inv)
    out = capsys.readouterr().out
    assert out.count("data energy") == 4, out
    assert "max. update norm" in out


def test_pyramid_reaches_oracle_energy_with_fewer_fine_iters():
    """Coarse-to-fine warm start (estimate_psi_pyramid): reaches at least
    the energy plain full-resolution GD reaches, with fewer total
    iterations than the momentum-only solve (the coarse share of them is
    8x cheaper on top)."""
    dim = 32
    vs = 1.0 / dim
    dims = (dim,) * 3
    from sobfu_tpu.tsdf import init_sphere

    tg, wg = init_sphere(dims, (vs,) * 3, (0.5, 0.5, 0.5), 0.20, 8 * vs, 3 * vs)
    tn, wn = init_sphere(
        dims, (vs,) * 3, (0.5 - 1.3 * vs, 0.5, 0.5), 0.205, 8 * vs, 3 * vs
    )
    taps = jnp.asarray(solver.sobolev_filter_1d(7, 0.1))
    common = (
        fields.identity_field(dims), tg, wg, tn, wn, taps,
        jnp.float32(0.05), jnp.float32(0.2), jnp.int32(512), jnp.float32(1e-3),
    )
    gd = solver.estimate_psi(*common, warp_window=2)
    mom = solver.estimate_psi(*common, warp_window=2, momentum=0.9)
    pyr = solver.estimate_psi_pyramid(
        *common, levels=2, warp_window=2, momentum=0.9
    )
    e_gd = float(solver.data_energy(tg, gd.tsdf_n_psi))
    e_pyr = float(solver.data_energy(tg, pyr.tsdf_n_psi))
    assert e_pyr <= e_gd * 1.05, (e_pyr, e_gd)
    assert int(pyr.iters) < int(mom.iters) < int(gd.iters)
    assert not np.isnan(np.asarray(pyr.psi)).any()


def test_pyramid_whole_frame_jit_matches_eager():
    """estimate_psi_pyramid traced under ONE outer jit (as the production
    pipeline and bench run it — one dispatch per frame) must match the
    eager host-orchestrated pyramid: same iteration count, psi equal to
    fp-reassociation tolerance. Guards the trace-safety of the pyramid's
    host-side helpers (pool/resize matrix extraction)."""
    dim = 16
    vs = 1.0 / dim
    dims = (dim,) * 3
    from sobfu_tpu.tsdf import init_sphere

    tg, wg = init_sphere(dims, (vs,) * 3, (0.5, 0.5, 0.5), 0.20, 8 * vs, 3 * vs)
    tn, wn = init_sphere(
        dims, (vs,) * 3, (0.5 - 1.0 * vs, 0.5, 0.5), 0.21, 8 * vs, 3 * vs
    )
    taps = jnp.asarray(solver.sobolev_filter_1d(7, 0.1))

    def run(live):
        return solver.estimate_psi_pyramid(
            fields.identity_field(dims), tg, wg, live, wn, taps,
            jnp.float32(0.05), jnp.float32(0.2), jnp.int32(24),
            jnp.float32(1e-3), levels=2, warp_window=2, momentum=0.9,
        )

    jitted = jax.jit(run)(tn)
    eager = run(tn)
    assert int(jitted.iters) == int(eager.iters)
    np.testing.assert_allclose(
        np.asarray(jitted.psi), np.asarray(eager.psi), atol=2e-3
    )


def test_stall_detector_stops_on_flat_data_energy():
    """With an unreachable update-norm threshold, the data-energy stall
    detector must stop the loop early at (near-)converged data energy;
    stall_window=0 must preserve exact reference stopping semantics
    (runs to the cap)."""
    dim = 32
    vs = 1.0 / dim
    dims = (dim,) * 3
    from sobfu_tpu.tsdf import init_sphere

    tg, wg = init_sphere(dims, (vs,) * 3, (0.5, 0.5, 0.5), 0.20, 8 * vs, 3 * vs)
    tn, wn = init_sphere(
        dims, (vs,) * 3, (0.5 - 1.3 * vs, 0.5, 0.5), 0.205, 8 * vs, 3 * vs
    )
    taps = jnp.asarray(solver.sobolev_filter_1d(7, 0.1))
    common = (
        fields.identity_field(dims), tg, wg, tn, wn, taps,
        jnp.float32(0.05), jnp.float32(0.2), jnp.int32(1024),
        jnp.float32(1e-9),  # unreachable: the norm plateaus on reg drift
    )
    ref = solver.estimate_psi(*common, warp_window=2, momentum=0.9)
    st = solver.estimate_psi(
        *common, warp_window=2, momentum=0.9, stall_window=32, stall_rel=1e-3
    )
    assert int(ref.iters) == 1024  # stall off: reference cap-out semantics
    assert int(st.iters) < 512
    e_ref = float(solver.data_energy(tg, ref.tsdf_n_psi))
    e_st = float(solver.data_energy(tg, st.tsdf_n_psi))
    assert e_st <= e_ref * 1.02, (e_st, e_ref)


def test_compositive_total_window_matches_exact_tails():
    """With total_window set (all-windowed T0/composition/inverse/tails),
    a bounded-deformation compositive solve must agree with the exact-
    gather compositive solve to interpolation round-off."""
    dim = 24
    vs = 1.0 / dim
    dims = (dim,) * 3
    from sobfu_tpu.tsdf import init_sphere

    tg, wg = init_sphere(dims, (vs,) * 3, (0.5, 0.5, 0.5), 0.2, 8 * vs, 3 * vs)
    tn, wn = init_sphere(
        dims, (vs,) * 3, (0.5 - 0.9 * vs, 0.5, 0.5), 0.2, 8 * vs, 3 * vs
    )
    taps = jnp.asarray(solver.sobolev_filter_1d(7, 0.1))
    # psi0: a smooth bounded warm start (|disp| <= 1 voxel), as the pyramid
    # fine level would supply
    ident = fields.identity_field(dims)
    zz = jnp.linspace(0.0, np.pi, dim)
    psi0 = ident.at[0].add(0.8 * jnp.sin(zz)[:, None, None])
    args = (jnp.float32(0.05), jnp.float32(0.2), jnp.int32(32),
            jnp.float32(-1.0))

    exact = solver.estimate_psi_compositive(
        psi0, tg, wg, tn, wn, taps, *args, warp_window=1, inverse_iters=16,
    )
    windowed = solver.estimate_psi_compositive(
        psi0, tg, wg, tn, wn, taps, *args, warp_window=1, inverse_iters=16,
        total_window=3,
    )
    np.testing.assert_allclose(
        np.asarray(windowed.psi), np.asarray(exact.psi), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(windowed.tsdf_n_psi), np.asarray(exact.tsdf_n_psi),
        atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(windowed.psi_inv), np.asarray(exact.psi_inv), atol=5e-3
    )


def test_pyramid_fine_window_reaches_oracle_energy():
    """Production-plus mode: pyramid + momentum with the K=1 compositive
    fine level (fine_window=1) must reach at least the data energy plain
    full-resolution GD reaches at its own convergence point."""
    dim = 32
    vs = 1.0 / dim
    dims = (dim,) * 3
    from sobfu_tpu.tsdf import init_sphere

    tg, wg = init_sphere(dims, (vs,) * 3, (0.5, 0.5, 0.5), 0.20, 8 * vs, 3 * vs)
    tn, wn = init_sphere(
        dims, (vs,) * 3, (0.5 - 1.3 * vs, 0.5, 0.5), 0.205, 8 * vs, 3 * vs
    )
    taps = jnp.asarray(solver.sobolev_filter_1d(7, 0.1))
    common = (
        fields.identity_field(dims), tg, wg, tn, wn, taps,
        jnp.float32(0.05), jnp.float32(0.2), jnp.int32(512), jnp.float32(1e-3),
    )
    gd = solver.estimate_psi(*common, warp_window=2)
    pyr = solver.estimate_psi_pyramid(
        *common, levels=2, warp_window=2, momentum=0.9, fine_window=1
    )
    e_gd = float(solver.data_energy(tg, gd.tsdf_n_psi))
    e_pyr = float(solver.data_energy(tg, pyr.tsdf_n_psi))
    assert e_pyr <= e_gd * 1.05, (e_pyr, e_gd)
    assert not np.isnan(np.asarray(pyr.psi)).any()
    # the composed inverse must actually invert: psi(psi_inv(v)) ~ v
    comp = fields.sample_field_trilinear(pyr.psi, pyr.psi_inv)
    ident = fields.identity_field(dims)
    interior = (slice(None),) + (slice(4, -4),) * 3
    assert float(jnp.max(jnp.abs(comp[interior] - ident[interior]))) <= 0.1


def test_pyramid_solver_dispatch():
    """PYRAMID_LEVELS knob: honored when dims halve evenly, dropped
    otherwise."""
    p = Params()
    p.warp_window = 2
    p.pyramid_levels = 2
    s = solver.Solver(p)
    assert s.pyramid_levels == 2

    p2 = Params()
    p2.volume_dims = (127, 127, 127)
    p2.pyramid_levels = 2
    s2 = solver.Solver(p2)
    assert s2.pyramid_levels == 1


def test_inverse_warm_start_matches_cold_48():
    """Warm-started 4-iteration inverse (previous frame's inverse as init —
    the production default) stays within 0.05 voxel of the reference-parity
    48-from-identity inverse across accumulated frames. (The Sobolev-
    smoothed field contracts the fixed point ~10x/step: measured 1e-4
    voxel at 256^3 for warm-4, BENCHLOG 2026-08-18.)"""
    dim = 24
    vs = 1.0 / dim
    dims = (dim,) * 3
    from sobfu_tpu.tsdf import init_sphere

    taps = jnp.asarray(solver.sobolev_filter_1d(7, 0.1))
    tg, wg = init_sphere(dims, (vs,) * 3, (0.5, 0.5, 0.5), 0.22, 8 * vs, 3 * vs)
    psi = fields.identity_field(dims)
    psi_inv_warm = fields.identity_field(dims)
    for k in range(3):  # accumulate deformation over frames
        # 0.6-voxel steps keep the accumulated displacement (<= 1.8) inside
        # the K=2 window; K=2 compiles ~2.7x less HLO than the original K=3
        tn, wn = init_sphere(
            dims, (vs,) * 3, (0.5 - 0.6 * (k + 1) * vs, 0.5, 0.5),
            0.22, 8 * vs, 3 * vs,
        )
        cold = solver.estimate_psi(
            psi, tg, wg, tn, wn, taps, jnp.float32(0.05), jnp.float32(0.2),
            jnp.int32(64), jnp.float32(-1.0), warp_window=2, inverse_iters=48,
        )
        warm = solver.estimate_psi(
            psi, tg, wg, tn, wn, taps, jnp.float32(0.05), jnp.float32(0.2),
            jnp.int32(64), jnp.float32(-1.0), psi_inv_warm,
            warp_window=2, inverse_iters=4,
        )
        err = float(jnp.max(jnp.abs(warm.psi_inv - cold.psi_inv)))
        assert err <= 0.05, (k, err)
        # composition check: psi(psi_inv(v)) ~ v on the interior
        comp = fields.sample_field_trilinear(warp := warm.psi, warm.psi_inv)
        ident = fields.identity_field(dims)
        interior = (slice(None),) + (slice(4, -4),) * 3
        cerr = float(jnp.max(jnp.abs(comp[interior] - ident[interior])))
        assert cerr <= 0.1, (k, cerr)
        psi = warm.psi
        psi_inv_warm = warm.psi_inv


def test_chunked_inverse_warm_start_matches_cold_48():
    """The z-chunked solve accepts a psi_inv0 warm start: warm 12-iteration
    inverse stays within 0.05 voxel of its own cold 48-from-identity
    (mirrors test_inverse_warm_start_matches_cold_48 for the chunked path —
    previously psi_inv0 was silently dropped there)."""
    dim = 24
    vs = 1.0 / dim
    dims = (dim,) * 3
    from sobfu_tpu.tsdf import init_sphere

    taps = jnp.asarray(solver.sobolev_filter_1d(7, 0.1))
    tg, wg = init_sphere(dims, (vs,) * 3, (0.5, 0.5, 0.5), 0.22, 8 * vs, 3 * vs)
    tn, wn = init_sphere(
        dims, (vs,) * 3, (0.5 - 0.8 * vs, 0.5, 0.5), 0.22, 8 * vs, 3 * vs
    )
    psi = fields.identity_field(dims)
    common = (psi, tg, wg, tn, wn, taps, jnp.float32(0.05), jnp.float32(0.2),
              jnp.int32(48), jnp.float32(-1.0))
    cold = solver.estimate_psi_chunked(
        *common, n_chunks=2, warp_window=2, inverse_iters=48
    )
    warm = solver.estimate_psi_chunked(
        *common, cold.psi_inv, n_chunks=2, warp_window=2, inverse_iters=4
    )
    err = float(jnp.max(jnp.abs(warm.psi_inv - cold.psi_inv)))
    assert err <= 0.05, err
    # and a warm start actually changes the result vs identity-init at the
    # same (tiny) iteration count — i.e. psi_inv0 is no longer dropped
    short_cold = solver.estimate_psi_chunked(
        *common, n_chunks=2, warp_window=2, inverse_iters=4
    )
    assert float(jnp.max(jnp.abs(short_cold.psi_inv - warm.psi_inv))) > 1e-6


def test_pyramid_stall_detector_skips_coarse_levels():
    """The data-energy stall stop must act on the FINE level only: coarse
    levels plateau early by construction (they cannot resolve the fine
    residual), and a coarse stall shifts iterations to the 8x-costlier
    fine grid (BENCHLOG 2026-08-18: 2x whole-solve cost at 128^3). With a
    stall that fires instantly (rel=1e9), the fine level stops at
    2*stall_window while the coarse level must still run to its own
    threshold — total iterations well above the all-stalled floor."""
    dim = 16
    vs = 1.0 / dim
    dims = (dim,) * 3
    from sobfu_tpu.tsdf import init_sphere

    tg, wg = init_sphere(dims, (vs,) * 3, (0.5, 0.5, 0.5), 0.20, 8 * vs, 3 * vs)
    tn, wn = init_sphere(
        dims, (vs,) * 3, (0.5 - 1.3 * vs, 0.5, 0.5), 0.205, 8 * vs, 3 * vs
    )
    taps = jnp.asarray(solver.sobolev_filter_1d(7, 0.1))
    res = solver.estimate_psi_pyramid(
        fields.identity_field(dims), tg, wg, tn, wn, taps,
        jnp.float32(0.05), jnp.float32(0.2), jnp.int32(256),
        jnp.float32(1e-4), levels=2, warp_window=2, momentum=0.9,
        stall_window=4, stall_rel=1e9,
    )
    # fine level stalls at exactly 2*stall_window = 8; if the coarse level
    # stalled too, the total would be 16
    assert int(res.iters) > 24, int(res.iters)


def test_zscan_solve_matches_window_solve():
    """estimate_psi_zscan (the 512^3-scale lax.scan-over-z-slabs engine,
    one slab body in the compiled program) == the monolithic windowed
    estimate_psi, f32 storage exactly, bf16 STORAGE within the bf16
    representation error of the loop-invariant volumes; momentum too."""
    from sobfu_tpu.tsdf import init_sphere

    dims = (16, 16, 16)
    vs = 1.0 / 16
    trunc, eta = 8 * vs, 3 * vs
    tg, wg = init_sphere(dims, (vs,) * 3, (0.5, 0.5, 0.5), 0.2, trunc, eta)
    tn, wn = init_sphere(
        dims, (vs,) * 3, (0.5 - 1.3 * vs, 0.5, 0.5), 0.205, trunc, eta
    )
    taps = jnp.asarray(solver.sobolev_filter_1d(7, 0.1))
    psi = fields.identity_field(dims)
    args = (jnp.float32(0.05), jnp.float32(0.2), jnp.int32(8),
            jnp.float32(-1.0))

    ref = solver.estimate_psi(
        psi, tg, wg, tn, wn, taps, *args, warp_window=2, inverse_iters=1
    )
    psi_s, tnp_s, iters, mn = solver.estimate_psi_zscan(
        psi, tg, tn, taps, *args, slab=4, warp_window=2, storage_bf16=False
    )
    assert int(iters) == 8
    np.testing.assert_allclose(np.asarray(psi_s), np.asarray(ref.psi),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(tnp_s),
                               np.asarray(ref.tsdf_n_psi), atol=1e-6)
    np.testing.assert_allclose(float(mn), float(ref.max_norm), rtol=1e-5)

    psi_b, tnp_b, _, _ = solver.estimate_psi_zscan(
        psi, tg, tn, taps, *args, slab=4, warp_window=2, storage_bf16=True
    )
    assert float(jnp.max(jnp.abs(psi_b - ref.psi))) < 2e-3
    assert float(jnp.max(jnp.abs(tnp_b - ref.tsdf_n_psi))) < 8e-3

    refm = solver.estimate_psi(
        psi, tg, wg, tn, wn, taps, *args, warp_window=2, inverse_iters=1,
        momentum=0.9,
    )
    psi_m, _, _, mn_m = solver.estimate_psi_zscan(
        psi, tg, tn, taps, *args, slab=4, warp_window=2, momentum=0.9,
        storage_bf16=False,
    )
    np.testing.assert_allclose(np.asarray(psi_m), np.asarray(refm.psi),
                               atol=1e-6)
    np.testing.assert_allclose(float(mn_m), float(refm.max_norm), rtol=1e-5)
