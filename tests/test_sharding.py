"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

The reference is single-GPU (SURVEY.md §2: no distributed layer); this is
the TPU-native scale-out path — z-sharded solver with halo exchange and
scene-batched data parallelism — validated for EXACTNESS against the
single-device solve.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sobfu_tpu import fields, solver
from sobfu_tpu.parallel import make_mesh, make_sharded_estimate_psi, make_frame_step
from sobfu_tpu.tsdf import init_sphere

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)

DIM = 32
SIZE = 0.125


def _scene(shift):
    dims = (DIM, DIM, DIM)
    vs = SIZE / DIM
    trunc, eta = 10 * vs, 2 * vs
    c = SIZE / 2
    tg, wg = init_sphere(dims, (vs, vs, vs), (c, c, c), 0.01, trunc, eta)
    tn, wn = init_sphere(dims, (vs, vs, vs), (c - shift, c, c), 0.01, trunc, eta)
    return tg, wg, tn, wn


def test_sharded_solve_matches_single_device():
    tg, wg, tn, wn = _scene(2.0 * SIZE / DIM)
    taps = jnp.asarray(solver.sobolev_filter_1d(7, 0.1))
    psi = fields.identity_field((DIM, DIM, DIM))
    args = (jnp.float32(0.1), jnp.float32(0.4), jnp.int32(24), jnp.float32(-1.0))

    ref = solver.estimate_psi(psi, tg, wg, tn, wn, taps, *args, inverse_iters=8)

    mesh = make_mesh(n_z=8)
    fn = make_sharded_estimate_psi(mesh, inverse_iters=8)
    psi_s, psi_inv_s, tnp_s, wnp_s, tgi_s, wgi_s, iters_s, mn_s = fn(
        psi, tg, wg, tn, wn, taps, *args
    )

    assert int(iters_s) == 24
    np.testing.assert_allclose(np.asarray(psi_s), np.asarray(ref.psi), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(tnp_s), np.asarray(ref.tsdf_n_psi), atol=1e-5
    )
    np.testing.assert_allclose(float(mn_s), float(ref.max_norm), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(psi_inv_s), np.asarray(ref.psi_inv), atol=1e-4
    )


def test_frame_step_scene_batch():
    mesh = make_mesh(n_z=4, n_scene=2)
    dims_zyx = (16, 16, 16)
    step, shardings = make_frame_step(mesh, dims_zyx, inverse_iters=2)

    S = 4
    vs = 0.25 / 16
    psi1 = fields.identity_field(dims_zyx)
    psi_b = jax.device_put(
        jnp.broadcast_to(psi1[None], (S,) + psi1.shape), shardings["psi"]
    )
    tg_b = jax.device_put(jnp.ones((S,) + dims_zyx, jnp.float32), shardings["vol"])
    wg_b = jax.device_put(jnp.ones((S,) + dims_zyx, jnp.float32), shardings["vol"])
    dists_b = jax.device_put(
        jnp.full((S, 24, 32), 0.5, jnp.float32), shardings["img"]
    )
    vol2cam = np.eye(4, dtype=np.float32)
    vol2cam[:3, 3] = (-0.125, -0.125, 0.2)
    v2c_b = jnp.broadcast_to(jnp.asarray(vol2cam)[None], (S, 4, 4))

    taps = jnp.asarray(solver.sobolev_filter_1d(7, 0.1))
    out = step(
        psi_b, tg_b, wg_b, dists_b, v2c_b,
        jnp.asarray([20.0, 20.0, 16.0, 12.0], jnp.float32),
        jnp.asarray([vs, vs, vs], jnp.float32),
        jnp.float32(10 * vs), jnp.float32(2 * vs), jnp.float32(64.0),
        taps, jnp.float32(0.05), jnp.float32(0.2),
        jnp.int32(2), jnp.float32(-1.0),
    )
    psi_out, psi_inv_out, tg_out, wg_out, iters, mnorm = out
    assert psi_out.shape == (S, 3) + dims_zyx
    assert bool(jnp.all(jnp.isfinite(tg_out)))
    assert np.asarray(iters).tolist() == [2] * S


def test_sharded_window_warp_matches_exact():
    """warp_window path in the sharded solve must match the exact-gather
    sharded solve for in-window displacements."""
    tg, wg, tn, wn = _scene(1.5 * SIZE / DIM)
    taps = jnp.asarray(solver.sobolev_filter_1d(7, 0.1))
    psi = fields.identity_field((DIM, DIM, DIM))
    args = (jnp.float32(0.1), jnp.float32(0.4), jnp.int32(16), jnp.float32(-1.0))

    mesh = make_mesh(n_z=8)
    exact = make_sharded_estimate_psi(mesh, inverse_iters=4)(
        psi, tg, wg, tn, wn, taps, *args
    )
    windowed = make_sharded_estimate_psi(mesh, inverse_iters=4, warp_window=4)(
        psi, tg, wg, tn, wn, taps, *args
    )
    # psi, tnp from the loop; psi_inv, tgi, wgi, wnp exercise the halo-based
    # inverse + tail warps (the memory-scalable path with no all_gather)
    np.testing.assert_allclose(
        np.asarray(windowed[0]), np.asarray(exact[0]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(windowed[2]), np.asarray(exact[2]), atol=1e-5
    )
    np.testing.assert_allclose(  # psi_inv
        np.asarray(windowed[1]), np.asarray(exact[1]), atol=1e-4
    )
    np.testing.assert_allclose(  # tsdf_global o psi_inv
        np.asarray(windowed[4]), np.asarray(exact[4]), atol=1e-4
    )
    np.testing.assert_allclose(  # warped weights (floor rule, exact ints)
        np.asarray(windowed[5]), np.asarray(exact[5]), atol=0
    )
    np.testing.assert_allclose(  # weight_n o psi
        np.asarray(windowed[3]), np.asarray(exact[3]), atol=0
    )


def test_sharded_window_no_all_gather():
    """The windowed sharded solve must never materialise a full volume per
    device (VERDICT item 4): its compiled HLO contains NO all-gather — every
    full-volume replication (live warp source, inverse displacement, tail
    warps) is replaced by neighbour halo exchange. The exact-gather mode
    keeps its 5 all-gathers (live, psi, tsdf_g, weight_g, weight_n)."""
    mesh = make_mesh(n_z=8)
    dims = (128, 64, 64)
    psi = jax.ShapeDtypeStruct((3,) + dims, jnp.float32)
    vol = jax.ShapeDtypeStruct(dims, jnp.float32)
    f32 = jax.ShapeDtypeStruct((), jnp.float32)
    i32 = jax.ShapeDtypeStruct((), jnp.int32)
    taps = jax.ShapeDtypeStruct((7,), jnp.float32)
    args = (psi, vol, vol, vol, vol, taps, f32, f32, i32, f32)

    hlo_window = (
        make_sharded_estimate_psi(mesh, inverse_iters=8, warp_window=4)
        .lower(*args).compile().as_text()
    )
    hlo_exact = (
        make_sharded_estimate_psi(mesh, inverse_iters=8)
        .lower(*args).compile().as_text()
    )
    assert hlo_window.count("all-gather") == 0, hlo_window.count("all-gather")
    assert hlo_exact.count("all-gather") == 5


def test_frame_step_with_window_warp():
    mesh = make_mesh(n_z=4, n_scene=2)
    dims_zyx = (16, 16, 16)
    step, shardings = make_frame_step(
        mesh, dims_zyx, inverse_iters=2, warp_window=2
    )
    S = 2
    vs = 0.25 / 16
    psi_b = jax.device_put(
        jnp.broadcast_to(fields.identity_field(dims_zyx)[None], (S, 3) + dims_zyx),
        shardings["psi"],
    )
    ones = jax.device_put(jnp.ones((S,) + dims_zyx, jnp.float32), shardings["vol"])
    dists_b = jax.device_put(
        jnp.full((S, 24, 32), 0.5, jnp.float32), shardings["img"])
    vol2cam = np.eye(4, dtype=np.float32)
    vol2cam[:3, 3] = (-0.125, -0.125, 0.2)
    v2c_b = jnp.broadcast_to(jnp.asarray(vol2cam)[None], (S, 4, 4))
    taps = jnp.asarray(solver.sobolev_filter_1d(7, 0.1))
    out = step(
        psi_b, ones, ones, dists_b, v2c_b,
        jnp.asarray([20.0, 20.0, 16.0, 12.0], jnp.float32),
        jnp.asarray([vs, vs, vs], jnp.float32),
        jnp.float32(10 * vs), jnp.float32(2 * vs), jnp.float32(64.0),
        taps, jnp.float32(0.05), jnp.float32(0.2),
        jnp.int32(2), jnp.float32(-1.0),
    )
    assert bool(jnp.all(jnp.isfinite(out[2])))


def test_sharded_fused_kernel_matches_window_solve():
    """Per-shard fused Pallas iterations (ICI-halo-fed, interpret mode on
    the CPU mesh) == the sharded XLA window solve == the single-device
    window solve."""
    tg, wg, tn, wn = _scene(1.5 * SIZE / DIM)
    taps = jnp.asarray(solver.sobolev_filter_1d(7, 0.1))
    taps_static = tuple(float(t) for t in np.asarray(taps))
    psi = fields.identity_field((DIM, DIM, DIM))
    args = (jnp.float32(0.1), jnp.float32(0.4), jnp.int32(12), jnp.float32(-1.0))

    ref = solver.estimate_psi(
        psi, tg, wg, tn, wn, taps, *args, inverse_iters=4, warp_window=2
    )

    mesh = make_mesh(n_z=4)  # local depth 8 = one BZ tile per shard
    fn = make_sharded_estimate_psi(
        mesh, inverse_iters=4, warp_window=2, fused=True,
        taps_static=taps_static,
    )
    psi_s, psi_inv_s, tnp_s, _, _, _, iters_s, mn_s = fn(
        psi, tg, wg, tn, wn, taps, *args
    )
    assert int(iters_s) == 12
    np.testing.assert_allclose(
        np.asarray(psi_s), np.asarray(ref.psi), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(tnp_s), np.asarray(ref.tsdf_n_psi), atol=2e-5
    )
    np.testing.assert_allclose(
        float(mn_s), float(ref.max_norm), rtol=1e-4
    )


def test_sharded_production_config_matches_single_chip():
    """The PRODUCTION multi-chip configuration — momentum + warm inverse +
    per-shard fused Pallas iterations (interpret mode on the CPU mesh) —
    matches the single-chip production solve (VERDICT r2 item 4: the
    sharded path previously supported plain GD only)."""
    tg, wg, tn, wn = _scene(1.5 * SIZE / DIM)
    taps = jnp.asarray(solver.sobolev_filter_1d(7, 0.1))
    taps_static = tuple(float(t) for t in np.asarray(taps))
    psi = fields.identity_field((DIM, DIM, DIM))
    args = (jnp.float32(0.1), jnp.float32(0.4), jnp.int32(12), jnp.float32(-1.0))

    ref = solver.estimate_psi(
        psi, tg, wg, tn, wn, taps, *args, inverse_iters=48, warp_window=2,
        momentum=0.9,
    )

    mesh = make_mesh(n_z=4)
    fn = make_sharded_estimate_psi(
        mesh, inverse_iters=12, warp_window=2, fused=True,
        taps_static=taps_static, momentum=0.9, warm_inverse=True,
    )
    # warm-start from the reference inverse: 12 iterations must stay at the
    # cold-48 fixed point
    psi_s, psi_inv_s, tnp_s, _, _, _, iters_s, mn_s = fn(
        psi, tg, wg, tn, wn, taps, *args, ref.psi_inv
    )
    assert int(iters_s) == 12
    np.testing.assert_allclose(np.asarray(psi_s), np.asarray(ref.psi), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(tnp_s), np.asarray(ref.tsdf_n_psi), atol=2e-5
    )
    np.testing.assert_allclose(float(mn_s), float(ref.max_norm), rtol=1e-4)
    assert float(jnp.max(jnp.abs(psi_inv_s - ref.psi_inv))) <= 0.05


def test_sharded_momentum_matches_single_chip_xla():
    """Sharded XLA window step with momentum == single-chip momentum solve."""
    tg, wg, tn, wn = _scene(1.5 * SIZE / DIM)
    taps = jnp.asarray(solver.sobolev_filter_1d(7, 0.1))
    psi = fields.identity_field((DIM, DIM, DIM))
    args = (jnp.float32(0.1), jnp.float32(0.4), jnp.int32(10), jnp.float32(-1.0))

    ref = solver.estimate_psi(
        psi, tg, wg, tn, wn, taps, *args, inverse_iters=4, warp_window=3,
        momentum=0.85,
    )
    mesh = make_mesh(n_z=8)
    fn = make_sharded_estimate_psi(
        mesh, inverse_iters=4, warp_window=3, momentum=0.85
    )
    psi_s, _, tnp_s, _, _, _, iters_s, mn_s = fn(
        psi, tg, wg, tn, wn, taps, *args
    )
    assert int(iters_s) == 10
    np.testing.assert_allclose(np.asarray(psi_s), np.asarray(ref.psi), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(tnp_s), np.asarray(ref.tsdf_n_psi), atol=1e-5
    )
    np.testing.assert_allclose(float(mn_s), float(ref.max_norm), rtol=1e-4)


def test_sharded_pyramid_reaches_oracle_energy():
    """Coarse-to-fine on the sharded solve: with a small fine-level budget,
    pyramid warm-starting must reach at least the energy of the plain
    sharded solve given the same fine budget (mirror of the single-chip
    pyramid oracle test)."""
    tg, wg, tn, wn = _scene(2.0 * SIZE / DIM)
    taps = jnp.asarray(solver.sobolev_filter_1d(7, 0.1))
    psi = fields.identity_field((DIM, DIM, DIM))
    fine_budget = jnp.int32(24)
    args = (jnp.float32(0.1), jnp.float32(0.3), fine_budget, jnp.float32(-1.0))

    mesh = make_mesh(n_z=4)
    plain = make_sharded_estimate_psi(
        mesh, inverse_iters=2, warp_window=3, momentum=0.9
    )(psi, tg, wg, tn, wn, taps, *args)
    pyr = make_sharded_estimate_psi(
        mesh, inverse_iters=2, warp_window=3, momentum=0.9,
        pyramid_levels=2, coarse_max_iter=48,
    )(psi, tg, wg, tn, wn, taps, *args)

    e_plain = float(solver.data_energy(tg, plain[2]))
    e_pyr = float(solver.data_energy(tg, pyr[2]))
    assert e_pyr <= e_plain * 1.05, (e_pyr, e_plain)
    assert not np.isnan(np.asarray(pyr[0])).any()


def test_sharded_pyramid_seam_cost_bounded():
    """The per-shard edge-extension upsample (_upsample2_disp_local) has
    z-SEAMS between shards; the VERDICT r3 concern is that seams degrade
    the fine level's warm start. Quantified here: with identical coarse
    budgets and thresholds, the sharded pyramid's fine level must reach
    the convergence threshold within a small number of extra iterations
    of the single-chip pyramid's (whose upsample sees the whole volume),
    and reach the same energy."""
    tg, wg, tn, wn = _scene(2.0 * SIZE / DIM)
    taps = jnp.asarray(solver.sobolev_filter_1d(7, 0.1))
    psi = fields.identity_field((DIM, DIM, DIM))
    coarse_cap = 12
    thresh = jnp.float32(2e-3)
    args = (jnp.float32(0.1), jnp.float32(0.3), jnp.int32(256), thresh)

    # single-chip pyramid with the SAME coarse semantics as the sharded
    # warm start (fixed coarse budget, default 0.5 threshold schedule —
    # the sharded warm start applies the same schedule)
    ref = solver.estimate_psi_pyramid(
        psi, tg, wg, tn, wn, taps, *args,
        levels=2, coarse_max_iter=coarse_cap,
        warp_window=3, momentum=0.9, inverse_iters=2,
    )
    mesh = make_mesh(n_z=4)
    shd = make_sharded_estimate_psi(
        mesh, inverse_iters=2, warp_window=3, momentum=0.9,
        pyramid_levels=2, coarse_max_iter=coarse_cap,
    )(psi, tg, wg, tn, wn, taps, *args)

    it_ref, it_shd = int(ref.iters), int(shd[6])
    assert it_shd < 256 + coarse_cap, "sharded fine level never converged"
    # coarse budgets are identical (both capped), so the total-iteration
    # difference is the fine level's — the seam may cost a few extra
    # fine iterations but must not change the convergence regime
    assert abs(it_shd - it_ref) <= max(4, int(0.15 * it_ref)), (
        it_shd, it_ref,
    )
    e_ref = float(solver.data_energy(tg, ref.tsdf_n_psi))
    e_shd = float(solver.data_energy(tg, shd[2]))
    assert e_shd <= e_ref * 1.05 + 1e-6, (e_shd, e_ref)


def test_sharded_512_lowering_no_all_gather():
    """512^3 is the multi-chip regime (BASELINE config 4: hat/umbrella).
    The windowed production solve must LOWER at (512,512,512) over an
    8-way z-mesh with no all-gather in the stablehlo — per-device memory
    stays at block + halo (lowering-only: compiling 512^3 CPU code is not
    CI-viable, the sharding/collective structure is what's asserted)."""
    mesh = make_mesh(n_z=8)
    dims = (512, 512, 512)
    psi = jax.ShapeDtypeStruct((3,) + dims, jnp.float32)
    vol = jax.ShapeDtypeStruct(dims, jnp.float32)
    f32 = jax.ShapeDtypeStruct((), jnp.float32)
    i32 = jax.ShapeDtypeStruct((), jnp.int32)
    taps = jax.ShapeDtypeStruct((7,), jnp.float32)
    args = (psi, vol, vol, vol, vol, taps, f32, f32, i32, f32, psi)

    lowered = make_sharded_estimate_psi(
        mesh, inverse_iters=12, warp_window=2, momentum=0.9,
        warm_inverse=True,
    ).lower(*args)
    txt = lowered.as_text()
    assert "all_gather" not in txt and "all-gather" not in txt
    # halo exchange is present (collective_permute is how ppermute lowers)
    assert "collective_permute" in txt

    # ---- halo-exchange COST MODEL (VERDICT r3 item 5) ----
    # every collective_permute operand must be an O(halo) z-slice: its
    # z-extent (3rd-from-last dim) <= max(stencil+conv halo 4, window K=2),
    # never the 64-row local block — the communicated bytes per exchange
    # are then bounded by halo/block = 4/64 of the state, independent of
    # grid size. Sum the per-iteration loop-body exchange too: one psi(3ch)
    # + one tnp + one dU(3ch) halo pair per iteration at H=4.
    import re

    shapes = [
        m.group(1)
        for ln in txt.splitlines()
        if "collective_permute" in ln
        for m in [re.search(r"\(tensor<([0-9x]+)xf32>\)\s*->", ln)]
        if m
    ]
    assert shapes, "no collective_permute operands parsed"
    halo = 4
    per_msg_bytes = []
    for s in shapes:
        d = [int(v) for v in s.split("x")]
        assert d[-3] <= halo, f"non-halo z-slice exchanged: {d}"
        per_msg_bytes.append(4 * int(np.prod(d)))
    # per-iteration exchange (psi + tnp + dU, 2 directions each) at H=4:
    # (3+1+3) ch * 4 rows * 512 * 512 * 4 B * 2 dirs = ~58.7 MB — vs the
    # 2.1 GB full-state all-gather the exact mode would pay. Assert the
    # LARGEST single message stays at the halo scale.
    assert max(per_msg_bytes) <= 3 * halo * 512 * 512 * 4, max(per_msg_bytes)


def test_sharded_fine_window_matches_single_chip_compositive():
    """Round-3 production parity: the sharded COMPOSITIVE fine level
    (fine_window) — T0 warped once at the total window, increment loop at
    fine_window halos, one composition exchange — matches the single-chip
    estimate_psi_compositive with the same psi0/windows (STATUS r3 gap 4:
    fine_window was single-chip-only)."""
    tg, wg, tn, wn = _scene(1.5 * SIZE / DIM)
    taps = jnp.asarray(solver.sobolev_filter_1d(7, 0.1))
    dims = (DIM, DIM, DIM)
    ident = fields.identity_field(dims)
    # a smooth sub-voxel psi0 (plays the upsampled coarse field)
    zz = jnp.linspace(0.0, np.pi, DIM)
    bump = 0.6 * jnp.sin(zz)[None, :, None, None] * jnp.ones((3,) + dims)
    psi0 = ident + bump
    args = (jnp.float32(0.1), jnp.float32(0.4), jnp.int32(10), jnp.float32(-1.0))

    ref = solver.estimate_psi_compositive(
        psi0, tg, wg, tn, wn, taps, *args, None,
        inverse_iters=8, warp_window=1, total_window=2, momentum=0.9,
    )

    mesh = make_mesh(n_z=4)
    fn = make_sharded_estimate_psi(
        mesh, inverse_iters=8, warp_window=2, fine_window=1, momentum=0.9,
    )
    psi_s, psi_inv_s, tnp_s, _, _, _, iters_s, mn_s = fn(
        psi0, tg, wg, tn, wn, taps, *args
    )
    assert int(iters_s) == 10
    np.testing.assert_allclose(np.asarray(psi_s), np.asarray(ref.psi), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(tnp_s), np.asarray(ref.tsdf_n_psi), atol=2e-5
    )
    np.testing.assert_allclose(float(mn_s), float(ref.max_norm), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(psi_inv_s), np.asarray(ref.psi_inv), atol=1e-3
    )


def test_sharded_fine_window_fused_matches_xla():
    """The fused per-shard kernel on the compositive fine level (interpret
    mode on the CPU mesh) == the sharded XLA fine_window solve."""
    tg, wg, tn, wn = _scene(1.5 * SIZE / DIM)
    taps = jnp.asarray(solver.sobolev_filter_1d(7, 0.1))
    taps_static = tuple(float(t) for t in np.asarray(taps))
    psi = fields.identity_field((DIM, DIM, DIM))
    args = (jnp.float32(0.1), jnp.float32(0.4), jnp.int32(8), jnp.float32(-1.0))

    mesh = make_mesh(n_z=4)
    xla = make_sharded_estimate_psi(
        mesh, inverse_iters=4, warp_window=2, fine_window=1, momentum=0.9,
    )(psi, tg, wg, tn, wn, taps, *args)
    fus = make_sharded_estimate_psi(
        mesh, inverse_iters=4, warp_window=2, fine_window=1, momentum=0.9,
        fused=True, taps_static=taps_static,
    )(psi, tg, wg, tn, wn, taps, *args)

    np.testing.assert_allclose(
        np.asarray(fus[0]), np.asarray(xla[0]), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(fus[2]), np.asarray(xla[2]), atol=2e-5
    )


def test_sharded_stall_stop_matches_single_chip():
    """The sharded data-energy stall stop fires at the same iteration as the
    single-chip solver's (identical energy + checkpoint semantics; the psum
    makes the energy global, so every shard stops together)."""
    tg, wg, tn, wn = _scene(1.0 * SIZE / DIM)
    taps = jnp.asarray(solver.sobolev_filter_1d(7, 0.1))
    psi = fields.identity_field((DIM, DIM, DIM))
    # generous rel threshold so the stall (not the cap/norm) is the stop
    args = (jnp.float32(0.1), jnp.float32(0.4), jnp.int32(64), jnp.float32(-1.0))

    ref = solver.estimate_psi(
        psi, tg, wg, tn, wn, taps, *args, inverse_iters=2, warp_window=2,
        momentum=0.9, stall_window=4, stall_rel=0.5,
    )
    mesh = make_mesh(n_z=4)
    fn = make_sharded_estimate_psi(
        mesh, inverse_iters=2, warp_window=2, momentum=0.9,
        stall_window=4, stall_rel=0.5,
    )
    out = fn(psi, tg, wg, tn, wn, taps, *args)
    assert int(out[6]) < 64, "stall stop never fired"
    assert int(out[6]) == int(ref.iters), (int(out[6]), int(ref.iters))


def test_frame_step_production_round3_config():
    """The FULL round-3 production configuration — pyramid + compositive
    fine level + momentum + warm inverse + stall net + fused per-shard
    kernels — compiles and runs multi-chip through make_frame_step."""
    taps = jnp.asarray(solver.sobolev_filter_1d(7, 0.1))
    taps_static = tuple(float(t) for t in np.asarray(taps))
    mesh = make_mesh(n_z=4, n_scene=2)
    dims_zyx = (32, 16, 16)
    S = 2
    vs = SIZE / 32
    step, shardings = make_frame_step(
        mesh, dims_zyx, inverse_iters=4, warp_window=2, fused=True,
        taps_static=taps_static, momentum=0.95, warm_inverse=True,
        pyramid_levels=2, fine_window=1, stall_window=8, stall_rel=1e-2,
    )
    psi1 = fields.identity_field(dims_zyx)
    psi_b = jnp.broadcast_to(psi1[None], (S,) + psi1.shape)
    tg_b = jnp.ones((S,) + dims_zyx, jnp.float32)
    wg_b = jnp.ones((S,) + dims_zyx, jnp.float32)
    H, W = 24, 32
    dists_b = jnp.full((S, H, W), 0.5, jnp.float32)
    vol2cam = np.eye(4, dtype=np.float32)
    vol2cam[:3, 3] = (-SIZE / 2, -SIZE / 2, 0.2)
    vol2cam_b = jnp.broadcast_to(jnp.asarray(vol2cam)[None], (S, 4, 4))
    out = step(
        psi_b, tg_b, wg_b, dists_b, vol2cam_b,
        jnp.asarray([20.0, 20.0, W / 2, H / 2], jnp.float32),
        jnp.asarray([vs, vs, vs], jnp.float32),
        jnp.float32(10 * vs), jnp.float32(2 * vs), jnp.float32(64.0),
        taps, jnp.float32(0.05), jnp.float32(0.2),
        jnp.int32(3), jnp.float32(1e-8), psi_b,
    )
    psi_out, psi_inv_out, tg_out, wg_out, iters, mnorm = out
    assert psi_out.shape == (S, 3) + dims_zyx
    assert np.isfinite(np.asarray(tg_out)).all()
    assert np.isfinite(np.asarray(psi_out)).all()
    # the flat synthetic scene can converge in 1 iteration per level; the
    # point here is that the full production config compiles + runs
    assert int(np.asarray(iters)[0]) >= 2  # >= 1 coarse + 1 fine


def _scene_x64(shift):
    """Non-cubic scene with X=64 (the Y-fold dispatch width)."""
    dims = (16, 16, 64)
    vs = SIZE / 64
    trunc, eta = 10 * vs, 2 * vs
    c = (32 * vs, 8 * vs, 8 * vs)  # centre (x, y, z) in metric units
    tg, wg = init_sphere(dims, (vs, vs, vs), c, 6 * vs, trunc, eta)
    tn, wn = init_sphere(
        dims, (vs, vs, vs), (c[0] - shift, c[1], c[2]), 6 * vs, trunc, eta
    )
    return dims, tg, wg, tn, wn


def test_sharded_fold_kernel_matches_single_chip():
    """X=64 shards auto-dispatch the Y-FOLDED fused kernel (ICI-halo-fed,
    z_base/z_global global-coordinate masks, interpret mode on the CPU
    mesh): matches the single-chip XLA window solve exactly (VERDICT r3
    item 5 — X=64 shards previously fell back to the lane-padded kernel)."""
    dims, tg, wg, tn, wn = _scene_x64(1.5 * SIZE / 64)
    taps = jnp.asarray(solver.sobolev_filter_1d(7, 0.1))
    taps_static = tuple(float(t) for t in np.asarray(taps))
    psi = fields.identity_field(dims)
    args = (jnp.float32(0.1), jnp.float32(0.4), jnp.int32(10), jnp.float32(-1.0))

    ref = solver.estimate_psi(
        psi, tg, wg, tn, wn, taps, *args, inverse_iters=4, warp_window=2,
        momentum=0.9,
    )

    mesh = make_mesh(n_z=2)  # local depth 8: fold needs Zl % 8 == 0
    fn = make_sharded_estimate_psi(
        mesh, inverse_iters=4, warp_window=2, fused=True,
        taps_static=taps_static, momentum=0.9,
    )
    psi_s, psi_inv_s, tnp_s, _, _, _, iters_s, mn_s = fn(
        psi, tg, wg, tn, wn, taps, *args
    )
    assert int(iters_s) == 10
    np.testing.assert_allclose(np.asarray(psi_s), np.asarray(ref.psi), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(tnp_s), np.asarray(ref.tsdf_n_psi), atol=2e-5
    )
    np.testing.assert_allclose(float(mn_s), float(ref.max_norm), rtol=1e-4)


def test_sharded_fold_fine_window_matches_xla():
    """The fold kernel on the sharded compositive fine level (X=64) == the
    sharded XLA fine_window solve, stall stop included."""
    dims, tg, wg, tn, wn = _scene_x64(1.0 * SIZE / 64)
    taps = jnp.asarray(solver.sobolev_filter_1d(7, 0.1))
    taps_static = tuple(float(t) for t in np.asarray(taps))
    psi = fields.identity_field(dims)
    args = (jnp.float32(0.1), jnp.float32(0.4), jnp.int32(8), jnp.float32(-1.0))

    mesh = make_mesh(n_z=2)
    xla = make_sharded_estimate_psi(
        mesh, inverse_iters=4, warp_window=2, fine_window=1, momentum=0.9,
        stall_window=4, stall_rel=1e-3,
    )(psi, tg, wg, tn, wn, taps, *args)
    fus = make_sharded_estimate_psi(
        mesh, inverse_iters=4, warp_window=2, fine_window=1, momentum=0.9,
        stall_window=4, stall_rel=1e-3, fused=True, taps_static=taps_static,
    )(psi, tg, wg, tn, wn, taps, *args)

    assert int(fus[6]) == int(xla[6])
    np.testing.assert_allclose(np.asarray(fus[0]), np.asarray(xla[0]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(fus[2]), np.asarray(xla[2]), atol=2e-5)


@pytest.mark.slow
@pytest.mark.skipif(
    os.environ.get("SOBFU_BIG_TESTS") != "1",
    reason="512^3 execution needs ~40 GB RAM and ~20 min on one core; "
    "opt in with SOBFU_BIG_TESTS=1 (run + recorded in BENCHLOG round 5)",
)
def test_sharded_512_executes_one_iteration():
    """BASELINE config 4 scale, EXECUTED (round-4 VERDICT item 5): one real
    iteration of the production windowed+momentum sharded solve at
    (512,512,512) over the 8-way z-mesh — not just lowered. Executed
    2026-08-19 on the CI-class host: 1119 s wall (shared core),
    max_norm 9.05e-3, max |dpsi| 9.05e-3, all finite. Correctness of the
    sharded math at this config is covered by the 64^3 single-chip parity
    (dryrun + test_sharded_production_config_matches_single_chip); this
    test proves the 512^3 program EXECUTES within per-device memory."""
    from sobfu_tpu.tsdf import init_sphere as _sph

    dim = 512
    vs = 1.0 / dim
    dims = (dim,) * 3
    tg, wg = _sph(dims, (vs,) * 3, (0.5, 0.5, 0.5), 0.20, 8 * vs, 3 * vs)
    tn, wn = _sph(
        dims, (vs,) * 3, (0.5 - 1.3 * vs, 0.5, 0.5), 0.205, 8 * vs, 3 * vs
    )
    taps = jnp.asarray(solver.sobolev_filter_1d(7, 0.1))
    psi = fields.identity_field(dims)
    fn = make_sharded_estimate_psi(
        make_mesh(n_z=8), inverse_iters=1, warp_window=2, momentum=0.9
    )
    out = fn(
        psi, tg, wg, tn, wn, taps,
        jnp.float32(0.05), jnp.float32(0.2), jnp.int32(1), jnp.float32(-1.0),
    )
    psi_s, iters, mn = out[0], out[6], out[7]
    assert int(iters) == 1
    assert np.isfinite(float(mn)) and float(mn) > 0
    moved = float(jnp.max(jnp.abs(psi_s - psi)))
    assert 1e-5 < moved < 1.0, moved
    assert bool(jnp.all(jnp.isfinite(psi_s)))
