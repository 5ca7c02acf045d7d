"""Test config: run everything on CPU with 8 virtual devices.

The reference test suite required a physical CUDA GPU
(/root/reference/test/CMakeLists.txt); the JAX rebuild runs the identical
math on any backend, so CI tests use the CPU backend with a virtual
8-device mesh to also exercise the sharded multi-chip paths.
"""

import os

# Force CPU: the test suite must not touch the (single, shared) TPU tunnel.
# The harness exports JAX_PLATFORMS=axon globally, so a hard override is
# required, not setdefault. PALLAS_AXON_POOL_IPS must also be scrubbed:
# sitecustomize re-registers the axon TPU plugin whenever it is set, which
# would route the whole suite through the shared single-client tunnel.
# Escape hatch: SOBFU_TPU_TESTS=1 keeps the real backend so the
# hardware-validation lane (tests/test_tpu_hw.py) can run on a TPU host.
if os.environ.get("SOBFU_TPU_TESTS") != "1":
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# sitecustomize imports jax at interpreter startup (axon plugin
# registration), so jax's env snapshot predates this file — the env vars
# above are NOT enough on their own. Backends initialise lazily, so
# updating the live config here still wins as long as no array op ran yet.
import jax  # noqa: E402

if os.environ.get("SOBFU_TPU_TESTS") != "1":
    jax.config.update("jax_platforms", "cpu")
    assert jax.default_backend() == "cpu", (
        "test suite must not run on the shared TPU tunnel; got "
        + jax.default_backend()
    )

import pytest  # noqa: E402

# ---------------------------------------------------------------------------
# CI quick lane: tests measured >= ~6 s on the CI-class host (full-suite
# --durations run, round 4) get the `slow` marker here, centrally, so the
# marker list stays in one place instead of 45 decorators. Quick lane:
#   python -m pytest tests/ -m "not slow"     (~4 min)
# Full suite (~22 min) stays the merge gate; keys are bare test names
# (parametrised variants inherit the marker via originalname).
# ---------------------------------------------------------------------------
_SLOW = {
    # test_solver.py
    "test_auto_chunking_dispatch",
    "test_conv_mxu_matches_slice_sum",
    "test_auto_chunked_verbose_prints_energies",
    "test_chunked_solve_matches_monolithic_window",
    "test_chunked_momentum_matches_monolithic",
    "test_chunked_inverse_warm_start_matches_cold_48",
    "test_compositive_chunked_matches_monolithic",
    "test_chunked_energy_history_matches_monolithic",
    "test_pyramid_reaches_oracle_energy_with_fewer_fine_iters",
    "test_compositive_total_window_matches_exact_tails",
    "test_pyramid_whole_frame_jit_matches_eager",
    "test_inverse_warm_start_matches_cold_48",
    "test_compositive_incremental_inverse_tracks_exact",
    # test_golden.py
    "test_chunked_solver_matches_golden",
    "test_pyramid_solver_matches_golden",
    "test_fused_interpret_matches_window_golden",
    "test_window_solver_matches_golden",
    "test_compositive_solver_matches_golden",
    # test_pallas.py
    "test_estimate_psi_fold_full_solve",
    "test_multi_fold_matches_chained_single",
    "test_estimate_psi_inner_steps_matches_single_step",
    "test_fold_iteration_matches_xla",
    "test_fused_gd_step_small_taps",
    "test_fused_gd_step_matches_xla",
    "test_stall_detector_fused_pp_matches_xla",
    "test_pp_with_energy_matches_data_energy",
    "test_compositive_fold_matches_xla",
    "test_compositive_fused_matches_xla",
    "test_inverse_multigrid_matches_cold",
    "test_inverse_multigrid_production_scale",
    "test_estimate_psi_pingpong_full_solve",
    "test_fused_db_lane_packed_matches_xla",
    "test_estimate_psi_lane_packed_full_solve",
    "test_fused_db_iteration_matches_xla",
    "test_estimate_psi_fused_db_full_solve",
    "test_inverse_multi_kernel_matches_xla",
    "test_window_warp_pallas_matches_xla",
    # test_sharding.py
    "test_sharded_pyramid_reaches_oracle_energy",
    "test_sharded_window_no_all_gather",
    "test_sharded_window_warp_matches_exact",
    "test_sharded_fine_window_fused_matches_xla",
    "test_sharded_momentum_matches_single_chip_xla",
    "test_frame_step_production_round3_config",
    "test_sharded_stall_stop_matches_single_chip",
    "test_sharded_fused_kernel_matches_window_solve",
    "test_sharded_fine_window_matches_single_chip_compositive",
    "test_sharded_production_config_matches_single_chip",
    "test_sharded_fold_kernel_matches_single_chip",
    "test_sharded_fold_fine_window_matches_xla",
    "test_sharded_pyramid_seam_cost_bounded",
    "test_frame_step_with_window_warp",
    # test_mc.py
    "test_mc_capacity_clamp",
    "test_mc_zero_weight_gates_triangles",
    "test_mc_empty_volume_yields_no_triangles",
    # test_fields.py
    "test_zoffset_samplers_match_plain_window",
    "test_estimate_inverse_window_matches_exact",
    # test_pipeline.py
    "test_pipeline_compositive_mode",
    "test_compositive_tracks_unbounded_drift",
    "test_checkpoint_resume_equivalence",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        name = getattr(item, "originalname", None) or item.name
        if name in _SLOW:
            item.add_marker(pytest.mark.slow)
