"""Headline benchmark: Sobolev warp-field solver throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Baseline derivation (BASELINE.md): the reference README reports "~2 fps" for
sample reconstructions (README.md:33). Its shipped scene configs run
MAX_ITER = 2048-8192 solver iterations per frame at 64^3-128^3; each
iteration launches ~10 full-volume kernels plus one device->host sync
(SURVEY.md §3.2). On the sm_61-class hardware the reference targets
(~320 GB/s), 2 fps is only physically reachable at the 64^3 scale
(128^3 x 2048 iters x ~84 MB/iter would need >600 GB/s of effective
bandwidth). The apples-to-apples throughput unit is voxel-iterations/s:

    baseline = 2 fps * 2048 iters * 64^3 voxels = 1.07e9 voxel-iters/s

We time the full jitted gradient-descent solve (stencils + Sobolev
convolutions + trilinear re-warp + on-device convergence norm) at 128^3 —
8x the voxel count of the baseline workload — using the gather-free
bounded-window warp (fields.sample_trilinear_window), and report the ratio.

Timing notes: on the tunneled TPU backend, block_until_ready can return
before execution completes, so every measurement materialises a scalar
(forcing a device round-trip) and per-iteration cost is derived from the
difference between two iteration counts (loop scaling), median of 3.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_VOXEL_ITERS_PER_SEC = 2.0 * 2048 * 64**3  # ~1.07e9 (see docstring)

# HBM roofline model (round-4 VERDICT item 7): achieved bytes/s as % of the
# chip's HBM peak, from a per-iteration traffic model of the hot loop. Peak
# by device kind; v5e (the BASELINE target chip) = 819 GB/s.
HBM_PEAK_GBPS = {
    "TPU v4": 1228.0,
    "TPU v5e": 819.0,
    "TPU v5 lite": 819.0,
    "TPU v5p": 2765.0,
    "TPU v6e": 1640.0,
}


def _hbm_peak_gbps() -> float:
    kind = getattr(jax.devices()[0], "device_kind", "")
    for k, v in HBM_PEAK_GBPS.items():
        if k.lower() in str(kind).lower():
            return v
    return 819.0  # BASELINE target chip (v5e) as the conservative default


def fused_loop_bytes_per_iter(dim: int, momentum: bool = True) -> int:
    """HBM traffic model of ONE fused GD iteration (fused_gd_iteration_db /
    _fold): each array crosses HBM exactly once per iteration (the kernel
    is a single pass; VMEM tiles re-use the halos).

      reads : psi state 3xf32, velocity 3xf32 (momentum), phi_global 1xf32,
              live volume 1xf32 (windowed warp reads ~1x + halo overhead,
              not modelled)
      writes: psi 3xf32, velocity 3xf32, tsdf_n_psi 1xf32

    = 60 B/voxel-iteration with momentum, 36 without.
    """
    ch = (3 + 3 + 1 + 1) + (3 + 3 + 1) if momentum else (3 + 1 + 1) + (3 + 1)
    return ch * 4 * dim**3


def zscan_bytes_per_iter(dim: int) -> int:
    """Traffic model of one z-slab-scan iteration (estimate_psi_zscan):
    psi 3xf32 read + write, phi_global + live bf16 reads, tsdf_n_psi f32
    write = 32 B/voxel-iteration."""
    return (12 + 12 + 2 + 2 + 4) * dim**3


def solve_time_per_iter(
    dim: int, warp_window: int, n_lo: int, n_hi: int, n_chunks: int = 0,
    conv_mxu: bool = False, fused: bool = False, x_pad: int = 0,
    inner: int = 0, fold_xmats: bool = False,
) -> float:
    """Median per-iteration seconds of the full solve via loop scaling."""
    import numpy as _np

    from sobfu_tpu import fields, solver
    from sobfu_tpu.tsdf import init_sphere

    size = 1.0
    vs = size / dim
    trunc, eta = 8.0 * vs, 3.0 * vs
    dims = (dim, dim, dim)

    tg, wg = init_sphere(dims, (vs, vs, vs), (0.5, 0.5, 0.5), 0.2, trunc, eta)
    tn, wn = init_sphere(dims, (vs, vs, vs), (0.49, 0.5, 0.5), 0.2, trunc, eta)
    taps = jnp.asarray(solver.sobolev_filter_1d(7, 0.1))
    taps_static = tuple(float(t) for t in _np.asarray(taps))

    def run(iters: int) -> float:
        psi = fields.identity_field(dims)
        common = (
            psi, tg, wg, tn, wn, taps,
            jnp.float32(0.05), jnp.float32(0.2),
            jnp.int32(iters), jnp.float32(-1.0),  # never converge early
        )
        if fused:
            res = solver.estimate_psi(
                *common, inverse_iters=4, warp_window=warp_window,
                fused_db=True, taps_static=taps_static, x_pad_to=x_pad,
                inner_steps=inner, fold_xmats=fold_xmats,
            )
        elif n_chunks:
            res = solver.estimate_psi_chunked(
                *common, n_chunks=n_chunks, warp_window=warp_window,
                inverse_iters=4, conv_mxu=conv_mxu,
            )
        else:
            res = solver.estimate_psi(
                *common, inverse_iters=4, warp_window=warp_window,
                conv_mxu=conv_mxu,
            )
        # materialise scalars: forces completion AND surfaces device faults
        mn = float(res.max_norm)
        assert np.isfinite(mn), "solver produced non-finite update norm"
        assert int(res.iters) == iters
        return mn

    run(n_lo)  # compile + warm
    run(n_hi)
    # the tunneled pool chip shows ±3x contention swings and sporadic
    # multi-second stalls. UNBIASED loop scaling: take the minimum over
    # repeats of each size SEPARATELY, then difference the minima — each
    # minimum approximates the uncontended run, while differencing within
    # a pair biases LOW whenever a stall lands in the short run.
    t_lo_min = t_hi_min = float("inf")
    for _ in range(14):
        t0 = time.perf_counter()
        run(n_lo)
        t_lo_min = min(t_lo_min, time.perf_counter() - t0)
        t0 = time.perf_counter()
        run(n_hi)
        t_hi_min = min(t_hi_min, time.perf_counter() - t0)
    return float((t_hi_min - t_lo_min) / (n_hi - n_lo))


def window1_exact_diff_vox(
    dim: int, iters: int = 512, fold_xmats: bool = False
) -> float:
    """max |psi_K1 - psi_K2| in voxels after ``iters`` plain-GD iterations
    on the headline scene, PLUS the runtime window-guard margin
    (solver.window_guard_margin) that generalises the exactness argument
    to arbitrary scenes: a production loop solves at K=1, checks the
    margin each frame (one reduction, amortised over 2048 iterations),
    and redoes the frame at K=2 iff the margin drops below the
    conservative 0.5-voxel threshold (see solver.window_guard_margin:
    clamp-limited solves end with SMALL positive margins). The K=1 headline row is recorded only
    when this scene's diff is ~0 AND its guard margin is positive."""
    import numpy as _np

    from sobfu_tpu import fields, solver
    from sobfu_tpu.tsdf import init_sphere

    vs = 1.0 / dim
    dims = (dim, dim, dim)
    tg, wg = init_sphere(dims, (vs,) * 3, (0.5, 0.5, 0.5), 0.2,
                         8 * vs, 3 * vs)
    tn, wn = init_sphere(dims, (vs,) * 3, (0.49, 0.5, 0.5), 0.2,
                         8 * vs, 3 * vs)
    taps = jnp.asarray(solver.sobolev_filter_1d(7, 0.1))
    ts = tuple(float(t) for t in _np.asarray(taps))
    common = (
        fields.identity_field(dims), tg, wg, tn, wn, taps,
        jnp.float32(0.05), jnp.float32(0.2),
        jnp.int32(iters), jnp.float32(-1.0),
    )
    r1 = solver.estimate_psi(
        *common, inverse_iters=4, warp_window=1,
        fused_db=True, taps_static=ts, inner_steps=16,
        fold_xmats=fold_xmats,
    )
    r2 = solver.estimate_psi(
        *common, inverse_iters=4, warp_window=2,
        fused_db=True, taps_static=ts, inner_steps=16,
        fold_xmats=fold_xmats,
    )
    margin = float(solver.window_guard_margin(r1.psi, K=1))
    diff = float(jnp.max(jnp.abs(r1.psi - r2.psi)))
    return diff, margin


def fps_at_convergence(dim: int, conv_mxu: bool, with_oracle: bool = True) -> dict:
    """Production-mode solve (momentum 0.9 + windowed warp + MXU convs) run
    to an actual convergence threshold, with plain reference-semantics GD as
    the energy oracle (VERDICT item 3: fps-at-convergence, not only
    fixed-iteration throughput).

    Returns {fps, iters, e_final, e_gd, e_ratio}: e_ratio <= ~1 certifies
    the accelerated mode reaches at least the energy plain GD reaches.
    """
    from sobfu_tpu import fields, solver
    from sobfu_tpu.tsdf import init_sphere

    vs = 1.0 / dim
    dims = (dim, dim, dim)
    trunc, eta = 8.0 * vs, 3.0 * vs
    # translating + expanding sphere: ~1.3 voxel bulk motion
    tg, wg = init_sphere(dims, (vs,) * 3, (0.5, 0.5, 0.5), 0.20, trunc, eta)
    tn, wn = init_sphere(
        dims, (vs,) * 3, (0.5 - 1.3 * vs, 0.5, 0.5), 0.205, trunc, eta
    )
    taps = jnp.asarray(solver.sobolev_filter_1d(7, 0.1))
    taps_static = tuple(float(t) for t in np.asarray(taps))
    # The norm is in VOXEL units — scale by dim/128 so the stopping
    # criterion is the same METRIC accuracy at every resolution. The
    # PRODUCTION stop is 4e-3: the round-3 threshold sweep (BENCHLOG
    # 2026-08-18) shows the data energy is flat from 4e-3 down to 1e-3
    # (e_ratio 0.158 at both, 147 vs 202 iters at 128^3) — the tighter
    # stop only grinds the regulariser. The ORACLE keeps the stricter
    # 1e-3 stop, so certification stays conservative: the accelerated
    # mode with its looser stop must still reach the energy plain GD
    # reaches at the tighter one.
    thresh = jnp.float32(4e-3 * dim / 128.0)
    thresh_oracle = jnp.float32(1e-3 * dim / 128.0)
    cap = jnp.int32(1024)
    fused = conv_mxu and dim % 128 == 0  # conv_mxu flags "on TPU" here
    chunks = 8 if (dim >= 128 and not fused) else 0

    def _run_mom(live, psi_inv0):
        psi = fields.identity_field(dims)
        common = (psi, tg, wg, live, wn, taps, jnp.float32(0.05),
                  jnp.float32(0.2), cap, thresh)
        if fused:
            # THE production mode — the exact per-frame configuration the
            # CLI no-log loop runs and tools/fidelity.py --production
            # certifies; see solver.production_pyramid_kwargs (single
            # source of truth) for the round-4 component rationale
            # (additive fine level, half-res warm multigrid inverse
            # carry, MXU fold x-operators, stall net).
            return solver.estimate_psi_pyramid(
                *common, psi_inv0,
                taps_static=taps_static,
                # round 5: the production frame step floor-warps weight_n
                # inside the fuse pass (ops.pallas_kernels.
                # window_warp_fuse_pallas via skip_weight_warp), so the
                # solve itself no longer performs that tail — the warp's
                # cost is measured where it now lives, in pipeline_fps's
                # full frame. Also cuts ~1 GB of the 512^3 peak.
                skip_weight_warp=True,
                **solver.production_pyramid_kwargs(dim),
            )
        if chunks:
            return solver.estimate_psi_chunked(
                *common, n_chunks=chunks, warp_window=2, momentum=0.9,
                conv_mxu=conv_mxu,
            )
        return solver.estimate_psi(
            *common, psi_inv0, warp_window=2, momentum=0.9,
            conv_mxu=conv_mxu, inverse_iters=4,
        )

    # ONE dispatch per frame, as the production pipeline runs it
    # (pipeline.fused_frame_step jits the whole frame): the pyramid's
    # host-level orchestration (downsamples, per-level solves, upsamples)
    # otherwise pays a host->device round trip PER STAGE — ~15 dispatches
    # at 256^3, which on a tunneled chip is pure overhead. At 512^3 the
    # MONOLITHIC program exceeds the pool compile service's request-size
    # limit (HTTP 413), so the staged orchestration runs instead — its
    # per-level programs each compile, and at ~49 ms/iteration the
    # dispatch overhead is noise.
    run_mom = jax.jit(_run_mom) if dim < 512 else _run_mom

    # steady-state warm start for the inverse tail, as in production: the
    # "previous frame" is a genuinely different scene (half the shift), so
    # its inverse is a realistic — not self-fulfilling — warm start. The
    # same compiled program serves both solves (only inputs differ) —
    # which requires seeding psi_inv0 at its CARRY resolution: with the
    # half-res inverse carry (production inv_coarse) the solve returns
    # psi_inv half-res, and a full-res warm-up seed would trace a SECOND
    # program (pipeline._coarse_inv_carry mirrors this; at 512^3 the two
    # resident executables additionally exceed HBM).
    prev_tn, _ = init_sphere(
        dims, (vs,) * 3, (0.5 - 0.6 * vs, 0.5, 0.5), 0.202, trunc, eta
    )
    inv_dims = dims
    if fused and solver.production_pyramid_kwargs(dim).get("inv_coarse"):
        inv_dims = tuple(d // 2 for d in dims)
    ident = fields.identity_field(inv_dims)
    inv_warm = run_mom(prev_tn, ident).psi_inv
    # async dispatch allocates the NEXT execution's workspace at enqueue
    # time: at 512^3 two in-flight solves (warm-up + steady) double the
    # ~7 GB workspace and OOM the chip — force completion between them
    jax.block_until_ready(inv_warm)
    del ident, prev_tn  # at 512^3 every held 0.5 GB matters

    def run_mom_steady():
        return run_mom(tn, inv_warm)

    res = run_mom_steady()  # compile + warm
    iters = int(res.iters)
    times = []
    for _ in range(4):
        t0 = time.perf_counter()
        res = run_mom_steady()
        _ = float(res.max_norm)
        times.append(time.perf_counter() - t0)
    t_solve = min(times)

    # STEADY-STATE throughput: the per-frame fetch above pays the axon
    # tunnel RTT (~22 ms measured, tools/profile_tails.py) INSIDE every
    # sample — latency a pipelined production loop hides behind the next
    # frame's compute (jax async dispatch). Queue 4 frames back-to-back
    # with ONE trailing sync: total/4 is the per-frame DEVICE time, the
    # honest serving-throughput number. Latency-inclusive fps above is
    # kept as the conservative headline.
    # queue depth 1 at 512^3: overlapping solve workspaces (~7 GB each)
    # do not fit twice; the RTT being hidden is noise at seconds-scale
    # frames anyway
    queue = 4 if dim < 512 else 1
    t_best_pipe = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        rs = [run_mom_steady() for _ in range(queue)]
        _ = float(rs[-1].max_norm)
        t_best_pipe = min(t_best_pipe, (time.perf_counter() - t0) / queue)

    from sobfu_tpu.solver import data_energy
    e_final = float(data_energy(tg, res.tsdf_n_psi))

    out = {
        "fps": round(1.0 / t_solve, 2),
        "fps_steady": round(1.0 / t_best_pipe, 2),
        "iters": iters,
        "e_final": round(e_final, 4),
    }
    if with_oracle:
        # oracle: plain GD (exact reference semantics) to the STRICTER
        # 1e-3 threshold (see thresh_oracle note above)
        psi = fields.identity_field(dims)
        gd = solver.estimate_psi(
            psi, tg, wg, tn, wn, taps, jnp.float32(0.05), jnp.float32(0.2),
            cap, thresh_oracle, warp_window=2, conv_mxu=conv_mxu,
        )
        e_gd = float(data_energy(tg, gd.tsdf_n_psi))
        out.update(
            gd_iters=int(gd.iters),
            e_gd=round(e_gd, 4),
            e_ratio=round(e_final / max(e_gd, 1e-9), 3),
        )
    return out


def pipeline_fps(dim: int, n_frames: int = 6, drift: bool = False) -> dict:
    """END-TO-END pipeline throughput (VERDICT r3 item 2): the full
    SobFusion frame step — depth upload -> bilateral -> dists ->
    integrate -> production solve -> fuse — on an in-memory synthetic
    sphere stream, production no-log configuration (the frame loop of
    /root/reference/src/apps/demo.cpp:285-510 without disk I/O).

    drift=False (additive production mode): the sphere OSCILLATES with
    ~1.1-voxel amplitude, so the ACCUMULATED deformation stays inside the
    K=2 warp window — the additive windowed solve's validity regime.
    drift=True (compositive mode, round-4 VERDICT item 3): the sphere
    translates LINEARLY at ~1.1 voxel/frame, accumulating far beyond the
    window — only the compositive increment solve (exact-gather T0 warp +
    composition, window-bounded increment) handles this regime; the
    reference handles it with arbitrary-magnitude texture-gather warps
    (vector_fields.cu:81-109).

    Steady-state: n_frames queued back-to-back (the pipeline never syncs
    to host mid-frame), one trailing block — the same async-dispatch
    pipelining the CLI's steady-state fps reports.
    """
    import jax.numpy as jnp

    from sobfu_tpu.config import Intr, Params, translation_pose
    from sobfu_tpu.pipeline import SobFusion

    H, W = 240, 320
    intr = Intr(250.0, 250.0, W / 2 - 0.5, H / 2 - 0.5)

    def render(centre, radius=0.08):
        u = np.arange(W, dtype=np.float64)[None, :]
        v = np.arange(H, dtype=np.float64)[:, None]
        dx = np.broadcast_to((u - intr.cx) / intr.fx, (H, W))
        dy = np.broadcast_to((v - intr.cy) / intr.fy, (H, W))
        d = np.stack([dx, dy, np.ones((H, W))], axis=-1)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        c = np.asarray(centre, np.float64)
        b = d @ c
        disc = b * b - (c @ c - radius * radius)
        t = b - np.sqrt(np.maximum(disc, 0.0))
        z = np.where((disc > 0) & (t > 0), t * d[..., 2], 0.0)
        return (z * 1000.0).astype(np.uint16)

    p = Params()
    p.volume_dims = (dim,) * 3
    p.volume_size = (0.4, 0.4, 0.4)
    p.volume_pose = translation_pose((-0.2, -0.2, 0.25))
    p.intr = intr
    vs = 0.4 / dim
    p.tsdf_trunc_dist = 8.0 * vs
    p.eta = 3.0 * vs
    p.start_frame = 1
    p.max_iter = 1024
    p.max_update_norm = 4e-3 * dim / 128.0
    p.alpha = 0.05
    p.w_reg = 0.2
    # the shipped production solver configuration (USAGE.md); CPU smoke
    # runs keep the XLA path (no Mosaic on the CPU backend)
    p.warp_window = 2
    p.fused_pallas = jax.devices()[0].platform != "cpu"
    p.momentum = 0.95
    p.pyramid_levels = 3 if dim >= 256 else 2
    # round 4: ADDITIVE fine level + half-res inverse carry + MXU fold
    # x-ops (solver.production_pyramid_kwargs rationale); Solver derives
    # inv_multigrid / fold_xmats automatically from these keys
    p.fine_window = None
    p.inv_coarse = True
    p.stall_window = 16
    p.stall_rel = 1e-2
    p.inverse_iters = 3
    p.inverse_warm = True
    p.conv_mxu = True
    if drift:
        # unbounded-drift regime: compositive increment solve with the
        # round-5 increment pyramid (coarse warm start on the increment —
        # T0 downsampled, no extra exact gather) + skip_inverse no-log
        # tails; momentum on
        p.solver_mode = "compositive"
        p.inv_coarse = False
        p.momentum = 0.9

    fusion = SobFusion(p)
    fusion.need_inv_warps = False  # no-log loop (CLI default)

    step_m = 1.1 * vs
    if drift:
        # LINEAR drift: accumulated displacement grows ~1.1 vox/frame,
        # exceeding the K=2 window after 2 frames
        centres = [(i * step_m, 0.0, 0.45) for i in range(n_frames + 4)]
    else:
        # OSCILLATION inside the window: x(i) = A sin(i * pi / 4) with
        # A ~ 1.1 voxel — accumulated |psi - id| stays < K=2 forever
        centres = [
            (step_m * np.sin(i * np.pi / 4), 0.0, 0.45)
            for i in range(n_frames + 4)
        ]
    frames = [jnp.asarray(render(c)) for c in centres]
    fusion(frames[0])  # frame 0: integrate only
    fusion(frames[1])  # frame 1: compile + first solve
    import jax as _jax

    from sobfu_tpu.pipeline import fused_frame_step

    _jax.block_until_ready(fusion.phi_global.tsdf)
    # psi_inv is allocated at its carry resolution from frame 0
    # (pipeline._coarse_inv_carry), so frame 1's trace is THE trace: any
    # growth of the jit cache across the timed frames means a
    # mid-measurement recompile poisoned the figure (round-4 VERDICT
    # item 1 — the 0.08 fps artifact). Assert, don't average it away.
    cache0 = fused_frame_step._cache_size()

    t0 = time.perf_counter()
    for f in frames[2 : 2 + n_frames]:
        fusion(f)
    _jax.block_until_ready(fusion.phi_global.tsdf)
    dt = (time.perf_counter() - t0) / n_frames

    # per-frame latency evidence (frame-N time == frame-N+1 time): two
    # individually-synced frames after the queued batch
    frame_ms = []
    for f in frames[2 + n_frames :]:
        t1 = time.perf_counter()
        fusion(f)
        _jax.block_until_ready(fusion.phi_global.tsdf)
        frame_ms.append((time.perf_counter() - t1) * 1e3)

    retraces = fused_frame_step._cache_size() - cache0
    assert retraces == 0, (
        f"fused_frame_step re-traced {retraces}x during timed frames"
    )
    iters = int(fusion.last_solve.iters)
    return {
        "fps": round(1.0 / dt, 2),
        "ms_per_frame": round(dt * 1e3, 1),
        "ms_frame_solo": [round(m, 1) for m in frame_ms],
        "retraces": retraces,
        "iters_last": iters,
        "frames": n_frames,
    }


def _with_retries(fn, attempts=3, cooldown_s=90):
    """The tunneled pool chip sporadically aborts / restarts; retry."""
    for i in range(attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001
            if i == attempts - 1:
                raise
            print(
                f"# bench attempt {i + 1} failed ({str(e)[:120]}); retrying",
                file=sys.stderr,
            )
            time.sleep(cooldown_s)


def measure_rtt_ms(reps: int = 30) -> float:
    """Host<->device round-trip latency of a trivial dispatch+fetch: the
    per-sample overhead every latency-INCLUSIVE fps figure pays on the
    tunneled pool chip, and what a pipelined loop hides (async dispatch).
    Reported so the recorded-vs-steady fps gap is attributable in the
    artifact itself (round-4 VERDICT item 2)."""
    one = jnp.float32(1.0)
    f = jax.jit(lambda x: x + 1.0)
    float(f(one))  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(one))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    platform = jax.devices()[0].platform
    on_tpu = platform != "cpu"
    dim = 128 if on_tpu else 32
    # short pairs: a pool-contention stall inside a pair poisons it, so
    # many ~0.4 s pairs catch an uncontended minimum far more reliably
    # than few ~0.8 s ones (loop scaling cancels fixed dispatch overhead)
    n_lo, n_hi = (64, 512) if on_tpu else (4, 16)
    K = 2

    # production TPU path: the double-buffered fused Pallas GD kernel
    # (ops/pallas_kernels.fused_gd_iteration_db) — one VMEM-resident pass
    # per iteration. Falls back to the chunked + MXU-conv XLA path if the
    # pool's Mosaic compile helper is down.
    chunks = 8 if (on_tpu and dim >= 128) else 0
    try:
        per_iter = _with_retries(
            lambda: solve_time_per_iter(dim, K, n_lo, n_hi, fused=True),
            attempts=2,
        ) if on_tpu else None
    except Exception:  # noqa: BLE001 — Mosaic helper flakiness
        per_iter = None
    solver_path = "fused_pallas"
    if per_iter is None:
        solver_path = "chunked_xla"
        per_iter = _with_retries(
            lambda: solve_time_per_iter(
                dim, K, n_lo, n_hi, n_chunks=chunks, conv_mxu=on_tpu
            )
        )
    voxel_iters_per_sec = dim**3 / per_iter

    # the reference's own headline workload: 64^3 at 2048 iters -> ~2 fps.
    # On TPU this runs the Y-FOLDED fused kernel in VMEM-RESIDENT
    # multi-iteration chunks (inner_steps=16: 16 GD iterations per launch,
    # no HBM state round-trip between them — exact for this fixed-iteration
    # workload since 16 | 64, 512, 2048); XLA fallback if the compile
    # helper is down. (CPU smoke runs measure a 16^3 stand-in.)
    dim_ref = 64 if on_tpu else 16
    per_iter_64 = None
    per_iter_64_k2 = None
    k64 = K
    w1_diff = None
    w1_margin = None
    if on_tpu:
        try:
            # fold_xmats: lane-axis conv/stencils on the MXU at
            # HIGHEST precision (~7% measured; 3e-5 vox reassociation
            # drift over 128 iters — the K1==K2 check below runs with it)
            per_iter_64_k2 = _with_retries(
                lambda: solve_time_per_iter(
                    dim_ref, K, n_lo, n_hi, fused=True, x_pad=128,
                    inner=16, fold_xmats=True,
                ),
                attempts=2,
            )
            per_iter_64 = per_iter_64_k2
            # the headline scene's displacement stays well inside ONE
            # voxel, so the K=1 window warp is EXACT for it — verified by
            # solving at both windows and comparing bit-for-bit AND by the
            # runtime window guard (solver.window_guard_margin) that makes
            # K=1 safe for arbitrary scenes (fallback to K=2 iff margin
            # <= 0; tests/test_solver.py::test_window_guard_*). Only then
            # is the (VPU-lighter) K=1 row the headline.
            w1_diff, w1_margin = window1_exact_diff_vox(
                dim_ref, fold_xmats=True
            )
            if w1_diff < 1e-5 and w1_margin > 0.5:
                per_iter_64 = _with_retries(
                    lambda: solve_time_per_iter(
                        dim_ref, 1, n_lo, n_hi, fused=True, x_pad=128,
                        inner=16, fold_xmats=True,
                    ),
                    attempts=2,
                )
                k64 = 1
        except Exception:  # noqa: BLE001 — Mosaic helper flakiness
            per_iter_64 = None
    if per_iter_64 is None:
        per_iter_64 = _with_retries(
            lambda: solve_time_per_iter(dim_ref, K, n_lo, n_hi, conv_mxu=on_tpu)
        )
    fps_64 = 1.0 / (per_iter_64 * 2048)

    # scaling point: 256^3 (fused kernel; chunked-XLA fallback; TPU only)
    vox_per_sec_256 = None
    per_iter_256 = None
    if on_tpu:
        for kwargs in ({"fused": True}, {"n_chunks": 32, "conv_mxu": True}):
            try:
                per_iter_256 = _with_retries(
                    lambda: solve_time_per_iter(256, K, 16, 128, **kwargs),
                    attempts=2,
                )
                vox_per_sec_256 = 256**3 / per_iter_256
                break
            except Exception:  # noqa: BLE001 — secondary metric, never fatal
                pass

    # 512^3 on ONE chip (the BASELINE hat/umbrella scale, config 4):
    # PRIMARY path is the fused ping-pong Pallas loop (estimate_psi
    # fused_db) — its Mosaic binary is TILE-sized, so grid growth costs
    # only XLA-side compile time (~27 s measured round-5) and the
    # per-iteration cost scales near-linearly from 256^3: measured
    # 49.3 ms/iter (tools/profile_512pp.py; 44 ms would be linear),
    # 5.2x the round-4 zscan's 257 ms. Fallback when the pool's compile
    # service rejects it: the z-slab SCAN solve (one-slab-sized program,
    # bf16 storage) at ~253 ms/iter — scan-serialized slab dispatches.
    per_iter_512 = None
    path_512 = None
    if on_tpu:
        def _mk_vols_512():
            from sobfu_tpu import fields as _f, solver as _s
            from sobfu_tpu.tsdf import init_sphere as _sph

            d = 512
            vsz = 1.0 / d
            dms = (d,) * 3
            tg5, _ = _sph(dms, (vsz,) * 3, (0.5, 0.5, 0.5), 0.20,
                          8 * vsz, 3 * vsz)
            tn5, _ = _sph(dms, (vsz,) * 3, (0.5 - 1.3 * vsz, 0.5, 0.5),
                          0.205, 8 * vsz, 3 * vsz)
            taps5 = jnp.asarray(_s.sobolev_filter_1d(7, 0.1))
            psi5 = _f.identity_field(dms)
            return psi5, tg5, tn5, taps5

        def run_512_pp():
            from sobfu_tpu import solver as _s

            psi5, tg5, tn5, taps5 = _mk_vols_512()
            taps_st = tuple(float(t) for t in np.asarray(taps5))

            def go(n):
                t0 = time.perf_counter()
                res = _s.estimate_psi(
                    psi5, tg5, tg5, tn5, tn5, taps5, jnp.float32(0.05),
                    jnp.float32(0.2), jnp.int32(n), jnp.float32(-1.0),
                    skip_tails=True, warp_window=K, momentum=0.9,
                    fused_db=True, taps_static=taps_st,
                )
                assert np.isfinite(float(res.max_norm))
                return time.perf_counter() - t0

            go(2)  # compile + warm
            best = float("inf")
            for _ in range(3):
                best = min(best, (go(6) - go(2)) / 4)
            return best

        def run_512_zscan():
            from sobfu_tpu import solver as _s

            psi5, tg5, tn5, taps5 = _mk_vols_512()

            def go(n):
                t0 = time.perf_counter()
                out = _s.estimate_psi_zscan(
                    psi5, tg5, tn5, taps5, jnp.float32(0.05),
                    jnp.float32(0.2), jnp.int32(n), jnp.float32(-1.0),
                    slab=32, warp_window=K,
                )
                _ = float(out[3])
                return time.perf_counter() - t0

            go(2)  # compile + warm
            best = float("inf")
            for _ in range(2):
                best = min(best, (go(6) - go(2)) / 4)
            return best

        try:
            per_iter_512 = _with_retries(run_512_pp, attempts=2)
            path_512 = "fused_pp_pallas"
        except Exception:  # noqa: BLE001 — secondary metric, never fatal
            try:
                per_iter_512 = _with_retries(run_512_zscan, attempts=2)
                path_512 = "zscan_xla_bf16"
            except Exception:  # noqa: BLE001
                pass

    # production mode run to convergence (pyramid + momentum + fused),
    # with plain-GD energy equivalence evidence (VERDICT item 3)
    conv = {}
    try:
        conv = _with_retries(
            lambda: fps_at_convergence(dim, conv_mxu=on_tpu), attempts=2
        )
    except Exception:  # noqa: BLE001 — secondary metric, never fatal
        pass

    # the same production mode at the 256^3 north-star grid (oracle energy
    # evidence comes from the 128^3 run above; TPU only)
    conv256 = {}
    if on_tpu:
        try:
            conv256 = _with_retries(
                lambda: fps_at_convergence(
                    256, conv_mxu=True, with_oracle=False
                ),
                attempts=2,
            )
        except Exception:  # noqa: BLE001
            pass

    # END-TO-END pipeline fps (depth -> preprocess -> integrate -> solve
    # -> fuse, the full SobFusion frame step; VERDICT r3 item 2)
    pipe128 = pipe256 = pipe_drift = {}
    if on_tpu:
        try:
            pipe128 = _with_retries(lambda: pipeline_fps(128), attempts=2)
        except Exception:  # noqa: BLE001 — secondary metric, never fatal
            pass
        try:
            pipe256 = _with_retries(lambda: pipeline_fps(256), attempts=2)
        except Exception:  # noqa: BLE001
            pass
        # unbounded-drift regime on the compositive fused frame step
        # (round-4 VERDICT item 3)
        try:
            pipe_drift = _with_retries(
                lambda: pipeline_fps(128, drift=True), attempts=2
            )
        except Exception:  # noqa: BLE001
            pass

    # the production pyramid solve at the BASELINE config-4 scale
    # (hat/umbrella 512^3), on the fused pp path. LAST and single-attempt:
    # the full solve with tails peaks ~11 GB — on the SHARED pool chip the
    # headroom depends on co-tenants, and a ResourceExhausted here must
    # not poison the earlier metrics (measured round 5: the same program
    # fit on one attempt and OOMed on the next).
    conv512 = {}
    if on_tpu and path_512 == "fused_pp_pallas":
        try:
            conv512 = fps_at_convergence(512, conv_mxu=True,
                                         with_oracle=False)
        except Exception:  # noqa: BLE001
            pass

    # HBM roofline: achieved GB/s as % of chip peak for each hot loop
    # (round-4 VERDICT item 7). The fused loops sit well under 50% because
    # they are VPU-BOUND, not bandwidth-bound — the (2K+1)^3-tap in-loop
    # window warp plus the 3 Sobolev stencil passes dominate cycle count
    # (docs/BENCHLOG.md round-5 roofline note); 512^3's zscan additionally
    # serializes slab dispatches (STATUS gap 3).
    peak = _hbm_peak_gbps()
    hbm_util = {"hbm_peak_gbps": peak}
    if on_tpu and per_iter:
        hbm_util["128"] = round(
            100 * fused_loop_bytes_per_iter(128) / per_iter / 1e9 / peak, 1
        )
    if on_tpu and per_iter_256:
        hbm_util["256"] = round(
            100 * fused_loop_bytes_per_iter(256) / per_iter_256 / 1e9 / peak,
            1,
        )
    if on_tpu and per_iter_512:
        bytes_512 = (
            fused_loop_bytes_per_iter(512)
            if path_512 == "fused_pp_pallas"
            else zscan_bytes_per_iter(512)
        )
        hbm_util[f"512_{path_512}"] = round(
            100 * bytes_512 / per_iter_512 / 1e9 / peak, 1
        )

    # recorded-vs-steady attribution: the latency-inclusive fps pays one
    # host<->device round trip per frame that the pipelined (steady) loop
    # hides behind the next frame's compute; measure the RTT and compare
    # it against the actual recorded-minus-steady per-frame gap
    rtt_ms = round(measure_rtt_ms(), 2) if on_tpu else None
    rtt_attr_256 = None
    if on_tpu and conv256 and conv256.get("fps") and conv256.get("fps_steady"):
        gap_ms = 1e3 / conv256["fps"] - 1e3 / conv256["fps_steady"]
        rtt_attr_256 = {
            "recorded_minus_steady_ms": round(gap_ms, 2),
            "tunnel_rtt_ms": rtt_ms,
            "rtt_fraction_of_gap": (
                round(rtt_ms / gap_ms, 2) if gap_ms > 0 else None
            ),
        }

    # end-to-end solve latency at the reference's own workload settings
    frame_s_2048 = per_iter * 2048
    result = {
        "metric": f"solver_voxel_iters_per_sec_{dim}cubed",
        "value": round(voxel_iters_per_sec, 1),
        "unit": "voxel_iters/s",
        "vs_baseline": round(voxel_iters_per_sec / REFERENCE_VOXEL_ITERS_PER_SEC, 3),
        "platform": platform,
        "grid": dim,
        "warp_window": K,
        "solver_path": solver_path,
        "per_iter_ms": round(per_iter * 1e3, 4),
        "per_iter_ms_256cubed": (
            round(per_iter_256 * 1e3, 4) if per_iter_256 else None
        ),
        "per_iter_ms_512cubed": (
            round(per_iter_512 * 1e3, 4) if per_iter_512 else None
        ),
        "solver_path_512": path_512,
        "hbm_util_pct": hbm_util if on_tpu else None,
        "fps_at_2048_iters": round(1.0 / frame_s_2048, 3),
        f"fps_at_{dim_ref}cubed_2048_iters": round(fps_64, 2),
        f"fps_at_{dim_ref}cubed_2048_iters_window": k64,
        f"fps_at_{dim_ref}cubed_2048_iters_k2": (
            round(1.0 / (per_iter_64_k2 * 2048), 2)
            if per_iter_64_k2 else None
        ),
        "window1_exact_max_diff_vox": w1_diff,
        "window1_guard_margin_vox": w1_margin,
        "voxel_iters_per_sec_256cubed_chunked": (
            round(vox_per_sec_256, 1) if vox_per_sec_256 else None
        ),
        "tunnel_rtt_ms": rtt_ms,
        "rtt_attribution_256": rtt_attr_256,
        "convergence_mode": conv or None,
        "convergence_mode_256cubed": conv256 or None,
        "convergence_mode_512cubed": conv512 or None,
        "pipeline_fps_128": pipe128 or None,
        "pipeline_fps_256": pipe256 or None,
        "pipeline_fps_128_drift_compositive": pipe_drift or None,
        "reference_fps_headline": 2.0,
        "reference_baseline": "2 fps @ 64^3 x 2048 iters (sm_61 GPU) = 1.07e9 vox-it/s",
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
