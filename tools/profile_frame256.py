"""End-to-end fused_frame_step decomposition at the bench pipeline config.

pipeline_fps(256) measured 408 ms/frame at 330 total iters (round 5,
post separable-ingest + warp-fuse). This attributes the frame budget:

  A  full production frame (bench.pipeline_fps config, oscillating scene)
  B  A with max_iter=0          A-B = GD iterations (all levels)
  C  B with pyramid_levels=1    B-C = pyramid build/resample plumbing
  D  integrate_dists alone      separable MXU ingest (axis_aligned)
  E  warp-fuse alone            window_warp_fuse_pallas @ K=2

Steady-state: 4 frames queued, one trailing sync, /4 — tunnel RTT
excluded. Usage: python tools/profile_frame256.py [dim] [drift]
(second arg "drift" switches to the compositive unbounded-drift bench
config and a linearly-translating scene).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def steady(label, fn, queue=4, reps=3):
    out = fn()
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        rs = [fn() for _ in range(queue)]
        jax.block_until_ready(rs[-1])
        best = min(best, (time.perf_counter() - t0) / queue)
    print(f"{label:58s} {best * 1e3:9.2f} ms", flush=True)
    return best


def main():
    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    drift = len(sys.argv) > 2 and sys.argv[2] == "drift"

    import bench
    from sobfu_tpu import solver as solver_mod
    from sobfu_tpu.config import Intr, translation_pose  # noqa: F401
    from sobfu_tpu.pipeline import SobFusion, fused_frame_step

    # reuse the EXACT bench scene + params via pipeline_fps internals
    H, W = 240, 320
    intr = Intr(250.0, 250.0, W / 2 - 0.5, H / 2 - 0.5)
    p = bench.pipeline_fps.__wrapped__ if hasattr(
        bench.pipeline_fps, "__wrapped__") else None
    # build params the same way pipeline_fps does
    from sobfu_tpu.config import Params
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
    p.warp_window = 2
    p.fused_pallas = True
    p.momentum = 0.95
    p.pyramid_levels = 3 if dim >= 256 else 2
    p.fine_window = None
    p.inv_coarse = True
    p.stall_window = 16
    p.stall_rel = 1e-2
    p.inverse_iters = 3
    p.inverse_warm = True
    p.conv_mxu = True
    if drift:
        p.solver_mode = "compositive"
        p.inv_coarse = False
        p.momentum = 0.9

    fusion = SobFusion(p)
    fusion.need_inv_warps = False

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

    step_m = 1.1 * vs
    frames = [
        jnp.asarray(render(
            ((i * step_m) if drift
             else step_m * np.sin(i * np.pi / 4), 0.0, 0.45)))
        for i in range(4)
    ]
    fusion(frames[0])
    fusion(frames[1])  # trace + first solve
    jax.block_until_ready(fusion.phi_global.tsdf)

    # capture the state + args the frame step sees at steady state
    vol2cam = np.linalg.inv(
        np.asarray(fusion.poses[-1], np.float32)) @ fusion.phi_global.pose
    base = dict(
        dims_zyx=fusion.phi_global.dims_zyx,
        bilateral_kernel_size=p.bilateral_kernel_size,
        bilateral_sigma_spatial=p.bilateral_sigma_spatial,
        bilateral_sigma_depth=p.bilateral_sigma_depth,
        trunc_depth=p.icp_truncate_depth_dist,
        warp_window=fusion.solver.warp_window,
        momentum=fusion.solver.momentum,
        n_chunks=fusion.solver.z_chunks,
        inverse_iters=fusion.solver.inverse_iters,
        conv_mxu=fusion.solver.conv_mxu,
        fused_db=fusion.solver.fused_pallas,
        taps_static=fusion.solver.taps_static,
        pyramid_levels=fusion.solver.pyramid_levels,
        x_pad_to=fusion.solver.x_pad_to,
        fine_window=fusion.solver.fine_window,
        stall_window=fusion.solver.stall_window,
        stall_rel=fusion.solver.stall_rel,
        skip_inv_warps=True,
        inv_multigrid=fusion.solver.inv_multigrid,
        inner_steps=fusion.solver.inner_steps,
        inv_coarse=fusion.solver.inv_coarse,
        fold_xmats=fusion.solver.fold_xmats,
        solver_mode="compositive" if drift else "additive",
        axis_aligned=True,
        skip_weight_warp=not drift,
    )
    args = (
        frames[2],
        fusion.phi_global.tsdf, fusion.phi_global.weight,
        fusion.psi.data, fusion.solver.taps,
        jnp.asarray(vol2cam, jnp.float32),
        jnp.asarray([intr.fx, intr.fy, intr.cx, intr.cy], jnp.float32),
        jnp.asarray(fusion.phi_global.voxel_sizes(), jnp.float32),
        jnp.float32(fusion.phi_global.trunc_dist),
        jnp.float32(fusion.phi_global.eta),
        jnp.float32(fusion.phi_global.max_weight),
        jnp.float32(p.alpha), jnp.float32(p.w_reg),
        jnp.int32(p.max_iter), jnp.float32(p.max_update_norm),
        fusion.psi_inv.data,
    )

    def run(**over):
        kw = dict(base, **over)
        return fused_frame_step(*args, **kw)

    res = run()
    print("total iters (A):", int(res[4].iters), flush=True)
    a = steady("A full production frame", lambda: run())
    b = steady("B max_iter=0 (fixed block)",
               lambda: fused_frame_step(*args[:13], jnp.int32(0), args[14],
                                        args[15], **base))
    c = steady("C B + pyramid_levels=1",
               lambda: fused_frame_step(*args[:13], jnp.int32(0), args[14],
                                        args[15],
                                        **dict(base, pyramid_levels=1,
                                               inv_coarse=False)))
    from sobfu_tpu.tsdf import integrate_dists
    zeros = jnp.zeros(p.volume_dims[::-1], jnp.float32)
    from sobfu_tpu.ops import imgproc
    dists = imgproc.compute_dists(
        imgproc.bilateral_filter(frames[2], p.bilateral_kernel_size,
                                 p.bilateral_sigma_spatial,
                                 p.bilateral_sigma_depth), args[6])
    d = steady("D integrate_dists separable", lambda: integrate_dists(
        zeros, zeros, dists, args[5], args[6], args[7], args[8], args[9],
        tuple(p.volume_dims[::-1]), axis_aligned=True))
    d2 = steady("D' integrate_dists general gather", lambda: integrate_dists(
        zeros, zeros, dists, args[5], args[6], args[7], args[8], args[9],
        tuple(p.volume_dims[::-1]), axis_aligned=False))
    from sobfu_tpu.ops.pallas_kernels import window_warp_fuse_pallas
    psi = fusion.psi.data
    e = steady("E window_warp_fuse_pallas K=2", lambda: window_warp_fuse_pallas(
        args[1], args[2], args[1], args[2], psi, args[10], K=2))
    print(f"\niterations (A-B): {(a - b) * 1e3:.2f} ms "
          f"({int(res[4].iters)} iters)")
    print(f"pyramid plumbing (B-C): {(b - c) * 1e3:.2f} ms")
    print(f"fixed block sans pyramid (C): {c * 1e3:.2f} ms")
    print(f"ingest separable vs gather: {d * 1e3:.2f} vs {d2 * 1e3:.2f} ms")
    print(f"warp-fuse: {e * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
