"""Sustained multi-frame multi-scene STREAMING benchmark (BASELINE
config 5: a batch of scenes reconstructed concurrently across a device
mesh, fed frame-by-frame).

Runs the sharded frame step (parallel.make_frame_step: scene-DP x
z-sharding, per-shard fused iterations, warm inverse) over a STREAM of
depth frames — every scene gets a different moving-sphere sequence, and
psi / phi_global / psi_inv are carried across frames exactly as the
production loop carries them. Reports sustained scene-frames/s (frames
queued back-to-back, one trailing sync) and a tracking sanity check
(every scene's deformation field follows its own motion direction).

On this pool only a virtual CPU mesh is available
(JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8),
so the number is a STRUCTURAL artifact — it proves the streaming feed,
the cross-frame state carry, and the scene isolation on the real
multi-chip program; per-chip throughput on real ICI hardware is the
single-chip bench number times the (measured-on-CPU-mesh) scaling
ratio. Reference counterpart: none (single GPU, one scene;
demo.cpp processes one stream).

Usage: python tools/bench_multiscene_stream.py [dim] [frames]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def render_dists(H, W, fx, fy, cx, cy, centre, radius):
    """Metric ray-length map of a sphere (what compute_dists produces)."""
    u = np.arange(W, dtype=np.float64)[None, :]
    v = np.arange(H, dtype=np.float64)[:, None]
    dx = np.broadcast_to((u - cx) / fx, (H, W))
    dy = np.broadcast_to((v - cy) / fy, (H, W))
    d = np.stack([dx, dy, np.ones((H, W))], axis=-1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    c = np.asarray(centre, np.float64)
    b = d @ c
    disc = b * b - (c @ c - radius * radius)
    t = b - np.sqrt(np.maximum(disc, 0.0))
    hit = (disc > 0) & (t > 0)
    return np.where(hit, t, 0.0).astype(np.float32)


def main():
    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 6

    from sobfu_tpu import fields, solver
    from sobfu_tpu.parallel import make_mesh
    from sobfu_tpu.parallel.sharding import make_frame_step

    devs = jax.devices()
    n_scene = 2 if len(devs) >= 8 else 1
    n_z = min(4, len(devs) // n_scene)
    mesh = make_mesh(n_z=n_z, n_scene=n_scene, devices=devs[: n_scene * n_z])
    S = n_scene * 2

    dims_zyx = (dim, dim, dim)
    size = 0.25
    vs = size / dim
    trunc, eta = 8 * vs, 3 * vs
    H, W = 48, 64
    fx = fy = 40.0
    cx, cy = W / 2 - 0.5, H / 2 - 0.5
    intr = jnp.asarray([fx, fy, cx, cy], jnp.float32)

    taps = jnp.asarray(solver.sobolev_filter_1d(7, 0.1))
    taps_static = tuple(float(t) for t in np.asarray(taps))
    step, shardings = make_frame_step(
        mesh, dims_zyx, inverse_iters=3, warp_window=2,
        fused=True, taps_static=taps_static, momentum=0.95,
        warm_inverse=True, pyramid_levels=2, stall_window=8,
        stall_rel=1e-2, fold_xmats=True,
    )

    vol2cam = np.eye(4, dtype=np.float32)
    vol2cam[:3, 3] = (-size / 2, -size / 2, 0.15)
    v2c_b = jnp.broadcast_to(jnp.asarray(vol2cam)[None], (S, 4, 4))
    c0 = size / 2
    z_cam = c0 + 0.15
    r_sph = 0.05

    # canonical: every scene starts from the SAME sphere, then drifts in
    # its own direction (scene s moves along dir[s]). The canonical is
    # INTEGRATED from the frame-0 depth (projective psdf semantics), not
    # the analytic SDF — mixing modalities would give the solver a
    # systematic along-ray residual to chase.
    dirs = np.asarray(
        [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0]], np.float64
    )[:S]
    from sobfu_tpu.tsdf import integrate_dists

    d0 = jnp.asarray(
        render_dists(H, W, fx, fy, cx, cy, (0.0, 0.0, z_cam), r_sph)
    )
    zeros = jnp.zeros(dims_zyx, jnp.float32)
    tg1, wg1 = integrate_dists(
        zeros, zeros, d0, jnp.asarray(vol2cam),
        intr, jnp.asarray([vs] * 3, jnp.float32),
        jnp.float32(trunc), jnp.float32(eta), dims_zyx,
    )
    tg_b = jax.device_put(
        jnp.broadcast_to(tg1[None], (S,) + dims_zyx), shardings["vol"]
    )
    wg_b = jax.device_put(
        jnp.broadcast_to(wg1[None], (S,) + dims_zyx), shardings["vol"]
    )
    psi1 = fields.identity_field(dims_zyx)
    psi_b = jax.device_put(
        jnp.broadcast_to(psi1[None], (S,) + psi1.shape), shardings["psi"]
    )
    inv_b = psi_b

    # per-frame drift such that the ACCUMULATED displacement stays inside
    # the K=2 window over the whole stream (the sharded frame step runs
    # the additive windowed solve)
    step_m = min(0.9, 1.8 / n_frames) * vs
    scalars = (
        intr, jnp.asarray([vs] * 3, jnp.float32),
        jnp.float32(trunc), jnp.float32(eta), jnp.float32(64.0),
        taps, jnp.float32(0.1), jnp.float32(0.2),
        jnp.int32(96), jnp.float32(1e-3),
    )

    def frame_batch(i):
        ds = [
            render_dists(
                H, W, fx, fy, cx, cy,
                (dirs[s][0] * step_m * i, dirs[s][1] * step_m * i, z_cam),
                r_sph,
            )
            for s in range(S)
        ]
        return jax.device_put(jnp.asarray(np.stack(ds)), shardings["img"])

    frames = [frame_batch(i) for i in range(n_frames + 1)]

    # warm/compile with frame 0
    out = step(psi_b, tg_b, wg_b, frames[0], v2c_b, *scalars, inv_b)
    jax.block_until_ready(out[2])

    state = (psi_b, tg_b, wg_b, inv_b)
    t0 = time.perf_counter()
    iters_total = 0
    for i in range(1, n_frames + 1):
        psi_b, inv_b = state[0], state[3]
        out = step(psi_b, state[1], state[2], frames[i], v2c_b,
                   *scalars, inv_b)
        state = (out[0], out[2], out[3], out[1])
    jax.block_until_ready(state[1])
    dt = time.perf_counter() - t0
    iters_total = int(np.asarray(out[4]).sum())

    # tracking sanity: each scene's band-mean displacement points along
    # its own drift direction (scene isolation across the DP axis)
    psi_f = np.asarray(state[0])
    tg_f = np.asarray(state[1])
    ok = True
    for s in range(S):
        disp = psi_f[s] - np.asarray(psi1)
        band = np.abs(tg_f[s]) < 0.5
        if band.sum() < 50:
            ok = False
            continue
        m = np.asarray([disp[c][band].mean() for c in range(3)])
        proj = float(m @ dirs[s])  # along own direction
        orth = float(np.linalg.norm(m - proj * dirs[s]))
        if not (proj > 0.2 and orth < 0.5 * abs(proj) + 0.2):
            ok = False
    print(json.dumps({
        "mesh": f"{n_scene}x{n_z}",
        "scenes": S,
        "frames": n_frames,
        "dim": dim,
        "scene_frames_per_s": round(S * n_frames / dt, 3),
        "ms_per_frame_batch": round(dt / n_frames * 1e3, 1),
        "iters_last_batch": np.asarray(out[4]).tolist(),
        "iters_total": iters_total,
        "tracking_ok": ok,
        "platform": jax.devices()[0].platform,
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
