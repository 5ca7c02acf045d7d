"""Per-stage time breakdown of the production convergence solve (round 3).

Replicates profile_convergence config A/B level-by-level on the host and
times each jitted piece separately (the pyramid is host orchestration, so
the pieces ARE the production programs; the persistent compilation cache
makes every call warm):

  - coarse level(s): estimate_psi at dim/2^L with inverse_iters=1
  - resample up / down (jax.image.resize)
  - fine level at max_iter=0          -> tails cost (initial warp, inverse,
                                         final warps) with zero iterations
  - fine level at the converged count -> fine in-loop cost by difference

Usage: python tools/profile_breakdown.py [dim] [fine_window]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def timed(label, fn, reps=6):
    fn()  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        # materialise one scalar to force the tunnel round-trip
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = float(jnp.asarray(leaf).reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    print(f"{label:44s} {best * 1e3:9.2f} ms", flush=True)
    return best


def main():
    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    fine_window = (
        None if len(sys.argv) <= 2 or sys.argv[2] in ("None", "none", "")
        else int(sys.argv[2])
    )

    from sobfu_tpu import fields, solver
    from sobfu_tpu.solver import _downsample2, _resample_disp
    from sobfu_tpu.tsdf import init_sphere

    vs = 1.0 / dim
    dims = (dim,) * 3
    trunc, eta = 8.0 * vs, 3.0 * vs
    tg, wg = init_sphere(dims, (vs,) * 3, (0.5, 0.5, 0.5), 0.20, trunc, eta)
    tn, wn = init_sphere(
        dims, (vs,) * 3, (0.5 - 1.3 * vs, 0.5, 0.5), 0.205, trunc, eta
    )
    taps = jnp.asarray(solver.sobolev_filter_1d(7, 0.1))
    taps_static = tuple(float(t) for t in np.asarray(taps))
    thresh = jnp.float32(1e-3 * dim / 128.0)
    cap = jnp.int32(1024)
    levels = 3 if dim >= 256 else 2
    mu = 0.9
    alpha, w_reg = jnp.float32(0.05), jnp.float32(0.2)
    ident = fields.identity_field(dims)

    # ---- build pyramids (time it too; TSDF-only, matching
    # estimate_psi_pyramid's skip_tails coarse levels) ----
    def build_pyr():
        pyr = [(tg, tn)]
        for _ in range(levels - 1):
            a, c = pyr[-1]
            pyr.append((_downsample2(a), _downsample2(c)))
        return pyr

    pyr = build_pyr()
    timed("downsample pyramids", build_pyr)

    # ---- coarse levels, replicated exactly ----
    disp = jnp.zeros((3,) + pyr[-1][0].shape, jnp.float32)
    coarse_results = []
    for lev in range(levels - 1, 0, -1):
        tg_c, tn_c = pyr[lev]
        dims_c = tn_c.shape
        thresh_c = thresh * jnp.float32(0.5 ** lev)
        Xc = dims_c[-1]
        xpt_c = 0 if Xc % 128 == 0 else (
            ((Xc + 127) // 128) * 128 if Xc >= 64 else -1
        )
        fused_c = xpt_c >= 0
        disp_in = disp

        def run_level(d=disp_in, a=tg_c, c=tn_c,
                      dd=dims_c, th=thresh_c, fc=fused_c, xp=max(0, xpt_c)):
            psi_c = fields.identity_field(dd) + d
            return solver.estimate_psi(
                psi_c, a, a, c, c, taps, alpha, w_reg, cap, th,
                skip_tails=True, warp_window=2, momentum=mu,
                fused_db=fc, taps_static=taps_static if fc else None,
                x_pad_to=xp if fc else 0,
            )

        res_c = run_level()
        it_c = int(res_c.iters)
        timed(f"coarse level {lev} ({dims_c[0]}^3, {it_c} iters)", run_level)
        up_dims = pyr[lev - 1][0].shape
        disp = _resample_disp(
            res_c.psi - fields.identity_field(dims_c), up_dims, 2.0
        )
        coarse_results.append((lev, it_c))

    disp_fine = disp
    timed("upsample disp (last)", lambda: _resample_disp(
        res_c.psi - fields.identity_field(res_c.psi.shape[1:]),
        dims, 2.0))

    # ---- fine level ----
    psi0_fine = ident + disp_fine
    inv_warm = ident  # breakdown only; warm/cold inverse timing separate

    def run_fine(iters, fw=fine_window):
        if fw is not None:
            return solver.estimate_psi_compositive(
                psi0_fine, tg, wg, tn, wn, taps, alpha, w_reg,
                jnp.int32(iters), thresh if iters else jnp.float32(1e9),
                inv_warm, inverse_iters=12, warp_window=fw, total_window=2,
                momentum=mu, fused_db=True, taps_static=taps_static,
            )
        return solver.estimate_psi(
            psi0_fine, tg, wg, tn, wn, taps, alpha, w_reg,
            jnp.int32(iters), thresh if iters else jnp.float32(1e9),
            inv_warm, inverse_iters=12, warp_window=2,
            momentum=mu, fused_db=True, taps_static=taps_static,
        )

    res_f = run_fine(1024)
    it_f = int(res_f.iters)
    t_full = timed(f"fine level full ({it_f} iters + tails)",
                   lambda: run_fine(1024))
    t_tails = timed("fine level max_iter=0 (tails only)",
                    lambda: run_fine(0))
    if it_f:
        print(f"{'fine in-loop per-iter':44s} "
              f"{(t_full - t_tails) / it_f * 1e3:9.3f} ms", flush=True)
    print(f"# coarse iters: {coarse_results}  fine iters: {it_f}", flush=True)

    # ---- tail components (production fused path: pallas window ops) ----
    from sobfu_tpu.ops.pallas_kernels import (
        estimate_inverse_window_pallas,
        window_warp_pallas,
    )

    psi_f = res_f.psi
    inv_fn = jax.jit(lambda p, i: estimate_inverse_window_pallas(
        p, iters=12, K=2, init=i))
    psi_inv = inv_fn(psi_f, inv_warm)
    timed("tail: inverse (12 pallas steps)",
          lambda: inv_fn(psi_f, inv_warm))
    warp_fn = jax.jit(lambda v, p: window_warp_pallas(v, p, K=2))
    timed("tail: one scalar window warp",
          lambda: warp_fn(tg, psi_inv))
    warpf_fn = jax.jit(lambda v, p: window_warp_pallas(v, p, K=2, floor=True))
    timed("tail: one floor window warp",
          lambda: warpf_fn(wg, psi_inv))


if __name__ == "__main__":
    main()
