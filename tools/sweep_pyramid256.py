"""Sweep 256^3 production-frame configs: pyramid depth x coarse chunking.

Steady-state timing (4 frames queued, one trailing sync) of the full
production frame for: levels 3 (shipped), levels 4, coarse inner_steps
on/off. Decides the round-4 production defaults.

Usage: python tools/sweep_pyramid256.py [dim]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 256

    from sobfu_tpu import fields, solver
    from sobfu_tpu.tsdf import init_sphere

    vs = 1.0 / dim
    dims = (dim,) * 3
    trunc, eta = 8.0 * vs, 3.0 * vs
    tg, wg = init_sphere(dims, (vs,) * 3, (0.5, 0.5, 0.5), 0.20, trunc, eta)
    tn, wn = init_sphere(
        dims, (vs,) * 3, (0.5 - 1.3 * vs, 0.5, 0.5), 0.205, trunc, eta
    )
    prev_tn, _ = init_sphere(
        dims, (vs,) * 3, (0.5 - 0.6 * vs, 0.5, 0.5), 0.202, trunc, eta
    )
    taps = jnp.asarray(solver.sobolev_filter_1d(7, 0.1))
    taps_static = tuple(float(t) for t in np.asarray(taps))
    thresh = jnp.float32(4e-3 * dim / 128.0)
    ident = fields.identity_field(dims)

    from sobfu_tpu.solver import data_energy

    def make(levels):
        def _run(live, psi_inv0):
            psi = fields.identity_field(dims)
            return solver.estimate_psi_pyramid(
                psi, tg, wg, live, wn, taps, jnp.float32(0.05),
                jnp.float32(0.2), jnp.int32(1024), thresh,
                psi_inv0, levels=levels,
                warp_window=2, momentum=0.95, fine_window=1,
                stall_window=16, stall_rel=1e-2,
                fused_db=True, taps_static=taps_static, conv_mxu=True,
                inverse_iters=3, skip_inv_warps=True, inv_multigrid=True,
            )
        return jax.jit(_run)

    for levels in (3, 4):
        run = make(levels)
        inv_warm = run(prev_tn, ident).psi_inv
        jax.block_until_ready(inv_warm)
        res = run(tn, inv_warm)
        iters = int(res.iters)
        e = float(data_energy(tg, res.tsdf_n_psi))
        best_lat = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            r = run(tn, inv_warm)
            _ = float(r.max_norm)
            best_lat = min(best_lat, time.perf_counter() - t0)
        best_pipe = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            rs = [run(tn, inv_warm) for _ in range(4)]
            _ = float(rs[-1].max_norm)
            best_pipe = min(best_pipe, (time.perf_counter() - t0) / 4)
        print(
            f"levels={levels} iters={iters} e_data={e:.2f} "
            f"latency {best_lat * 1e3:.1f} ms ({1 / best_lat:.1f} fps) "
            f"steady {best_pipe * 1e3:.1f} ms ({1 / best_pipe:.1f} fps)",
            flush=True,
        )


if __name__ == "__main__":
    main()
