"""Head-to-head production-mode convergence profiles (round 3).

Compares, on the same scene/threshold as bench.fps_at_convergence:
  A  baseline production: pyramid + momentum 0.9 + fused (round-2 bench mode)
  B  A + fine_window=1 (K=1 compositive fine level: 27-tap in-loop warp)
  C  B + stall_window=64 (data-energy stall stop)
  D  C with momentum 0.95

Usage: python tools/profile_convergence.py [dim] [configs]
  dim      grid edge (default 128)
  configs  comma list from {A,B,C,D} (default all)

Prints one line per config: fps, iters, e_final, e_ratio vs plain GD.
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
    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    which = (sys.argv[2].split(",") if len(sys.argv) > 2
             else ["A", "B", "C", "D"])

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
    thresh = jnp.float32(1e-3 * dim / 128.0)
    cap = jnp.int32(1024)
    levels = 3 if dim >= 256 else 2

    def run(live, psi_inv0, fine_window, stall, mu):
        psi = fields.identity_field(dims)
        return solver.estimate_psi_pyramid(
            psi, tg, wg, live, wn, taps, jnp.float32(0.05),
            jnp.float32(0.2), cap, thresh, psi_inv0,
            levels=levels, warp_window=2, momentum=mu,
            fused_db=True, taps_static=taps_static, inverse_iters=12,
            fine_window=fine_window, stall_window=stall,
        )

    # plain-GD oracle energy (exact reference semantics, same threshold)
    ident = fields.identity_field(dims)
    gd = solver.estimate_psi(
        ident, tg, wg, tn, wn, taps, jnp.float32(0.05), jnp.float32(0.2),
        cap, thresh, warp_window=2, fused_db=True, taps_static=taps_static,
    )
    e_gd = float(solver.data_energy(tg, gd.tsdf_n_psi))
    print(f"# oracle: plain GD iters={int(gd.iters)} e_gd={e_gd:.4f}",
          flush=True)

    cfgs = {
        "A": dict(fine_window=None, stall=0, mu=0.9),
        "B": dict(fine_window=1, stall=0, mu=0.9),
        "C": dict(fine_window=1, stall=64, mu=0.9),
        "D": dict(fine_window=1, stall=64, mu=0.95),
    }
    for name in which:
        kw = cfgs[name]
        try:
            inv_warm = run(prev_tn, ident, **kw).psi_inv
            res = run(tn, inv_warm, **kw)  # compile + warm
            iters = int(res.iters)
            times = []
            for _ in range(4):
                t0 = time.perf_counter()
                res = run(tn, inv_warm, **kw)
                _ = float(res.max_norm)
                times.append(time.perf_counter() - t0)
            t = min(times)
            e = float(solver.data_energy(tg, res.tsdf_n_psi))
            print(
                f"{name} {kw}: fps={1.0 / t:.2f} iters={iters} "
                f"e_final={e:.4f} e_ratio={e / max(e_gd, 1e-9):.3f}",
                flush=True,
            )
        except Exception as exc:  # noqa: BLE001 — pool flakiness
            print(f"{name} {kw}: FAILED {str(exc)[:200]}", flush=True)


if __name__ == "__main__":
    main()
