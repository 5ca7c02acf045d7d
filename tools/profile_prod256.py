"""Steady-state decomposition of the PRODUCTION 256^3 convergence solve.

bench.py's convergence_mode_256cubed config (pyramid 3 + momentum 0.95 +
fused fold/pp kernels + compositive K=1 fine level + stall + warm
anchorless multigrid inverse + skip_inv_warps). Each variant is timed
STEADY-STATE (4 frames queued, one trailing sync, /4) so the tunnel RTT
never enters; differences of variants attribute the device budget:

  A  full production solve
  B  coarse_max_iter=0              A-B = coarse-level iterations
  C  B + max_iter=0                 B-C = fine-level iterations
  D  C + inverse off (iters=0)      C-D = warm multigrid inverse
  E  D + levels=1                   D-E = pyramid build + resamples
                                    E   = T0 warp + compose_weight + misc

Usage: python tools/profile_prod256.py [dim]
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
    out = fn()  # compile + warm
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        rs = [fn() for _ in range(queue)]
        jax.block_until_ready(rs[-1])
        best = min(best, (time.perf_counter() - t0) / queue)
    print(f"{label:52s} {best * 1e3:9.2f} ms", flush=True)
    return best


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
    taps = jnp.asarray(solver.sobolev_filter_1d(7, 0.1))
    taps_static = tuple(float(t) for t in np.asarray(taps))
    thresh = jnp.float32(4e-3 * dim / 128.0)
    levels = 3 if dim >= 256 else 2
    ident = fields.identity_field(dims)

    def make(coarse_max_iter=None, max_iter=1024, inverse_iters=None,
             lv=levels):
        kw = solver.production_pyramid_kwargs(dim)
        kw["levels"] = lv
        if inverse_iters is not None:
            kw["inverse_iters"] = inverse_iters
            if inverse_iters == 0:
                kw["inv_multigrid"] = False
                kw["inv_coarse"] = False

        def _run(live, psi_inv0):
            psi = fields.identity_field(dims)
            return solver.estimate_psi_pyramid(
                psi, tg, wg, live, wn, taps, jnp.float32(0.05),
                jnp.float32(0.2), jnp.int32(max_iter), thresh,
                psi_inv0,
                coarse_max_iter=coarse_max_iter,
                taps_static=taps_static,
                **kw,
            )
        return jax.jit(_run)

    run_full = make()
    prev_tn, _ = init_sphere(
        dims, (vs,) * 3, (0.5 - 0.6 * vs, 0.5, 0.5), 0.202, trunc, eta
    )
    res_w = run_full(prev_tn, ident)
    inv_warm = res_w.psi_inv
    jax.block_until_ready(inv_warm)
    res = run_full(tn, inv_warm)
    print(f"iters (total incl. coarse): {int(res.iters)}")
    rB = make(coarse_max_iter=0)(tn, inv_warm)
    print(f"iters fine-only (coarse 0): {int(rB.iters)}")

    tA = steady("A full production solve", lambda: run_full(tn, inv_warm))
    runB = make(coarse_max_iter=0)
    tB = steady("B coarse_max_iter=0", lambda: runB(tn, inv_warm))
    runC = make(coarse_max_iter=0, max_iter=0)
    tC = steady("C B + max_iter=0 (tails only)", lambda: runC(tn, inv_warm))
    runD = make(coarse_max_iter=0, max_iter=0, inverse_iters=0)
    tD = steady("D C + inverse_iters=0", lambda: runD(tn, inv_warm))
    runE = make(coarse_max_iter=0, max_iter=0, inverse_iters=0, lv=1)
    tE = steady("E D + levels=1", lambda: runE(tn, inv_warm))

    print()
    print(f"# coarse iterations (A-B)  : {(tA - tB) * 1e3:8.2f} ms")
    print(f"# fine iterations   (B-C)  : {(tB - tC) * 1e3:8.2f} ms")
    print(f"# multigrid inverse (C-D)  : {(tC - tD) * 1e3:8.2f} ms")
    print(f"# pyramid build     (D-E)  : {(tD - tE) * 1e3:8.2f} ms")
    print(f"# T0+compose+misc   (E)    : {tE * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
