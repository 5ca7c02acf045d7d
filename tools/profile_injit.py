"""IN-JIT decomposition of the production convergence frame (round 3).

Unlike profile_breakdown.py (piecewise; each stage pays a tunnel
round-trip), this times WHOLE-FRAME jit variants with components disabled
and differences the minima:

  A  full production frame       (bench fps_at_convergence config)
  B  coarse_max_iter=0           A-B ~ coarse-level iteration cost
  C  cap=0 + coarse 0            C   = fixed costs (pyramid + tails)
  D  levels=1, cap=0             C-D ~ pyramid build/resample cost
                                 D   = tails (inverse+warps) + dispatch

Usage: python tools/profile_injit.py [dim]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def timed(label, fn, reps=3):
    out = fn()  # compile + warm
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = float(jnp.asarray(leaf).reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    print(f"{label:46s} {best * 1e3:9.2f} ms", flush=True)
    return best, out


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

    def make(cap, coarse_cap, lv):
        def _run(live, psi_inv0):
            psi = fields.identity_field(dims)
            return solver.estimate_psi_pyramid(
                psi, tg, wg, live, wn, taps, jnp.float32(0.05),
                jnp.float32(0.2), jnp.int32(cap),
                thresh if cap else jnp.float32(1e9),
                psi_inv0, levels=lv,
                coarse_max_iter=coarse_cap,
                warp_window=2, momentum=0.95, fine_window=1,
                stall_window=16, stall_rel=1e-2,
                fused_db=True, taps_static=taps_static, conv_mxu=True,
                inverse_iters=3, skip_inv_warps=True,
                inv_multigrid=dim >= 128,
            )
        return jax.jit(_run)

    run_full = make(1024, None, levels)
    prev_tn, _ = init_sphere(
        dims, (vs,) * 3, (0.5 - 0.6 * vs, 0.5, 0.5), 0.202, trunc, eta
    )
    inv_warm = run_full(prev_tn, ident).psi_inv
    jax.block_until_ready(inv_warm)

    variants = sys.argv[2] if len(sys.argv) > 2 else "ABCD"
    tA, resA = timed("A full production frame",
                     lambda: run_full(tn, inv_warm))
    itA = int(resA.iters)
    itB = 0
    if "B" in variants:
        run_nc = make(1024, 0, levels)
        tB, resB = timed("B no coarse iters", lambda: run_nc(tn, inv_warm))
        itB = int(resB.iters)
    run_fixed = make(0, 0, levels)
    tC, _ = timed("C fixed costs (pyr+tails, 0 iters)",
                  lambda: run_fixed(tn, inv_warm))
    run_tails = make(0, 0, 1)
    tD, _ = timed("D tails only (levels=1, 0 iters)",
                  lambda: run_tails(tn, inv_warm))

    print(f"\n# A iters(total)={itA}  B iters(fine-only-start)={itB}",
          flush=True)
    print(f"# iterations total (A-C)        : {(tA - tC) * 1e3:8.2f} ms")
    print(f"# pyramid build/resample (C-D)  : {(tC - tD) * 1e3:8.2f} ms")
    print(f"# tails+dispatch (D)            : {tD * 1e3:8.2f} ms")
    if itB:
        # B has zero coarse iters; its whole iteration time is fine-level
        print(f"# fine per-iter from B ((B-C)/itB): "
              f"{(tB - tC) / itB * 1e3:8.3f} ms  ({itB} fine iters)")


if __name__ == "__main__":
    main()
