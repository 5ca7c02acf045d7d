"""Tail decomposition of the 256^3 production frame (round 3, late).

profile_injit.py showed the frame is TAILS-dominated (iterations 21.7 ms,
pyramid 3.2 ms, tails+dispatch 93.6 ms of a 118 ms frame). This splits the
tails: tunnel RTT (the axon fetch latency any per-frame host sync pays),
the warm inverse steps, and the tail warps.

  RTT   tiny scalar jit round trip             = fetch+dispatch floor
  A     full production frame (inverse 4)
  I0    inverse_iters=0                        A-I0 = inverse cost
                                               I0-RTT = warps+compose+misc

Usage: python tools/profile_tails.py [dim]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def timed(label, fn, reps=4):
    out = fn()
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = float(jnp.asarray(leaf).reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    print(f"{label:46s} {best * 1e3:9.2f} ms", flush=True)
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

    # tunnel RTT floor
    one = jnp.float32(1.0)
    tiny = jax.jit(lambda x: x + 1.0)
    t_rtt = timed("RTT tiny scalar jit", lambda: tiny(one), reps=8)

    def make(inv_iters):
        def _run(live, psi_inv0):
            psi = fields.identity_field(dims)
            return solver.estimate_psi_pyramid(
                psi, tg, wg, live, wn, taps, jnp.float32(0.05),
                jnp.float32(0.2), jnp.int32(1024), thresh,
                psi_inv0, levels=levels,
                warp_window=2, momentum=0.95, fine_window=1,
                stall_window=16, stall_rel=1e-2,
                fused_db=True, taps_static=taps_static, conv_mxu=True,
                inverse_iters=inv_iters,
            )
        return jax.jit(_run)

    run_full = make(4)
    prev_tn, _ = init_sphere(
        dims, (vs,) * 3, (0.5 - 0.6 * vs, 0.5, 0.5), 0.202, trunc, eta
    )
    inv_warm = run_full(prev_tn, ident).psi_inv
    jax.block_until_ready(inv_warm)

    tA = timed("A full production frame (inverse 4)",
               lambda: run_full(tn, inv_warm))
    run_i0 = make(0)
    tI0 = timed("I0 inverse_iters=0", lambda: run_i0(tn, inv_warm))

    print(f"\n# tunnel RTT floor            : {t_rtt * 1e3:8.2f} ms")
    print(f"# inverse (4 steps, A-I0)     : {(tA - tI0) * 1e3:8.2f} ms")
    print(f"# warps+compose+iters (I0-RTT): {(tI0 - t_rtt) * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
