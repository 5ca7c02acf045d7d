"""Per-iteration cost of the z-slab SCAN solve (the 512^3-scale engine).

The scan body keeps the compiled program one-slab-sized, so 512^3 gets
past the pool's compile service where the unrolled/fused programs could
not (docs/BENCHLOG.md round-3). Loop scaling: difference of two iteration
counts cancels fixed costs.

Usage: python tools/profile_zscan.py [dim] [slab] [n_lo n_hi]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    slab = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    n_lo = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    n_hi = int(sys.argv[4]) if len(sys.argv) > 4 else 6

    from sobfu_tpu import fields, solver
    from sobfu_tpu.tsdf import init_sphere

    vs = 1.0 / dim
    dims = (dim,) * 3
    trunc, eta = 8.0 * vs, 3.0 * vs
    tg, _ = init_sphere(dims, (vs,) * 3, (0.5, 0.5, 0.5), 0.20, trunc, eta)
    tn, _ = init_sphere(
        dims, (vs,) * 3, (0.5 - 1.3 * vs, 0.5, 0.5), 0.205, trunc, eta
    )
    taps = jnp.asarray(solver.sobolev_filter_1d(7, 0.1))
    psi = fields.identity_field(dims)
    jax.block_until_ready((tg, tn, psi))

    def run(n):
        t0 = time.perf_counter()
        out = solver.estimate_psi_zscan(
            psi, tg, tn, taps, jnp.float32(0.05), jnp.float32(0.2),
            jnp.int32(n), jnp.float32(-1.0), slab=slab, warp_window=2,
        )
        _ = float(out[3])
        return time.perf_counter() - t0

    t0 = time.perf_counter()
    run(n_lo)  # compile + warm (both counts share one program)
    print(f"# compile+first({n_lo} iters): {time.perf_counter() - t0:.1f} s",
          flush=True)

    best = float("inf")
    for _ in range(3):
        lo = run(n_lo)
        hi = run(n_hi)
        best = min(best, (hi - lo) / (n_hi - n_lo))
        print(f"#   pair lo={lo * 1e3:.1f} ms hi={hi * 1e3:.1f} ms", flush=True)
    print(f"zscan {dim}^3 slab={slab} per-iter {best * 1e3:.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
