"""Tile-geometry sweep of window_warp_pallas at 256^3 (K=2).

The new-production-config trace shows the two remaining scalar window
warps (tnp0 at psi0, weight floor at psi_final) cost ~2.7 ms each — 4-5x
the HBM roofline of the op. This sweeps (BZ, TY) and floor mode to see
whether the shipped BZ=8/TY=32 geometry is leaving throughput on the
table. Methodology = chained-op loop differencing (profile_tail_kernels).

Usage: python tools/profile_warp_geometry.py [dim]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def chain_timed(label, op, arrs, n=12, reps=3):
    @functools.partial(jax.jit, static_argnames=("reps",))
    def chain(x0, rest, reps):
        def body(i, x):
            return op(x, *rest)
        return jax.lax.fori_loop(0, reps, body, x0)

    x0, rest = arrs[0], tuple(arrs[1:])

    def run(r):
        out = chain(x0, rest, r)
        return float(jnp.asarray(out).reshape(-1)[0])

    try:
        run(1), run(n)
    except Exception as e:  # noqa: BLE001
        print(f"{label:40s} FAIL {str(e)[:90]}", flush=True)
        return
    best1 = bestN = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        run(1)
        best1 = min(best1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        run(n)
        bestN = min(bestN, time.perf_counter() - t0)
    per = (bestN - best1) / (n - 1)
    print(f"{label:40s} {per * 1e3:9.3f} ms/op", flush=True)


def main():
    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    from sobfu_tpu import fields
    from sobfu_tpu.ops.pallas_kernels import window_warp_pallas

    dims = (dim,) * 3
    key = jax.random.PRNGKey(0)
    vol = jax.random.normal(key, dims, jnp.float32)
    ident = fields.identity_field(dims)
    disp = 0.8 * jnp.tanh(
        jax.random.normal(jax.random.fold_in(key, 2), (3,) + dims)
    )
    psi = ident + disp

    for BZ, TY in ((8, 32), (8, 16), (8, 64), (16, 32), (16, 16), (32, 32)):
        chain_timed(
            f"warp K=2 BZ={BZ} TY={TY}",
            lambda x, p, BZ=BZ, TY=TY: window_warp_pallas(
                x, p, K=2, BZ=BZ, TY=TY
            ),
            (vol, psi),
        )


if __name__ == "__main__":
    main()
