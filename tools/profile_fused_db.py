"""Loop-scaled timing of the production fused GD iteration (double-buffered
Pallas kernel + padded loop state) on TPU.

Usage: python tools/profile_fused_db.py [dim] [K] [BZ] [TY] [vmem_mb] [mu] [xpad]

Times a fori_loop of fused_gd_iteration_db_padded + refresh_padded —
exactly the estimate_psi fused_db hot loop — with min-over-pairs to
mitigate pool contention.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax
import jax.numpy as jnp
import numpy as np

from sobfu_tpu import fields, solver
from sobfu_tpu.ops.pallas_kernels import (
    fused_gd_iteration_db_padded,
    pad_for_db,
    refresh_padded,
)


def main():
    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    BZ = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    TY = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    vmem_mb = int(sys.argv[5]) if len(sys.argv) > 5 else 0
    mu = float(sys.argv[6]) if len(sys.argv) > 6 else 0.0
    xpad = int(sys.argv[7]) if len(sys.argv) > 7 else 0
    momentum = mu if mu > 0 else None
    dims = (dim, dim, dim)
    rng = np.random.default_rng(0)
    tg = jax.device_put(rng.standard_normal(dims).astype(np.float32))
    live = jax.device_put(rng.standard_normal(dims).astype(np.float32))
    disp = jax.device_put(
        (rng.uniform(-1.5, 1.5, (3,) + dims)).astype(np.float32)
    )
    psi0 = jax.block_until_ready(fields.identity_field(dims) + disp)
    taps = tuple(float(t) for t in solver.sobolev_filter_1d(7, 0.1))
    alpha, w_reg = jnp.float32(1e-6), jnp.float32(0.2)
    tg_pad = pad_for_db(tg, xpad)
    live_pad = pad_for_db(live, xpad)
    xl = dim if xpad > dim else 0

    @jax.jit
    def run(n, psi, tnp):
        psi_p = pad_for_db(psi, xpad)
        tnp_p = pad_for_db(tnp, xpad)
        vel0 = (
            jnp.zeros(psi_p.shape[:-1] + (psi_p.shape[-1],), jnp.float32)[
                :, 4:-4, 4:-4, :
            ]
            if momentum is not None
            else None
        )

        def body(i, carry):
            psi_p, tnp_p, vel = carry
            psi_c, tnp_c, vel, _ = fused_gd_iteration_db_padded(
                psi_p, tnp_p, vel, tg_pad, live_pad, alpha, w_reg, taps,
                K=K, BZ=BZ, TY=TY, momentum=momentum,
                vmem_limit_mb=vmem_mb, x_logical=xl,
            )
            return refresh_padded(psi_p, psi_c), refresh_padded(tnp_p, tnp_c), vel

        out = jax.lax.fori_loop(0, n, body, (psi_p, tnp_p, vel0))
        return out[0]

    t0 = time.perf_counter()
    jax.block_until_ready(run(jnp.int32(2), psi0, live))
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)

    # loop-scaling pairs sized so the long run dominates contention stalls
    n_lo, n_hi = (4, 20) if dim < 200 else (10, 60)
    best = np.inf
    for _ in range(4):
        ts = {}
        for n in (n_lo, n_hi):
            t0 = time.perf_counter()
            jax.block_until_ready(run(jnp.int32(n), psi0, live))
            ts[n] = time.perf_counter() - t0
        d = (ts[n_hi] - ts[n_lo]) / (n_hi - n_lo)
        if d > 0:
            best = min(best, d)
    print(
        f"dim={dim} K={K} BZ={BZ} TY={TY} vmem={vmem_mb} mu={mu} xpad={xpad}: "
        f"per-iter {best * 1e3:.3f} ms "
        f"({dim ** 3 / best / 1e9:.2f} Gvoxel-iter/s)",
        flush=True,
    )


if __name__ == "__main__":
    main()
