"""Loop-scaled timing of the PING-PONG fused GD iteration on TPU.

Usage: python tools/profile_fused_pp.py [dim] [K] [BZ] [TY] [mu] [xpad]
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
    fused_gd_iteration_pp,
    pad_for_pp,
    stack_live_shifts,
)


def main():
    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    BZ = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    TY = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    mu = float(sys.argv[5]) if len(sys.argv) > 5 else 0.0
    xpad = int(sys.argv[6]) if len(sys.argv) > 6 else 0
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
    stack = int(os.environ.get("PP_STACK", "1"))
    xmats = int(os.environ.get("PP_XMATS", "1"))
    tg_pad = pad_for_pp(tg, xpad)
    xl = dim if xpad > dim else 0
    live_pad = pad_for_pp(live, xpad)
    if stack:
        live_pad = stack_live_shifts(live_pad, K, xl)
    XP = xpad or dim

    @jax.jit
    def run(n, psi, tnp):
        psi_p = pad_for_pp(psi, xpad)
        tnp_p = pad_for_pp(tnp, xpad)
        vel0 = (
            jnp.zeros((3, dim, dim, XP), jnp.float32)
            if momentum is not None
            else None
        )

        def body(i, carry):
            psi_p, tnp_p, vel = carry
            psi_p, tnp_p, vel, _, _ = fused_gd_iteration_pp(
                psi_p, tnp_p, vel, tg_pad, live_pad, alpha, w_reg, taps,
                K=K, BZ=BZ, TY=TY, momentum=momentum, x_logical=xl,
                use_xmats=bool(xmats),
            )
            return psi_p, tnp_p, vel

        return jax.lax.fori_loop(0, n, body, (psi_p, tnp_p, vel0))[0]

    t0 = time.perf_counter()
    jax.block_until_ready(run(jnp.int32(2), psi0, live))
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)

    n_lo, n_hi = (4, 20) if dim < 200 else (10, 60)
    lo, hi = np.inf, np.inf
    for _ in range(5):
        for n in (n_lo, n_hi):
            t0 = time.perf_counter()
            jax.block_until_ready(run(jnp.int32(n), psi0, live))
            t = time.perf_counter() - t0
            if n == n_lo:
                lo = min(lo, t)
            else:
                hi = min(hi, t)
    best = (hi - lo) / (n_hi - n_lo)
    print(
        f"PP dim={dim} K={K} BZ={BZ} TY={TY} mu={mu} xpad={xpad} "
        f"stack={stack} xmats={xmats}: "
        f"per-iter {best * 1e3:.3f} ms "
        f"({dim ** 3 / best / 1e9:.2f} Gvoxel-iter/s)",
        flush=True,
    )


if __name__ == "__main__":
    main()
