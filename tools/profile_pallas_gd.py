"""Loop-scaled timing of the fused Pallas GD step on TPU."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sobfu_tpu import fields, solver
from sobfu_tpu.ops.pallas_kernels import fused_gd_step


def main():
    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    BZ = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    TY = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    dims = (dim, dim, dim)
    rng = np.random.default_rng(0)
    tg = jax.device_put(rng.standard_normal(dims).astype(np.float32))
    live = jax.device_put(rng.standard_normal(dims).astype(np.float32))
    disp = jax.device_put((rng.uniform(-1.5, 1.5, (3,) + dims)).astype(np.float32))
    psi0 = jax.block_until_ready(fields.identity_field(dims) + disp)
    taps = tuple(float(t) for t in solver.sobolev_filter_1d(7, 0.1))
    alpha, w_reg = jnp.float32(1e-6), jnp.float32(0.2)

    @jax.jit
    def run(n, psi, tnp):
        def body(i, carry):
            psi, tnp = carry
            psi, tnp, _ = fused_gd_step(
                psi, tnp, tg, live, alpha, w_reg, taps, K=K, BZ=BZ, TY=TY
            )
            return psi, tnp
        return jax.lax.fori_loop(0, n, body, (psi, tnp))

    t0 = time.perf_counter()
    out = run(jnp.int32(4), psi0, live)
    jax.block_until_ready(out[0])
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)
    # correctness spot check vs XLA step
    psi1, tnp1, _ = fused_gd_step(psi0, live, tg, live, alpha, w_reg, taps, K=K, BZ=BZ, TY=TY)
    grad = fields.tsdf_gradient(live)
    lap = fields.neg_laplacian(psi0)
    dU = (live - tg)[None] * grad + w_reg * lap
    dU_S = solver.sobolev_smooth(dU, jnp.asarray(taps))
    psi_ref = psi0 - alpha * dU_S
    err = float(jnp.max(jnp.abs(psi1 - psi_ref)))
    print(f"psi err vs XLA: {err:.2e}", flush=True)

    times = {}
    for n in (4, 20):
        t0 = time.perf_counter()
        out = run(jnp.int32(n), psi0, live)
        jax.block_until_ready(out[0])
        times[n] = time.perf_counter() - t0
    per = (times[20] - times[4]) / 16
    print(
        f"dim={dim} K={K} BZ={BZ} TY={TY or dim}: per-iter {per * 1e3:.3f} ms "
        f"({dim ** 3 / per / 1e9:.2f} Gvoxel-iter/s)",
        flush=True,
    )


if __name__ == "__main__":
    main()
