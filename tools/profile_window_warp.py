"""Loop-scaled timing of the window warp vs gather warp on TPU."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sobfu_tpu import fields, solver


def loop_time(body, init, n_lo=4, n_hi=20, label=""):
    @jax.jit
    def run(n, init):
        return jax.lax.fori_loop(0, n, body, init)

    try:
        t0 = time.perf_counter()
        jax.block_until_ready(run(jnp.int32(n_lo), init))
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.block_until_ready(run(jnp.int32(n_lo), init))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.block_until_ready(run(jnp.int32(n_hi), init))
        t_hi = time.perf_counter() - t0
        per = (t_hi - t_lo) / (n_hi - n_lo)
        print(f"{label:28s} per-iter {per * 1e3:9.3f} ms (compile {t_compile:.1f}s)", flush=True)
        return per
    except Exception as e:  # noqa: BLE001
        print(f"{label:28s} FAIL: {str(e)[:160]}", flush=True)
        return float("nan")


def main():
    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    dims = (dim, dim, dim)
    rng = np.random.default_rng(0)
    vol = jax.device_put(rng.standard_normal(dims).astype(np.float32))
    disp = jax.device_put((rng.uniform(-2, 2, (3,) + dims)).astype(np.float32))
    psi0 = jax.block_until_ready(fields.identity_field(dims) + disp)
    tg = jax.device_put(rng.standard_normal(dims).astype(np.float32))
    taps = jnp.asarray(solver.sobolev_filter_1d(7, 0.1))
    alpha, w_reg = jnp.float32(1e-6), jnp.float32(0.2)
    print(f"=== dim {dim} ===", flush=True)

    for K in (2, 4):
        loop_time(
            lambda i, p, K=K: p + 1e-12 * fields.sample_trilinear_window(vol, p, K),
            psi0,
            label=f"window warp K={K}",
        )

    def gd(K):
        def body(i, carry):
            psi, tnp = carry
            grad = fields.tsdf_gradient(tnp)
            lap = fields.neg_laplacian(psi)
            dU = (tnp - tg)[None] * grad + w_reg * lap
            dU_S = solver.sobolev_smooth(dU, taps)
            psi = psi - alpha * dU_S
            tnp = fields.sample_trilinear_window(vol, psi, K)
            return psi, tnp

        return body

    for K in (2, 4):
        loop_time(gd(K), (psi0, vol), label=f"full gd step win K={K}")


if __name__ == "__main__":
    main()
