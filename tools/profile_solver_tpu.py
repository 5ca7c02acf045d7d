"""Loop-scaled per-op profiling of the solver on TPU.

One-off op timings through the axon tunnel are unreliable (async dispatch
reports ready early); timing a fori_loop at two iteration counts and taking
the difference isolates true per-iteration cost.

Usage: python tools/profile_solver_tpu.py [dim]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sobfu_tpu import fields, solver


def loop_time(build_body, init, n_lo=4, n_hi=20, label=""):
    """Per-iteration seconds of body via (t(n_hi) - t(n_lo)) / (n_hi - n_lo)."""

    @jax.jit
    def run(n, init):
        return jax.lax.fori_loop(0, n, build_body, init)

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
        print(
            f"{label:24s} per-iter {per * 1e3:9.3f} ms   "
            f"(compile+first {t_compile:.1f}s)",
            flush=True,
        )
        return per
    except Exception as e:  # noqa: BLE001
        print(f"{label:24s} FAIL: {str(e)[:160]}", flush=True)
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
    alpha = jnp.float32(1e-6)
    w_reg = jnp.float32(0.2)
    print(f"=== dim {dim} ===", flush=True)

    # 1. pure warp
    loop_time(
        lambda i, p: p + 1e-12 * fields.sample_trilinear(vol, p),
        psi0,
        label="warp(gather)",
    )

    # 2. gradient stencil
    loop_time(
        lambda i, v: v + 1e-12 * fields.tsdf_gradient(v[0])[0] if False else
        v + 1e-12 * jnp.sum(fields.tsdf_gradient(v), axis=0),
        vol,
        label="grad stencil",
    )

    # 3. laplacian
    loop_time(
        lambda i, p: p + 1e-12 * fields.neg_laplacian(p),
        psi0,
        label="laplacian",
    )

    # 4. sobolev conv (3 channels x 3 axes)
    loop_time(
        lambda i, p: p + 1e-12 * solver.sobolev_smooth(p, taps),
        psi0,
        label="sobolev conv3x3",
    )

    # 5. full gd step
    def gd(i, carry):
        psi, tnp = carry
        grad = fields.tsdf_gradient(tnp)
        lap = fields.neg_laplacian(psi)
        dU = (tnp - tg)[None] * grad + w_reg * lap
        dU_S = solver.sobolev_smooth(dU, taps)
        psi = psi - alpha * dU_S
        tnp = fields.sample_trilinear(vol, psi)
        return psi, tnp

    loop_time(gd, (psi0, vol), label="full gd step")

    # 6. gd without conv
    def gd_noconv(i, carry):
        psi, tnp = carry
        grad = fields.tsdf_gradient(tnp)
        lap = fields.neg_laplacian(psi)
        dU = (tnp - tg)[None] * grad + w_reg * lap
        psi = psi - alpha * dU
        tnp = fields.sample_trilinear(vol, psi)
        return psi, tnp

    loop_time(gd_noconv, (psi0, vol), label="gd minus conv")

    # 7. gd without warp
    def gd_nowarp(i, carry):
        psi, tnp = carry
        grad = fields.tsdf_gradient(tnp)
        lap = fields.neg_laplacian(psi)
        dU = (tnp - tg)[None] * grad + w_reg * lap
        dU_S = solver.sobolev_smooth(dU, taps)
        psi = psi - alpha * dU_S
        tnp = tnp + 1e-12 * psi[0]
        return psi, tnp

    loop_time(gd_nowarp, (psi0, vol), label="gd minus warp")


if __name__ == "__main__":
    main()
