"""Device-rate measurement of the production 256^3 solve: N frames per
dispatch via lax.scan.

The steady-state 4-frame queue still pays a HOST ENQUEUE per frame; on
the tunneled pool chip that serializes ~5-7 ms/frame of non-device time
into the wall clock (device trace of the tails-only frame: 12.3 ms of
device ops vs 19.1 ms wall). A production serving host dispatches the
next frame while the previous runs — and a local (non-tunneled) host
pays microseconds, not milliseconds, to enqueue. Scanning N frames
inside ONE jitted dispatch removes the per-frame enqueue entirely and
measures what the CHIP sustains.

Honesty guards:
  - every frame gets a DIFFERENT live volume AND a different canonical
    (both are scan xs), so XLA cannot hoist per-frame work (pyramid
    build, pads, warps) out of the loop;
  - the inverse warm start is the scan carry, exactly the production
    frame-to-frame contract.

Usage: python tools/profile_scan_frames.py [dim] [nframes]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    nf = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from sobfu_tpu import fields, solver
    from sobfu_tpu.solver import data_energy
    from sobfu_tpu.tsdf import init_sphere

    vs = 1.0 / dim
    dims = (dim,) * 3
    trunc, eta = 8.0 * vs, 3.0 * vs
    taps = jnp.asarray(solver.sobolev_filter_1d(7, 0.1))
    taps_static = tuple(float(t) for t in np.asarray(taps))
    thresh = jnp.float32(4e-3 * dim / 128.0)
    kw = solver.production_pyramid_kwargs(dim)

    def solve(tg, live, psi_inv0):
        psi = fields.identity_field(dims)
        return solver.estimate_psi_pyramid(
            psi, tg, tg, live, live, taps, jnp.float32(0.05),
            jnp.float32(0.2), jnp.int32(1024), thresh, psi_inv0,
            taps_static=taps_static, **kw,
        )

    # nf frames: oscillating sphere (distinct live AND canonical per frame)
    tgs, lives = [], []
    for i in range(nf):
        sh = (0.9 + 0.1 * (i % 3)) * 1.3 * vs
        tg_i, _ = init_sphere(
            dims, (vs,) * 3, (0.5 + 0.05 * vs * i, 0.5, 0.5), 0.20,
            trunc, eta,
        )
        tn_i, _ = init_sphere(
            dims, (vs,) * 3, (0.5 - sh, 0.5, 0.5), 0.205, trunc, eta
        )
        tgs.append(tg_i)
        lives.append(tn_i)
    tgs = jnp.stack(tgs)
    lives = jnp.stack(lives)

    @jax.jit
    def frames(tgs, lives, inv0):
        def body(inv, xs):
            tg_i, live_i = xs
            res = solve(tg_i, live_i, inv)
            return res.psi_inv, (res.iters, data_energy(tg_i, res.tsdf_n_psi))
        inv_f, (iters, es) = jax.lax.scan(body, inv0, (tgs, lives))
        return inv_f, iters, es

    # warm carry: one solve produces the production half-res (inv_coarse)
    # psi_inv shape
    ident = fields.identity_field(dims)
    inv_warm = jax.jit(solve)(tgs[0], lives[0], ident).psi_inv
    jax.block_until_ready(inv_warm)
    print(f"warm inv carry shape: {inv_warm.shape}", flush=True)

    out = frames(tgs, lives, inv_warm)
    jax.block_until_ready(out[0])
    iters, es = np.asarray(out[1]), np.asarray(out[2])
    print(f"iters/frame: {iters.tolist()}  e_final: {np.round(es, 1).tolist()}",
          flush=True)

    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        out = frames(tgs, lives, inv_warm)
        jax.block_until_ready(out[0])
        best = min(best, (time.perf_counter() - t0) / nf)
    print(
        f"scan({nf}) per-frame: {best * 1e3:.2f} ms = {1.0 / best:.1f} fps "
        f"(device-rate, one dispatch for all {nf} frames)",
        flush=True,
    )


if __name__ == "__main__":
    main()
