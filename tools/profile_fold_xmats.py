"""64^3 headline experiment: fold-kernel x-operators on the MXU.

STATUS round-4 gap 2: the fold body's x-conv pays a roll+edge-fix per tap
(~35 VPU ops/channel); the x central/second differences pay 2 more rolls
per channel. This measures fused_gd_multi_fold with use_xmats=True — the
lane-axis conv/diff ops as block-diagonal (128,128) MXU matmuls
(_x_matrices_fold) — against the shipped VPU path, and reports the max
state difference after a chunk (MXU f32 matmul is not bit-identical to
the FMA tap loop; the difference must sit at f32 round-off).

Usage: python tools/profile_fold_xmats.py [n_chunks]
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
    n_chunks = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    dim = 64
    n_inner = 16

    from sobfu_tpu import fields, solver
    from sobfu_tpu.ops.pallas_kernels import (
        fold_y,
        fused_gd_multi_fold,
        pad_for_fold,
        pad_folded,
    )
    from sobfu_tpu.tsdf import init_sphere

    vs = 1.0 / dim
    dims = (dim,) * 3
    trunc, eta = 8.0 * vs, 3.0 * vs
    tg, _ = init_sphere(dims, (vs,) * 3, (0.5, 0.5, 0.5), 0.20, trunc, eta)
    tn, _ = init_sphere(
        dims, (vs,) * 3, (0.5 - 0.38 * vs, 0.5, 0.5), 0.201, trunc, eta
    )
    taps_static = tuple(
        float(t) for t in np.asarray(solver.sobolev_filter_1d(7, 0.1))
    )
    ident = fields.identity_field(dims)

    tg_pad = pad_for_fold(tg)
    live_pad = pad_for_fold(tn)
    psi_pad0 = pad_folded(fold_y(ident))
    tnp_pad0 = pad_for_fold(tn)
    vel0 = jnp.zeros((3, dim, dim // 2, 128), jnp.float32)

    def make(use_xmats, K=1, precision=None):
        def chunks(psi_pad, tnp_pad, vel):
            def body(_, carry):
                p, t, v = carry
                p2, t2, v2, _, _ = fused_gd_multi_fold(
                    p, t, v, tg_pad, live_pad,
                    jnp.float32(0.1), jnp.float32(0.2), taps_static,
                    K=K, n_inner=n_inner, momentum=0.95,
                    use_xmats=use_xmats, xmats_precision=precision,
                )
                return p2, t2, v2
            return jax.lax.fori_loop(
                0, n_chunks, body, (psi_pad, tnp_pad, vel)
            )
        return jax.jit(chunks)

    runs = {}
    for name, fn in [
        ("vpu", make(False)),
        ("mxu", make(True)),
        ("mxu_highest", make(True, precision=jax.lax.Precision.HIGHEST)),
    ]:
        out = fn(psi_pad0, tnp_pad0, vel0)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            out = fn(psi_pad0, tnp_pad0, vel0)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        per_iter = best / (n_chunks * n_inner)
        runs[name] = (per_iter, out)
        print(f"{name}: {per_iter * 1e3:7.4f} ms/iter "
              f"({1.0 / (per_iter * 2048):.2f} fps @2048 iters)", flush=True)

    for name in ("mxu", "mxu_highest"):
        dpsi = float(jnp.max(jnp.abs(runs["vpu"][1][0] - runs[name][1][0])))
        print(f"{name}: max |psi - vpu| after {n_chunks * n_inner} iters: "
              f"{dpsi:.3e} vox; speedup "
              f"{runs['vpu'][0] / runs[name][0]:.3f}x")


if __name__ == "__main__":
    main()
