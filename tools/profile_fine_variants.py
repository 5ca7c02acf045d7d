"""256^3 production fine-level variants, steady-state.

The prod256 decomposition shows the frame is tails-dominated: with the
coarse pyramid absorbing the bulk motion the fine level converges in few
iterations, so the compositive machinery's fixed overhead (T0 warp +
final compose_weight, ~7 ms) can exceed what the K=1 in-loop warp saves.
Variants:

  P1  fine_window=1 (compositive fine)            — shipped r3/r4 config
  P2  P1 + inv_coarse (half-res inverse carry)
  P3  fine_window=None (ADDITIVE K=2 fine) + inv_multigrid + inv_coarse
  P4  P3 without inv_coarse

Also prints iters and final data energy (the quality guard: all variants
must land at the same energy plateau).

Usage: python tools/profile_fine_variants.py [dim] [P5,P6]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def steady(label, fn, queue=4, reps=3):
    out = fn()
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        rs = [fn() for _ in range(queue)]
        jax.block_until_ready(rs[-1])
        best = min(best, (time.perf_counter() - t0) / queue)
    print(f"{label:44s} {best * 1e3:9.2f} ms  ({1000.0 / (best * 1e3):5.1f} fps)",
          flush=True)
    return best


def main():
    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 256

    from sobfu_tpu import fields, solver
    from sobfu_tpu.solver import data_energy
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

    def make(fine_window, inv_coarse, fold_xmats=False, lv=None):
        def _run(live, psi_inv0):
            psi = fields.identity_field(dims)
            return solver.estimate_psi_pyramid(
                psi, tg, wg, live, wn, taps, jnp.float32(0.05),
                jnp.float32(0.2), jnp.int32(1024), thresh,
                psi_inv0, levels=lv or levels,
                warp_window=2, momentum=0.95, fine_window=fine_window,
                stall_window=16, stall_rel=1e-2,
                fused_db=True, taps_static=taps_static, conv_mxu=True,
                inverse_iters=3, skip_inv_warps=True,
                inv_multigrid=dim >= 128,
                inv_coarse=inv_coarse and dim >= 128,
                fold_xmats=fold_xmats,
            )
        return jax.jit(_run)

    prev_tn, _ = init_sphere(
        dims, (vs,) * 3, (0.5 - 0.6 * vs, 0.5, 0.5), 0.202, trunc, eta
    )

    variants = [
        ("P1 compositive fine", make(1, False)),
        ("P2 compositive fine + inv_coarse", make(1, True)),
        ("P3 additive fine + inv_coarse", make(None, True)),
        ("P4 additive fine", make(None, False)),
        ("P5 P3 + fold_xmats coarse", make(None, True, fold_xmats=True)),
        ("P6 P5 + one more pyramid level",
         make(None, True, fold_xmats=True, lv=(4 if dim >= 256 else 3))),
    ]
    if len(sys.argv) > 2:
        keep = set(sys.argv[2].split(","))
        variants = [(n, r) for n, r in variants if n.split()[0] in keep]
    for name, run in variants:
        inv_warm = run(prev_tn, ident).psi_inv
        jax.block_until_ready(inv_warm)
        res = run(tn, inv_warm)
        e = float(data_energy(tg, res.tsdf_n_psi))
        print(f"{name}: iters={int(res.iters)} e_final={e:.1f}", flush=True)
        steady(name, lambda: run(tn, inv_warm))


if __name__ == "__main__":
    main()
