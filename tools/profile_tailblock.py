"""Per-op attribution of the production frame's FIXED tail block at 256^3.

profile_prod256 variant C (coarse 0, max_iter 0) measured ~18.4 ms —
55% of the 33.4 ms frame. Each candidate below is timed as its own jit,
steady-state (4-deep queue, min of reps), so the numbers attribute that
block op by op:

  init window warp (K=2, 256^3)      estimate_psi tsdf_n_psi0
  weight floor warp                  estimate_psi tail weight_n_psi
  inverse multigrid warm-3 coarse    estimate_psi tail (inv_coarse)
  pyramid build (tg+tn down x2)      estimate_psi_pyramid head
  disp resample down + 2x up         pyramid plumbing
  pad block (tg, live, psi, tnp)     fused pp state preparation
  vel zeros (padded)                 momentum state init
  unpad block (psi + tnp)            fused pp state extraction
  fuse_volumes                       pipeline fuse stage
  integrate_dists                    pipeline ingest stage

Usage: python tools/profile_tailblock.py [dim]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


_BASE = [0.0]


def _fetch(out):
    """Force completion: materialise ONE scalar from the last output leaf
    (block_until_ready on the tunneled backend returns early for pallas
    custom-call outputs; a scalar device_get cannot)."""
    leaf = jax.tree_util.tree_leaves(out)[-1]
    return float(jnp.asarray(leaf).reshape(-1)[0])


def steady(label, fn, queue=16, reps=3):
    out = fn()
    _fetch(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        rs = [fn() for _ in range(queue)]
        _fetch(rs[-1])
        best = min(best, (time.perf_counter() - t0) / queue)
    best = max(0.0, best - _BASE[0])
    print(f"{label:44s} {best * 1e3:8.2f} ms", flush=True)
    return best


def main():
    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 256

    from sobfu_tpu import fields, solver
    from sobfu_tpu.ops.pallas_kernels import (
        pad_for_pp,
        unpad_pp,
        window_warp_pallas,
    )
    from sobfu_tpu.tsdf import fuse_volumes, init_sphere, integrate_dists

    vs = 1.0 / dim
    dims = (dim,) * 3
    trunc, eta = 8.0 * vs, 3.0 * vs
    tg, wg = init_sphere(dims, (vs,) * 3, (0.5, 0.5, 0.5), 0.20, trunc, eta)
    tn, wn = init_sphere(
        dims, (vs,) * 3, (0.5 - 1.3 * vs, 0.5, 0.5), 0.205, trunc, eta
    )
    ident = fields.identity_field(dims)
    # a production-shaped psi: smooth ~1-voxel displacement
    zz = jnp.linspace(0, np.pi, dim)
    bump = 0.9 * jnp.sin(zz)[None, :, None, None] * jnp.ones((3,) + dims)
    psi = ident + bump.astype(jnp.float32)
    psi_h = fields.identity_field(tuple(d // 2 for d in dims)) + 0.45

    K = 2

    # null baseline: per-dispatch + fetch floor, subtracted from every row
    j_null = jax.jit(lambda x: x + 1.0)
    x0 = jnp.zeros((8, 128), jnp.float32)
    null = steady("null op (dispatch+fetch floor)", lambda: j_null(x0))
    _BASE[0] = null

    j_warp = jax.jit(lambda v, p: window_warp_pallas(v, p, K=K))
    steady("init window warp K=2 (tri)", lambda: j_warp(tn, psi))
    j_warpf = jax.jit(lambda v, p: window_warp_pallas(v, p, K=K, floor=True))
    steady("weight floor warp", lambda: j_warpf(wn, psi))

    j_inv = jax.jit(
        lambda p, q0: solver.estimate_inverse_multigrid(
            p, iters=3, K=K, init=q0, fine_iters=0, return_coarse=True
        )
    )
    steady("inverse multigrid warm-3 (coarse carry)", lambda: j_inv(psi, psi_h))

    j_pyr = jax.jit(
        lambda a, b: (
            solver._downsample2(a),
            solver._downsample2(b),
            solver._downsample2(solver._downsample2(a)),
            solver._downsample2(solver._downsample2(b)),
        )
    )
    steady("pyramid build (tg+tn down x2 levels)", lambda: j_pyr(tg, tn))

    half = tuple(d // 2 for d in dims)
    j_rs = jax.jit(
        lambda d: solver._resample_disp(
            solver._resample_disp(d, half, 0.5), dims, 2.0
        )
    )
    steady("disp resample down+up (3ch)", lambda: j_rs(psi - ident))

    j_pad = jax.jit(
        lambda a, b, c, d: (
            pad_for_pp(a), pad_for_pp(b), pad_for_pp(c), pad_for_pp(d)
        )
    )
    steady("pad block (tg + live + psi3 + tnp)", lambda: j_pad(tg, tn, psi, tn))

    from sobfu_tpu.ops.pallas_kernels import _HP

    vdims = (3, dim + 2 * _HP, dim + 2 * _HP, dim)
    j_zero = jax.jit(lambda: jnp.zeros(vdims, jnp.float32))
    steady("vel zeros (padded 3ch)", j_zero)

    psi_pad = jax.jit(pad_for_pp)(psi)
    tnp_pad = jax.jit(pad_for_pp)(tn)
    j_unpad = jax.jit(lambda a, b: (unpad_pp(a), unpad_pp(b)))
    steady("unpad block (psi3 + tnp)", lambda: j_unpad(psi_pad, tnp_pad))

    j_fuse = jax.jit(
        lambda a, b, c, d: fuse_volumes(a, b, c, d, jnp.float32(64.0))
    )
    steady("fuse_volumes", lambda: j_fuse(tg, wg, tn, wn))

    H, W = 240, 320
    intr = jnp.asarray([250.0, 250.0, W / 2 - 0.5, H / 2 - 0.5], jnp.float32)
    dists = jnp.ones((H, W), jnp.float32) * 0.45
    v2c = jnp.eye(4, dtype=jnp.float32)
    vsz = jnp.asarray([vs, vs, vs], jnp.float32)
    zeros = jnp.zeros(dims, jnp.float32)
    j_int = jax.jit(
        lambda d: integrate_dists(
            zeros, zeros, d, v2c, intr, vsz,
            jnp.float32(trunc), jnp.float32(eta), dims
        )
    )
    steady("integrate_dists", lambda: j_int(dists))


if __name__ == "__main__":
    main()
