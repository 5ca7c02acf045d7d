"""Device-trace the TAILS-ONLY production frame at 256^3 (variant C/E of
tools/profile_prod256.py: coarse_max_iter=0, max_iter=0) and print the
per-op device budget — pinpoints where the ~21 ms 'T0+compose+misc'
chunk goes.

Usage: python tools/profile_trace_tails.py [dim] [--levels1] [--noinv]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from profile_trace_frame import device_op_times, run_traced  # noqa: E402


def main():
    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    levels = 1 if "--levels1" in sys.argv else (3 if dim >= 256 else 2)
    inv_iters = 0 if "--noinv" in sys.argv else 3

    from sobfu_tpu import fields, solver
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
    ident = fields.identity_field(dims)

    kw = solver.production_pyramid_kwargs(dim)
    kw["levels"] = levels
    kw["inverse_iters"] = inv_iters
    if inv_iters == 0:
        kw["inv_coarse"] = False

    @jax.jit
    def run(live, psi_inv0):
        psi = fields.identity_field(dims)
        return solver.estimate_psi_pyramid(
            psi, tg, wg, live, wn, taps, jnp.float32(0.05),
            jnp.float32(0.2), jnp.int32(0), thresh,
            psi_inv0, coarse_max_iter=0,
            taps_static=taps_static, **kw,
        )

    prev_tn, _ = init_sphere(
        dims, (vs,) * 3, (0.5 - 0.6 * vs, 0.5, 0.5), 0.202, trunc, eta
    )
    inv_warm = run(prev_tn, ident).psi_inv
    jax.block_until_ready(inv_warm)
    res = run(tn, inv_warm)
    jax.block_until_ready(res.psi)

    log_dir = f"/tmp/sobfu_trace_tails_{dim}_{levels}_{inv_iters}"
    run_traced(lambda: run(tn, inv_warm), log_dir)

    agg = device_op_times(log_dir)
    total = sum(agg.values())
    print(f"# device total {total / 1e3:.2f} ms over {len(agg)} op names")
    for name, us in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{us / 1e3:9.3f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
