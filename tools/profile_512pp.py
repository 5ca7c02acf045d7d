"""512^3 single-chip: fused ping-pong Pallas GD path, per-iteration cost.

Round-4 shipped the z-slab SCAN solve (estimate_psi_zscan) as the only
512^3 single-chip engine (253-257 ms/iter — scan-serialized slab
dispatches, STATUS gap). This measures the fused pp kernel path
(estimate_psi fused_db=True) at 512^3 directly: the Mosaic kernel binary
is TILE-sized, so grid growth should cost compile time only through the
surrounding XLA program. Projection from 256^3 (5.5 ms/iter fused pp,
K=2): ~44 ms/iter at 512^3 — under the <=100 ms round-4 VERDICT target.

HBM budget at 512^3 (f32 channel-volume = 512 MB): psi_pad 3ch 1.6 GB +
vel 1.5 GB + tnp_pad 0.55 + tg_pad 0.55 + live_pad 0.55 + transient
pad sources ~2 GB peak ==> ~7 GB of the chip's 16 GB.

Usage: python tools/profile_512pp.py [dim] [momentum 0|1]
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
    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    mom = 0.9 if (len(sys.argv) < 3 or sys.argv[2] == "1") else None

    from sobfu_tpu import fields, solver
    from sobfu_tpu.tsdf import init_sphere

    vs = 1.0 / dim
    dims = (dim,) * 3
    tg, _ = init_sphere(dims, (vs,) * 3, (0.5, 0.5, 0.5), 0.20,
                        8 * vs, 3 * vs)
    tn, _ = init_sphere(dims, (vs,) * 3, (0.5 - 1.3 * vs, 0.5, 0.5),
                        0.205, 8 * vs, 3 * vs)
    taps = jnp.asarray(solver.sobolev_filter_1d(7, 0.1))
    taps_static = tuple(float(t) for t in np.asarray(taps))
    jax.block_until_ready(tn)
    print(f"volumes ready ({dim}^3), momentum={mom}", flush=True)

    def go(n):
        psi = fields.identity_field(dims)
        t0 = time.perf_counter()
        res = solver.estimate_psi(
            psi, tg, tg, tn, tn, taps,
            jnp.float32(0.05), jnp.float32(0.2),
            jnp.int32(n), jnp.float32(-1.0),
            skip_tails=True,
            warp_window=2,
            momentum=mom,
            fused_db=True,
            taps_static=taps_static,
        )
        mn = float(res.max_norm)
        dt = time.perf_counter() - t0
        assert np.isfinite(mn), "non-finite update norm"
        return dt

    t0 = time.perf_counter()
    print(f"compile+2it: {go(2):.1f} s "
          f"(incl. compile {time.perf_counter() - t0:.0f} s)", flush=True)
    best = float("inf")
    for _ in range(3):
        lo, hi = go(2), go(6)
        best = min(best, (hi - lo) / 4)
        print(f"  pair: lo {lo:.2f} s hi {hi:.2f} s "
              f"-> {(hi - lo) / 4 * 1e3:.1f} ms/iter", flush=True)
    print(f"per_iter_ms_{dim}cubed_pp: {best * 1e3:.1f}")


if __name__ == "__main__":
    main()
