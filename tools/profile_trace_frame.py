"""Device-trace breakdown of the production convergence frame.

Runs the EXACT production frame (bench fps_at_convergence config) once
under jax.profiler and aggregates per-op device time from the emitted
perfetto trace — the ground truth the in-jit differencing tools
(profile_injit.py / profile_tails.py) approximate. Use this to see which
individual kernels/fusions the tail budget actually goes to.

Usage: python tools/profile_trace_frame.py [dim] [--iters N]
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def run_traced(fn, log_dir):
    from sobfu_tpu import core

    with core.profile_trace(log_dir):
        out = fn()
        jax.block_until_ready(out)
    return out


def device_op_times(log_dir):
    """Aggregate device-lane op durations (us) by name from the newest
    perfetto trace under log_dir."""
    paths = sorted(
        glob.glob(os.path.join(log_dir, "**", "*.trace.json.gz"),
                  recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        raise FileNotFoundError(f"no trace under {log_dir}")
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device lanes: pid whose process_name metadata mentions TPU/device
    dev_pids = set()
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            name = ev.get("args", {}).get("name", "")
            if "TPU" in name or "/device" in name.lower():
                dev_pids.add(ev["pid"])
    agg = defaultdict(float)
    for ev in events:
        if ev.get("ph") == "X" and ev.get("pid") in dev_pids:
            agg[ev.get("name", "?")] += ev.get("dur", 0.0)
    return agg


def main():
    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    cap = 1024
    if "--iters" in sys.argv:
        cap = int(sys.argv[sys.argv.index("--iters") + 1])

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
    levels = 3 if dim >= 256 else 2
    ident = fields.identity_field(dims)

    @jax.jit
    def run(live, psi_inv0):
        psi = fields.identity_field(dims)
        return solver.estimate_psi_pyramid(
            psi, tg, wg, live, wn, taps, jnp.float32(0.05),
            jnp.float32(0.2), jnp.int32(cap), thresh,
            psi_inv0, levels=levels,
            warp_window=2, momentum=0.95, fine_window=1,
            stall_window=16, stall_rel=1e-2,
            fused_db=True, taps_static=taps_static, conv_mxu=True,
            inverse_iters=3, skip_inv_warps=True,
            inv_multigrid=dim >= 128,
        )

    prev_tn, _ = init_sphere(
        dims, (vs,) * 3, (0.5 - 0.6 * vs, 0.5, 0.5), 0.202, trunc, eta
    )
    inv_warm = run(prev_tn, ident).psi_inv
    jax.block_until_ready(inv_warm)
    res = run(tn, inv_warm)  # warm both input signatures
    jax.block_until_ready(res.psi)
    print(f"# iters={int(res.iters)}", flush=True)

    log_dir = f"/tmp/sobfu_trace_{dim}"
    run_traced(lambda: run(tn, inv_warm), log_dir)

    agg = device_op_times(log_dir)
    total = sum(agg.values())
    print(f"# device total {total / 1e3:.2f} ms over {len(agg)} op names")
    for name, us in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{us / 1e3:9.3f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
