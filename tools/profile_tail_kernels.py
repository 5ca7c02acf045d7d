"""Per-kernel timing of the 256^3 production-frame TAIL pieces.

The frame decomposition (profile_tails.py) shows tails+compose ~32 ms and
the warm inverse ~26 ms at 256^3. This times each tail kernel alone so the
op-cut work targets the right ones. Methodology: the op is chained N times
inside one jit (data-dependent, so XLA cannot elide the repeats), a scalar
of the result is fetched, and per-op time = (t_N - t_1) / (N - 1) — the
same loop-differencing bench.py uses (the axon tunnel's ~25 ms RTT and
dispatch cancel in the difference).

Usage: python tools/profile_tail_kernels.py [dim]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def chain_timed(label, op, arrs, n=16, reps=3):
    """op(x, *rest) -> array shaped like x; chained n times inside one jit
    (arrays passed as jit ARGUMENTS — closing over them would embed 64 MB
    constants in the HLO and blow the axon remote-compile size limit)."""

    @functools.partial(jax.jit, static_argnames=("reps",))
    def chain(x0, rest, reps):
        def body(i, x):
            return op(x, *rest)

        return jax.lax.fori_loop(0, reps, body, x0)

    x0, rest = arrs[0], tuple(arrs[1:])

    def run(r):
        out = chain(x0, rest, r)
        return float(jnp.asarray(out).reshape(-1)[0])

    run(1), run(n)  # compile
    best1 = bestN = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        run(1)
        best1 = min(best1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        run(n)
        bestN = min(bestN, time.perf_counter() - t0)
    per = (bestN - best1) / (n - 1)
    print(f"{label:50s} {per * 1e3:9.3f} ms/op", flush=True)
    return per


def main():
    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    from sobfu_tpu import fields
    from sobfu_tpu.ops.pallas_kernels import (
        estimate_inverse_window_pallas_multi,
        window_warp_pallas,
        window_warp_pallas_mixed,
    )

    dims = (dim,) * 3
    key = jax.random.PRNGKey(0)
    vol = jax.random.normal(key, dims, jnp.float32)
    wvol = jnp.abs(jax.random.normal(jax.random.fold_in(key, 1), dims))
    ident = fields.identity_field(dims)
    disp = 0.8 * jnp.tanh(
        jax.random.normal(jax.random.fold_in(key, 2), (3,) + dims)
    )
    psi = ident + disp

    # scalar-volume warps: chain by feeding the output back as the volume
    chain_timed(
        "t0: window_warp_pallas K=2",
        lambda x, p: window_warp_pallas(x, p, K=2),
        (vol, psi),
    )
    chain_timed(
        "wfloor: window_warp_pallas K=2 floor",
        lambda x, p: window_warp_pallas(x, p, K=2, floor=True),
        (wvol, psi),
    )

    def mixed_op(x, w, p):
        a, b = window_warp_pallas_mixed(x, w, p, K=2)
        return a + 0.0 * b

    chain_timed("mixed: tsdf+weight one pass K=2", mixed_op, (vol, wvol, psi))

    # compose: C=3 field sample; feed field back
    chain_timed(
        "compose: XLA C=3 field window K=1",
        lambda x, p: fields.sample_trilinear_window(x, p, max_disp=1),
        (psi, ident),
    )
    chain_timed(
        "compose: pallas per-channel C=3 K=1",
        lambda x, p: jnp.stack(
            [window_warp_pallas(x[c], p, K=1) for c in range(3)]
        ),
        (psi, ident),
    )

    # inverse: chain by feeding q back as init
    for iters, K in ((3, 2), (1, 2), (3, 1)):
        inv = functools.partial(
            estimate_inverse_window_pallas_multi, iters=iters, K=K
        )
        chain_timed(
            f"inv multi iters={iters} K={K}",
            lambda q, p, inv=inv: inv(p, init=q),
            (ident, psi),
            n=8,
        )
    from sobfu_tpu.solver import estimate_inverse_multigrid

    chain_timed(
        "inv multigrid c3+f1 K=2",
        lambda q, p: estimate_inverse_multigrid(p, iters=3, K=2, init=q),
        (ident, psi),
        n=8,
    )


if __name__ == "__main__":
    main()
