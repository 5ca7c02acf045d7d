"""Regenerate the golden regression files (CPU backend ONLY).

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python tests/golden/make_goldens.py

Regenerate ONLY for intentional semantic changes. Each dispatch path gets
its own frozen golden so a simultaneous drift of all paths (which the
cross-path equivalence tests cannot see) still fails the suite.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from sobfu_tpu import fields, solver
from sobfu_tpu.tsdf import init_sphere

OUT = os.path.dirname(os.path.abspath(__file__))


def fixture():
    dims = (16, 16, 16)
    vs = 0.25 / 16
    tg, wg = init_sphere(
        dims, (vs,) * 3, (0.125, 0.125, 0.125), 0.04, 8 * vs, 3 * vs
    )
    tn, wn = init_sphere(
        dims, (vs,) * 3, (0.118, 0.125, 0.125), 0.04, 8 * vs, 3 * vs
    )
    taps = jnp.asarray(solver.sobolev_filter_1d(7, 0.1))
    psi = fields.identity_field(dims)
    return psi, tg, wg, tn, wn, taps


def save(name, res):
    np.savez(
        os.path.join(OUT, name),
        psi=np.asarray(res.psi),
        tnp=np.asarray(res.tsdf_n_psi),
        psi_inv=np.asarray(res.psi_inv),
        max_norm=np.float32(res.max_norm),
    )
    print("wrote", name)


def main():
    assert jax.devices()[0].platform == "cpu", "goldens are CPU-only"
    psi, tg, wg, tn, wn, taps = fixture()
    args = (psi, tg, wg, tn, wn, taps, jnp.float32(0.1), jnp.float32(0.3),
            jnp.int32(32), jnp.float32(-1.0))

    # exact-gather path (the original golden; kept byte-compatible)
    save("solver_16.npz", solver.estimate_psi(*args, inverse_iters=8))
    # windowed-warp path (production sampler semantics)
    save(
        "solver_16_window.npz",
        solver.estimate_psi(*args, inverse_iters=8, warp_window=2),
    )
    # z-chunked dispatch
    save(
        "solver_16_chunked.npz",
        solver.estimate_psi_chunked(
            *args, n_chunks=4, warp_window=2, inverse_iters=8
        ),
    )
    # compositive mode (incremental-inverse production path)
    save(
        "solver_16_compositive.npz",
        solver.estimate_psi_compositive(
            *args, warp_window=2, inverse_iters=8
        ),
    )
    # coarse-to-fine pyramid
    save(
        "solver_16_pyramid.npz",
        solver.estimate_psi_pyramid(
            *args, levels=2, warp_window=2, inverse_iters=8
        ),
    )


if __name__ == "__main__":
    main()
