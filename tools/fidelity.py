"""Fidelity harness: quantitative reconstruction checks against analytic
oracles (SURVEY.md §7 step 9).

The reference validates its solver by eyeballing energies on analytic SDF
scenes (test/solver_test.cpp has no assertions). This harness runs the same
scenario classes end-to-end and MEASURES:

  * mesh RMSE: distance of reconstructed isosurface vertices from the true
    analytic surface,
  * data-energy reduction through the solve,
  * psi <-> psi_inv consistency (composition ~ identity),

and prints a JSON report. Runs on any backend (CPU or TPU).

Usage: python tools/fidelity.py [--dim 64] [--iters 256]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import sys

import jax

# If the env names a backend whose plugin is not registered (e.g.
# JAX_PLATFORMS=axon left set while the pool override is unset), fall back
# to automatic platform selection.
try:
    jax.devices()
except RuntimeError:
    jax.config.update("jax_platforms", "")

import jax.numpy as jnp
import numpy as np

from sobfu_tpu import fields, mc, solver
from sobfu_tpu.config import Params
from sobfu_tpu.tsdf import TsdfVolume


def make_params(dim, size, iters, alpha=0.1, w_reg=0.4):
    p = Params()
    p.volume_dims = (dim, dim, dim)
    p.volume_size = (size, size, size)
    p.tsdf_trunc_dist = 10.0 * size / dim
    p.eta = 2.0 * size / dim
    p.max_iter = iters
    p.max_update_norm = -1.0
    p.alpha = alpha
    p.w_reg = w_reg
    return p


def solve(p, phi_global, phi_n, warp_window=None):
    taps = jnp.asarray(solver.sobolev_filter_1d(p.s, p.lambda_))
    psi = fields.identity_field(phi_global.dims_zyx)
    return solver.estimate_psi(
        psi, phi_global.tsdf, phi_global.weight, phi_n.tsdf, phi_n.weight,
        taps, jnp.float32(p.alpha), jnp.float32(p.w_reg),
        jnp.int32(p.max_iter), jnp.float32(p.max_update_norm),
        inverse_iters=48, warp_window=warp_window,
    )


def mesh_rmse_sphere(tsdf, weight, voxel_sizes, centre, radius):
    """RMSE of isosurface vertex distances from an analytic sphere."""
    m = mc.extract_mesh(tsdf, weight, voxel_sizes, flip_yz=False)
    if m.vertices.shape[0] == 0:
        return float("nan"), 0
    d = np.linalg.norm(m.vertices - np.asarray(centre), axis=1) - radius
    return float(np.sqrt(np.mean(d * d))), int(m.n_triangles)


def scenario_sphere_translation(dim, iters, warp_window):
    size = 0.25 * dim / 64
    p = make_params(dim, size, iters)
    c0 = (size / 2, size / 2, size / 2)
    shift = 2.5 * size / dim  # 2.5 voxels
    c1 = (c0[0] - shift, c0[1], c0[2])
    r = 0.04 * size / 0.25

    phi_g = TsdfVolume(p)
    phi_g.init_sphere(c0, r)
    phi_n = TsdfVolume(p)
    phi_n.init_sphere(c1, r)

    e0 = float(solver.data_energy(phi_g.tsdf, phi_n.tsdf))
    res = solve(p, phi_g, phi_n, warp_window)
    e1 = float(solver.data_energy(phi_g.tsdf, res.tsdf_n_psi))

    rmse, ntri = mesh_rmse_sphere(
        res.tsdf_n_psi, res.weight_n_psi, p.voxel_sizes(), c0, r
    )

    comp = fields.sample_trilinear_window(
        fields.displacement(res.psi), res.psi_inv, 4
    ) + fields.displacement(res.psi_inv)
    inner = np.asarray(comp)[:, 4:-4, 4:-4, 4:-4]

    return {
        "scenario": "sphere_translation_2.5vox",
        "dim": dim,
        "iters_run": int(res.iters),
        "energy_before": e0,
        "energy_after": e1,
        "energy_ratio": e1 / e0 if e0 else None,
        "mesh_rmse_m": rmse,
        "mesh_rmse_voxels": rmse / (size / dim),
        "triangles": ntri,
        "inverse_consistency_max_vox": float(np.abs(inner).max()),
    }


def scenario_sphere_expansion(dim, iters, warp_window):
    size = 0.25 * dim / 64
    p = make_params(dim, size, iters, alpha=0.05)
    c = (size / 2, size / 2, size / 2)
    r0, r1 = 0.04 * size / 0.25, 0.05 * size / 0.25

    phi_g = TsdfVolume(p)
    phi_g.init_sphere(c, r0)
    phi_n = TsdfVolume(p)
    phi_n.init_sphere(c, r1)

    e0 = float(solver.data_energy(phi_g.tsdf, phi_n.tsdf))
    res = solve(p, phi_g, phi_n, warp_window)
    e1 = float(solver.data_energy(phi_g.tsdf, res.tsdf_n_psi))
    rmse, ntri = mesh_rmse_sphere(
        res.tsdf_n_psi, res.weight_n_psi, p.voxel_sizes(), c, r0
    )
    return {
        "scenario": "sphere_expansion",
        "dim": dim,
        "iters_run": int(res.iters),
        "energy_before": e0,
        "energy_after": e1,
        "energy_ratio": e1 / e0 if e0 else None,
        "mesh_rmse_m": rmse,
        "mesh_rmse_voxels": rmse / (size / dim),
        "triangles": ntri,
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--iters", type=int, default=512)
    ap.add_argument("--warp-window", type=int, default=None)
    args = ap.parse_args(argv)

    report = {
        "results": [
            scenario_sphere_translation(args.dim, args.iters, args.warp_window),
            scenario_sphere_expansion(args.dim, args.iters, args.warp_window),
        ]
    }
    # Per-scenario RMSE budgets (in voxels) at the default 512-iteration
    # budget: translation converges to sub-voxel; radial expansion is the
    # slow case for SDF warping (the reference runs 2048-8192 iterations on
    # real scenes) and is held to 2 voxels here.
    budgets = {"sphere_translation_2.5vox": 1.0, "sphere_expansion": 2.0}
    ok = all(
        r["energy_ratio"] is not None
        and r["energy_ratio"] < 0.8
        and np.isfinite(r["mesh_rmse_voxels"])
        and r["mesh_rmse_voxels"] < budgets.get(r["scenario"], 1.0)
        for r in report["results"]
    )
    report["pass"] = bool(ok)
    print(json.dumps(report, indent=2))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
