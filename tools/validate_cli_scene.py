"""Full-CLI validation on the sensor-realistic articulated scene.

Generates (or reuses) a reference-layout scene directory with per-frame
analytic ground truth (tools/make_synthetic_scene.py --preset articulated:
noisy quantized depth, omask occluder, articulated multi-part motion,
topology-adjacent separation), runs the ACTUAL CLI on it
(python -m sobfu_tpu.cli <scene> <scene>/params.ini --enable-log), and
checks the logged artifacts against the analytic truth:

  * canonical check — every logged phi_global mesh must stay on the
    FRAME-0 surfaces (psi maps canonical -> live, so the canonical model
    is pinned to the first frame's configuration): RMSE of the union-SDF
    at the mesh vertices, in voxels.
  * live check — the logged deformation field (psi_XXXX.vti) applied to
    the canonical mesh vertices must land them on the FRAME-i surfaces:
    the actual tracking accuracy of the shipped pipeline.

This is the closest achievable stand-in for the reference's recorded
VolumeDeform/KillingFusion validations (BASELINE configs 2-3) given no
real dataset in the environment; the reference frame loop being mirrored
is /root/reference/src/apps/demo.cpp:285-510.

Usage:
    python tools/validate_cli_scene.py /tmp/scene --generate --frames 20
    python tools/validate_cli_scene.py /tmp/scene          # reuse dir

Exit code 0 iff every frame is inside budget. Prints one JSON line with
the per-frame RMSE curves (recorded in docs/BENCHLOG.md).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def union_sdf(points: np.ndarray, prims) -> np.ndarray:
    """Signed distance of points [N,3] (metres) to a union of spheres."""
    d = np.full(points.shape[0], np.inf)
    for prim in prims:
        c = np.asarray(prim["centre"], np.float64)
        r = float(prim["radius"])
        d = np.minimum(d, np.linalg.norm(points - c, axis=1) - r)
    return d


def trilinear_disp(disp: np.ndarray, coords: np.ndarray) -> np.ndarray:
    """Sample a displacement field f32[3,Z,Y,X] (voxel units) at voxel
    coords [N,3] in (x,y,z) order, edge-clamped trilinear."""
    _, Z, Y, X = disp.shape
    x = np.clip(coords[:, 0], 0.0, X - 1 - 1e-6)
    y = np.clip(coords[:, 1], 0.0, Y - 1 - 1e-6)
    z = np.clip(coords[:, 2], 0.0, Z - 1 - 1e-6)
    x0, y0, z0 = x.astype(int), y.astype(int), z.astype(int)
    fx, fy, fz = x - x0, y - y0, z - z0
    out = np.zeros((coords.shape[0], 3))
    for dz in (0, 1):
        wz = np.where(dz, fz, 1 - fz)
        for dy in (0, 1):
            wy = np.where(dy, fy, 1 - fy)
            for dx in (0, 1):
                wx = np.where(dx, fx, 1 - fx)
                w = (wx * wy * wz)[:, None]
                out += w * disp[
                    :,
                    np.minimum(z0 + dz, Z - 1),
                    np.minimum(y0 + dy, Y - 1),
                    np.minimum(x0 + dx, X - 1),
                ].T
    return out


def validate(scene: str, budget_canon: float, budget_live: float,
             max_frames=None) -> dict:
    from sobfu_tpu.config import load_params
    from sobfu_tpu.io import load_field_vti, load_mesh_vtk

    with open(os.path.join(scene, "truth.json")) as f:
        truth = json.load(f)
    params = load_params(os.path.join(scene, "params.ini"))
    vs = params.voxel_sizes()[0]
    pose_t = np.asarray(params.volume_pose)[:3, 3]

    mesh_dir = os.path.join(scene, "meshes")
    field_dir = os.path.join(scene, "fields")
    frames = sorted(
        int(f[len("mesh_"):-len(".vtk")])
        for f in os.listdir(mesh_dir)
        if f.startswith("mesh_")
    )
    if max_frames:
        frames = frames[:max_frames]
    assert frames, "no logged meshes — did the CLI run with --enable-log?"

    rows = []
    ok = True
    for i in frames:
        mesh = load_mesh_vtk(os.path.join(mesh_dir, f"mesh_{i:04d}.vtk"))
        # saved meshes use the reference's (x, -y, -z) store convention
        # (marching_cubes.cu:273-276, mc.extract_mesh flip_yz); undo it to
        # get world coordinates
        verts = np.asarray(mesh.vertices, np.float64) * np.asarray(
            [1.0, -1.0, -1.0]
        )
        if verts.shape[0] == 0:
            ok = False
            rows.append({"frame": i, "error": "empty mesh"})
            continue
        # canonical: vertices must lie on the frame-0 surfaces
        rmse_c = float(
            np.sqrt(np.mean(union_sdf(verts, truth["frames"][0]) ** 2))
        ) / vs
        # live: psi (displacement field, voxel units) warps canonical
        # vertices onto the frame-i surfaces
        disp = load_field_vti(os.path.join(field_dir, f"psi_{i:04d}.vti"))
        vox = (verts - pose_t) / vs
        warped = verts + trilinear_disp(disp, vox) * vs
        rmse_l = float(
            np.sqrt(np.mean(union_sdf(warped, truth["frames"][i]) ** 2))
        ) / vs
        good = rmse_c <= budget_canon and rmse_l <= budget_live
        ok &= good
        rows.append(
            {
                "frame": i,
                "rmse_canonical_vox": round(rmse_c, 3),
                "rmse_live_vox": round(rmse_l, 3),
                "ok": good,
            }
        )
    return {
        "scene": scene,
        "frames": len(frames),
        "budget_canonical_vox": budget_canon,
        "budget_live_vox": budget_live,
        "ok": ok,
        "per_frame": rows,
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("scene")
    ap.add_argument("--generate", action="store_true",
                    help="generate the articulated scene first")
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--skip-cli", action="store_true",
                    help="only validate existing logged artifacts")
    # budgets in VOXELS, calibrated on the shipped config (BENCHLOG round
    # 5, 20 frames at 64^3 with the full sensor model): live tracking
    # peaks at 1.07 mid-separation and recovers to 0.70; the CANONICAL
    # error is ~0.5 until the satellite's topology-separating departure
    # (t > 2/3) starts placing newly-seen surface through a
    # regulariser-extrapolated psi — it climbs to 1.87 by the last frame.
    # That climb is the measured hard-regime behaviour (KillingFusion-
    # class trackers degrade on separation events the same way); the
    # budget bounds it from becoming divergence.
    ap.add_argument("--budget-canon", type=float, default=2.2)
    ap.add_argument("--budget-live", type=float, default=1.5)
    args = ap.parse_args(argv)

    if args.generate:
        from tools import make_synthetic_scene as gen

        gen.main(
            [args.scene, "--frames", str(args.frames), "--dim",
             str(args.dim), "--preset", "articulated"]
        )
    if not args.skip_cli:
        from sobfu_tpu import cli

        cli_args = [
            args.scene, os.path.join(args.scene, "params.ini"),
            "--enable-log",
        ]
        if args.max_frames:
            cli_args += ["--max-frames", str(args.max_frames)]
        rc = cli.main(cli_args)
        if rc != 0:
            print(json.dumps({"ok": False, "error": f"cli rc={rc}"}))
            return 1

    res = validate(
        args.scene, args.budget_canon, args.budget_live, args.max_frames
    )
    print(json.dumps(res))
    return 0 if res["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
