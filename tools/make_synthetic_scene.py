"""Generate a synthetic deforming-scene directory in the reference layout.

Creates <out>/depth/*.png (16-bit mm), <out>/color/*.png, optional
<out>/omask/*.png occlusion masks, a matching params .ini and (for the
articulated preset) a per-frame analytic ground truth <out>/truth.json —
so the full CLI pipeline can be exercised AND validated without the
VolumeDeform/KillingFusion datasets (reference data layout:
demo.cpp:177-198, omask application demo.cpp:314-330):

    python tools/make_synthetic_scene.py /tmp/scene --frames 10
    python -m sobfu_tpu.cli /tmp/scene /tmp/scene/params.ini --enable-log

Presets:
  sphere       a sphere that translates and pulses (the original smoke
               scene; noiseless by default)
  articulated  SENSOR-REALISTIC multi-part scene: a body sphere with an
               orbiting satellite sphere (separating late in the
               sequence) and a bending capsule-chain rod — articulated
               piecewise motion with a topology-adjacent event. Depth
               gets Kinect-style quantization + z^2-scaled Gaussian
               noise, grazing-angle edge dropout, and a sweeping
               circular occluder recorded in <out>/omask/ (the
               reference's occlusion-mask layout). Per-frame primitive
               ground truth goes to truth.json for RMSE validation
               (tools/validate_cli_scene.py).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def render_sphere_depth(H, W, fx, fy, cx, cy, centre, radius):
    return render_prims_depth(H, W, fx, fy, cx, cy, [(centre, radius)])


def render_prims_depth(H, W, fx, fy, cx, cy, prims):
    """Ray-cast depth of a UNION of spheres: per pixel, the nearest
    positive ray-sphere intersection. prims = [(centre_xyz, radius)]."""
    u = np.arange(W, dtype=np.float64)[None, :]
    v = np.arange(H, dtype=np.float64)[:, None]
    dx = np.broadcast_to((u - cx) / fx, (H, W))
    dy = np.broadcast_to((v - cy) / fy, (H, W))
    d = np.stack([dx, dy, np.ones((H, W))], axis=-1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t_best = np.full((H, W), np.inf)
    for centre, radius in prims:
        c = np.asarray(centre, np.float64)
        b = d @ c
        disc = b * b - (c @ c - radius * radius)
        t = b - np.sqrt(np.maximum(disc, 0.0))
        ok = (disc > 0) & (t > 0)
        t_best = np.where(ok & (t < t_best), t, t_best)
    z = np.where(np.isfinite(t_best), t_best * d[..., 2], 0.0)
    return (z * 1000.0).astype(np.uint16)


def articulated_prims(t):
    """Primitive list (centre, radius) of the articulated scene at time
    t in [0,1]:

      * body: a sphere translating gently in x and pulsing
      * satellite: orbits the body, then SEPARATES (radially departs)
        over the last third — the topology-adjacent event
      * rod: a capsule-chain of 6 small spheres anchored on the body,
        bending through ~40 degrees (articulated piecewise motion)

    Motion amplitudes are tuned so PER-FRAME increments stay ~1 voxel at
    a 64^3/0.4 m grid over a 20-frame sequence (the compositive solver's
    increment window); the ACCUMULATED motion (satellite arc ~0.13 m) is
    far outside any total-deformation window — this scene requires the
    unbounded-drift path.
    """
    prims = []
    bx = 0.010 * np.sin(2 * np.pi * t)
    body_c = (bx, 0.0, 0.45)
    body_r = 0.055 * (1.0 + 0.06 * np.sin(4 * np.pi * t))
    prims.append((body_c, body_r))

    # satellite: orbit for t < 2/3, then also depart radially
    ang = 2 * np.pi * (0.125 + 0.25 * t)
    orbit_r = 0.080 + 0.05 * max(0.0, t - 2.0 / 3.0) * 3.0
    sat_c = (
        body_c[0] + orbit_r * np.cos(ang),
        body_c[1] + orbit_r * np.sin(ang) * 0.4,
        body_c[2] - orbit_r * np.sin(ang) * 0.25,
    )
    prims.append((sat_c, 0.028))

    # bending rod: chain anchored at the body surface pointing -y,
    # bending about the anchor in the y-z plane
    n_seg = 6
    seg = 0.016
    bend = np.deg2rad(40.0) * 0.5 * (1 - np.cos(2 * np.pi * t))  # 0..40..0
    anchor = np.asarray([body_c[0], body_c[1] - body_r, body_c[2]])
    for k in range(n_seg):
        # cumulative curvature: each segment rotates by bend/n_seg more
        a = bend * (k + 0.5) / n_seg
        step = np.asarray([0.0, -np.cos(a), -np.sin(a) * 0.6]) * seg
        anchor = anchor + step
        prims.append((tuple(anchor), 0.014))
    return prims


def sensorize_depth(d_mm, rng, fx):
    """Kinect-style sensor model on a clean uint16 mm depth map:
    z^2-scaled Gaussian noise (sigma ~ 1.5 mm at 0.45 m), grazing-angle /
    depth-discontinuity edge dropout, and the inherent mm quantization."""
    z = d_mm.astype(np.float64) / 1000.0
    valid = d_mm > 0
    sigma_mm = 1.5 * (z / 0.45) ** 2  # ~1.5 mm at 0.45 m, axial z^2 law
    noisy = d_mm.astype(np.float64) + rng.normal(
        0.0, 1.0, d_mm.shape
    ) * sigma_mm * np.where(valid, 1.0, 0.0)
    # edge dropout: pixels adjacent to a > 12 mm depth jump flicker out
    gy, gx = np.gradient(d_mm.astype(np.float64))
    edge = (np.abs(gx) + np.abs(gy)) > 12.0
    drop = edge & (rng.random(d_mm.shape) < 0.5)
    out = np.where(valid & ~drop, np.round(noisy), 0.0)
    return np.clip(out, 0, 65535).astype(np.uint16)


def occluder_mask(H, W, t):
    """Sweeping circular occluder (a 'hand' passing in front): nonzero =
    KEEP (reference omask semantics, demo.cpp:314-330). Present only for
    t in [0.25, 0.7]."""
    mask = np.full((H, W), 255, np.uint8)
    if 0.25 <= t <= 0.7:
        s = (t - 0.25) / 0.45
        cx_px = W * (0.15 + 0.7 * s)
        cy_px = H * 0.55
        r_px = 0.09 * W
        u = np.arange(W)[None, :]
        v = np.arange(H)[:, None]
        inside = (u - cx_px) ** 2 + (v - cy_px) ** 2 < r_px**2
        mask[inside] = 0
    return mask


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--dim", type=int, default=64, help="voxel grid dims")
    ap.add_argument(
        "--production", action="store_true",
        help="append the production solver keys (momentum, pyramid, "
        "window 2, convergence threshold) to the generated .ini",
    )
    ap.add_argument(
        "--preset", choices=("sphere", "articulated"), default="sphere",
        help="scene content: the original pulsing sphere, or the "
        "sensor-realistic articulated multi-part scene (noise + edge "
        "dropout + omask occluder + truth.json)",
    )
    ap.add_argument(
        "--noise", action="store_true",
        help="apply the sensor model to the sphere preset too",
    )
    ap.add_argument(
        "--ini",
        help="render under a shipped scene .ini (the BASELINE scene "
        "configs, params/params_snoopy.ini etc.): intrinsics, image "
        "size, volume geometry and model constants come from the ini; "
        "the articulated scene is scaled into its volume and held "
        "static through START_FRAME's rigid-fusion warm-up; the ini is "
        "copied to <out>/params.ini with the TPU compositive execution "
        "keys appended (stall stop + momentum + window — the certified "
        "production execution of the same model)",
    )
    args = ap.parse_args(argv)

    from PIL import Image

    H, W = args.height, args.width
    fx = fy = 0.55 * W
    cx, cy = W / 2 - 0.5, H / 2 - 0.5
    scene_scale, scene_shift = 1.0, np.zeros(3)
    start_frame = 0
    if args.ini:
        from sobfu_tpu.config import load_params

        p_ini = load_params(args.ini)
        fx, fy = p_ini.intr.fx, p_ini.intr.fy
        cx, cy = p_ini.intr.cx, p_ini.intr.cy
        # reference captures are cx ~ W/2 (demo.cpp uses 640x480)
        W, H = int(round(2 * cx)), int(round(2 * cy))
        # scale the articulated scene (authored for a 0.4 m volume whose
        # content sits at z=0.45) into this ini's volume
        z0 = float(p_ini.volume_pose[2, 3])
        vol_c = np.asarray(
            [0.0, 0.0, z0 + p_ini.volume_size[2] / 2.0]
        )
        scene_scale = p_ini.volume_size[0] / 0.4
        scene_shift = vol_c - np.asarray([0.0, 0.0, 0.45]) * scene_scale
        start_frame = int(getattr(p_ini, "start_frame", 0) or 0)
        args.preset = "articulated"

    os.makedirs(os.path.join(args.out, "depth"), exist_ok=True)
    os.makedirs(os.path.join(args.out, "color"), exist_ok=True)
    articulated = args.preset == "articulated"
    if articulated:
        os.makedirs(os.path.join(args.out, "omask"), exist_ok=True)

    # translation amplitude: the production config uses WARP_WINDOW=2,
    # which bounds the ACCUMULATED deformation the windowed warp can
    # represent — so the sphere's peak excursion must stay under ~1.8
    # voxels at the configured grid (a fixed 0.02 m is ~6 voxels at 128^3:
    # the window saturates mid-sequence and those frames cannot converge)
    amp = 0.02
    if args.production:
        amp = min(amp, 1.8 * 0.4 / args.dim)

    rng = np.random.default_rng(0)
    truth = {
        "intr": {"fx": fx, "fy": fy, "cx": cx, "cy": cy},
        "preset": args.preset,
        "frames": [],
    }
    for i in range(args.frames):
        # ini mode: hold the scene static through the config's rigid-
        # fusion warm-up frames (START_FRAME), then play the sequence
        t = (
            max(0, i - start_frame)
            / max(args.frames - 1 - start_frame, 1)
        )
        if articulated:
            prims = articulated_prims(t)
            if args.ini:
                prims = [
                    (
                        tuple(
                            np.asarray(c) * scene_scale + scene_shift
                        ),
                        r * scene_scale,
                    )
                    for c, r in prims
                ]
            d = render_prims_depth(H, W, fx, fy, cx, cy, prims)
        else:
            centre = (amp * np.sin(2 * np.pi * t), 0.0, 0.45)
            radius = 0.08 * (1.0 + 0.08 * np.sin(4 * np.pi * t))  # pulsing
            prims = [(centre, radius)]
            d = render_sphere_depth(H, W, fx, fy, cx, cy, centre, radius)
        if articulated or args.noise:
            d = sensorize_depth(d, rng, fx)
        if articulated:
            m = occluder_mask(H, W, t)
            Image.fromarray(m).save(
                os.path.join(args.out, "omask", f"frame_{i:04d}.png")
            )
        truth["frames"].append(
            [
                {"centre": [float(x) for x in c], "radius": float(r)}
                for c, r in prims
            ]
        )
        Image.fromarray(d.astype(np.int32), mode="I").convert("I;16").save(
            os.path.join(args.out, "depth", f"frame_{i:04d}.png")
        )
        rgb = np.zeros((H, W, 3), np.uint8)
        rgb[d > 0] = (180, 120, 90)
        Image.fromarray(rgb).save(
            os.path.join(args.out, "color", f"frame_{i:04d}.png")
        )
    if articulated:
        with open(os.path.join(args.out, "truth.json"), "w") as f:
            json.dump(truth, f)

    ini = os.path.join(args.out, "params.ini")
    if args.ini:
        # the shipped scene config AS-IS, plus the TPU production
        # execution keys (last key wins in the loader, matching the
        # reference's own parser behaviour). The MODEL constants —
        # grid, volume, trunc/eta, max_weight, alpha, w_reg, filter —
        # all stay the scene's.
        with open(args.ini) as f:
            src = f.read()
        with open(ini, "w") as f:
            f.write(src.rstrip("\n") + "\n")
            f.write(
                "\n".join(
                    [
                        "",
                        "# --- appended by make_synthetic_scene --ini:",
                        "# TPU production execution of the same model",
                        "# (accumulated articulated motion exceeds any",
                        "# total-deformation window -> compositive)",
                        "SOLVER_MODE=compositive",
                        "WARP_WINDOW=2",
                        "MOMENTUM=0.9",
                        # umbrella/boxing ship MAX_UPDATE_NORM=1e-10 —
                        # a cap-grinding stop; the stall net is the
                        # production convergence criterion (data energy
                        # flat; fidelity-gated)
                        "MAX_UPDATE_NORM=4e-3",
                        "STALL_WINDOW=16",
                        "STALL_REL=1e-2",
                        # separation scenes: gate NEW canonical surface on
                        # near-identity psi (tsdf.fuse_volumes_gated) —
                        # without it the post-separation frames corrupt
                        # the canonical through extrapolated psi
                        # (BENCHLOG round-5: 5.5 vox RMSE by frame 59)
                        "NEW_SURFACE_GATE=1.5",
                        "",
                    ]
                )
            )
        print(f"wrote {args.frames} frames + {ini} (from {args.ini})")
        return 0
    with open(ini, "w") as f:
        f.write(
            "\n".join(
                [
                    "# auto-generated synthetic scene config",
                    f"VOL_DIMS_X={args.dim}", f"VOL_DIMS_Y={args.dim}",
                    f"VOL_DIMS_Z={args.dim}",
                    "VOL_SIZE_X=0.4", "VOL_SIZE_Y=0.4", "VOL_SIZE_Z=0.4",
                    "TSDF_TRUNC_DIST=6", "ETA=3", "TSDF_MAX_WEIGHT=64",
                    f"INTR_FX={fx}", f"INTR_FY={fy}",
                    f"INTR_CX={cx}", f"INTR_CY={cy}",
                    "VOL_POSE_T_Z=0.25",
                    "BILATERAL_KERNEL_SIZE=5",
                    "START_FRAME=1",
                    "MAX_ITER=128", "MAX_UPDATE_NORM=1e-4",
                    "S=7", "LAMBDA=0.1", "ALPHA=0.1", "W_REG=0.2",
                    "WARP_WINDOW=4",
                ]
                + (
                    [
                        # production solver configuration (USAGE.md §5,
                        # round-3 sweep; last key wins)
                        "WARP_WINDOW=2", "MOMENTUM=0.95",
                        # heavy-ball multiplies the effective step by
                        # 1/(1-mu); alpha must drop accordingly or the
                        # update norm plateaus above the threshold
                        "ALPHA=0.05",
                        "PYRAMID_LEVELS=2", "FINE_WINDOW=1",
                        "MAX_ITER=1024",
                        # data energy is flat from 4e-3 down to 1e-3; the
                        # tighter stop only grinds the regulariser
                        "MAX_UPDATE_NORM=4e-3",
                        # stop when the data energy stops improving: on
                        # warm-started frames the update norm plateaus on
                        # regulariser drift long after reconstruction
                        # quality has converged (see solver.estimate_psi)
                        "STALL_WINDOW=16", "STALL_REL=1e-2",
                    ]
                    if args.production
                    else []
                )
                + (
                    [
                        # accumulated motion exceeds any total-deformation
                        # window (satellite arc ~0.13 m): the compositive
                        # increment solve is the valid production mode here
                        "SOLVER_MODE=compositive",
                        "WARP_WINDOW=2", "MOMENTUM=0.9", "ALPHA=0.1",
                        "MAX_ITER=256", "MAX_UPDATE_NORM=4e-3",
                        "STALL_WINDOW=16", "STALL_REL=1e-2",
                        # noisy depth: keep a little more temporal fusion
                        "TSDF_MAX_WEIGHT=64",
                        # gate NEW canonical surface on near-identity psi
                        # (the satellite separation otherwise places
                        # newly-seen surface through extrapolated psi)
                        "NEW_SURFACE_GATE=1.5",
                    ]
                    if articulated
                    else []
                )
                + [""]
            )
        )
    print(f"wrote {args.frames} frames + {ini}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
