"""Generate a synthetic deforming-scene directory in the reference layout.

Creates <out>/depth/*.png (16-bit mm), <out>/color/*.png, and a matching
params .ini, so the full CLI pipeline can be exercised without the
VolumeDeform/KillingFusion datasets:

    python tools/make_synthetic_scene.py /tmp/scene --frames 10
    python -m sobfu_tpu.cli /tmp/scene /tmp/scene/params.ini --enable-log

The scene is a sphere that translates and pulses (non-rigid radial
deformation) in front of the camera.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def render_sphere_depth(H, W, fx, fy, cx, cy, centre, radius):
    u = np.arange(W, dtype=np.float64)[None, :]
    v = np.arange(H, dtype=np.float64)[:, None]
    dx = np.broadcast_to((u - cx) / fx, (H, W))
    dy = np.broadcast_to((v - cy) / fy, (H, W))
    d = np.stack([dx, dy, np.ones((H, W))], axis=-1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    c = np.asarray(centre, np.float64)
    b = d @ c
    disc = b * b - (c @ c - radius * radius)
    hit = disc > 0
    t = b - np.sqrt(np.maximum(disc, 0.0))
    z = np.where(hit & (t > 0), t * d[..., 2], 0.0)
    return (z * 1000.0).astype(np.uint16)


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
    args = ap.parse_args(argv)

    from PIL import Image

    H, W = args.height, args.width
    fx = fy = 0.55 * W
    cx, cy = W / 2 - 0.5, H / 2 - 0.5

    os.makedirs(os.path.join(args.out, "depth"), exist_ok=True)
    os.makedirs(os.path.join(args.out, "color"), exist_ok=True)

    # translation amplitude: the production config uses WARP_WINDOW=2,
    # which bounds the ACCUMULATED deformation the windowed warp can
    # represent — so the sphere's peak excursion must stay under ~1.8
    # voxels at the configured grid (a fixed 0.02 m is ~6 voxels at 128^3:
    # the window saturates mid-sequence and those frames cannot converge)
    amp = 0.02
    if args.production:
        amp = min(amp, 1.8 * 0.4 / args.dim)

    for i in range(args.frames):
        t = i / max(args.frames - 1, 1)
        centre = (amp * np.sin(2 * np.pi * t), 0.0, 0.45)
        radius = 0.08 * (1.0 + 0.08 * np.sin(4 * np.pi * t))  # pulsing
        d = render_sphere_depth(H, W, fx, fy, cx, cy, centre, radius)
        Image.fromarray(d.astype(np.int32), mode="I").convert("I;16").save(
            os.path.join(args.out, "depth", f"frame_{i:04d}.png")
        )
        rgb = np.zeros((H, W, 3), np.uint8)
        rgb[d > 0] = (180, 120, 90)
        Image.fromarray(rgb).save(
            os.path.join(args.out, "color", f"frame_{i:04d}.png")
        )

    ini = os.path.join(args.out, "params.ini")
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
                + [""]
            )
        )
    print(f"wrote {args.frames} frames + {ini}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
