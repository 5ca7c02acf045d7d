"""Command-line app: reconstruct a scene from a directory of depth frames.

Parity with the reference demo binary (src/apps/demo.cpp:526-568):

    python -m sobfu_tpu.cli <data dir> <params.ini> [--enable-viz]
        [--enable-viz-detailed] [--enable-log] [--verbose] [--vverbose]
        [--max-frames N] [--checkpoint PATH] [--resume PATH]

  <data dir> contains depth/, color/, and optionally omask/ (masks applied
  to depth, demo.cpp:314-330).
  --enable-log writes per-frame meshes to <dir>/meshes as .vtk and the
  deformation field to <dir>/fields as .vti.
  --enable-viz* writes offscreen screenshots to <dir>/screenshots (the
  reference used a PCL window; headless TPU hosts render via matplotlib).
  --checkpoint/--resume are new (the reference had no checkpointing).
"""

from __future__ import annotations

import argparse
import os
import sys

# persistent compilation cache (set in __main__.py for `python -m
# sobfu_tpu` BEFORE the package import pulls in jax; the setdefault here
# covers direct `python sobfu_tpu/cli.py` runs where no jax is loaded yet)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser(
    os.environ.get("SOBFU_CACHE_DIR", "~/.cache/jax")))

import jax.numpy as jnp
import numpy as np

from sobfu_tpu import io as sio
from sobfu_tpu.config import load_params
from sobfu_tpu.fields import displacement
from sobfu_tpu.pipeline import SobFusion
from sobfu_tpu.utils.timers import SampledScopeTime
from sobfu_tpu.utils import checkpoint as ckpt


def build_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="sobfu_tpu",
        description="TPU-native SobolevFusion: non-rigid depth reconstruction",
    )
    ap.add_argument("data_dir", help="scene directory with depth/ and color/")
    ap.add_argument("params", help="scene .ini (reference params/*.ini format)")
    ap.add_argument("--enable-viz", action="store_true")
    ap.add_argument("--enable-viz-detailed", action="store_true")
    ap.add_argument("--enable-log", action="store_true")
    ap.add_argument("--verbose", action="store_true")
    ap.add_argument("--vverbose", action="store_true")
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument(
        "--color-mesh", action="store_true",
        help="sample per-vertex RGB from the color stream onto logged "
        "meshes and screenshots",
    )
    ap.add_argument(
        "--live-viz", action="store_true",
        help="serve a live interactive viewer over HTTP (headless-host "
        "equivalent of the reference's PCL window)",
    )
    ap.add_argument("--live-viz-port", type=int, default=8765)
    ap.add_argument(
        "--live-viz-host", default="127.0.0.1",
        help="interface the live viewer binds to (default loopback only; "
        "pass 0.0.0.0 explicitly to expose it to the network)",
    )
    ap.add_argument("--checkpoint", default=None, help="write state here after each frame")
    ap.add_argument("--resume", default=None, help="restore state before starting")
    ap.add_argument(
        "--no-native-loader", action="store_true",
        help="disable the C++ prefetch frame loader (decode then runs "
        "synchronously on the Python thread, like the reference app)",
    )
    return ap


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)

    verbosity = 2 if args.vverbose else (1 if args.verbose else 0)
    params = load_params(args.params, verbosity=verbosity)

    if params.warp_window is None:
        import jax

        if jax.default_backend() == "tpu":
            print(
                "hint: running on TPU with the exact-gather warp (slow). "
                "Set WARP_WINDOW=<K> in the .ini to use the gather-free "
                "bounded-window warp (~100x faster; exact for deformations "
                "under K voxels)."
            )

    depths, colors, masks = sio.list_frames(args.data_dir)
    if not depths:
        print("error: no depth frames found", file=sys.stderr)
        return 1

    mesh_dir = os.path.join(args.data_dir, "meshes")
    field_dir = os.path.join(args.data_dir, "fields")
    shot_dir = os.path.join(args.data_dir, "screenshots")
    if args.enable_log:
        os.makedirs(mesh_dir, exist_ok=True)
        os.makedirs(field_dir, exist_ok=True)
    if args.enable_viz or args.enable_viz_detailed:
        os.makedirs(shot_dir, exist_ok=True)

    fusion = SobFusion(params)
    start = 0
    if args.resume and os.path.exists(args.resume):
        ckpt.load_checkpoint(args.resume, fusion)
        start = fusion.frame_counter
        print(f"resumed at frame {start}")

    timer = SampledScopeTime()
    n_frames = len(depths) if args.max_frames is None else min(args.max_frames, len(depths))

    live = None
    if args.live_viz:
        from sobfu_tpu.viewer import LiveViewer

        live = LiveViewer(
            port=args.live_viz_port, host=args.live_viz_host
        ).start()
        print(f"live viewer: http://localhost:{live.port}/")

    want_color = (
        args.enable_viz or args.enable_viz_detailed or args.color_mesh
        or args.live_viz
    )
    # phi_global o psi_inv is only consumed by the per-frame viz surfaces;
    # without them the frame step skips those two warps (SolveResult
    # pass-throughs) and get_phi_global_psi_inv_mesh recomputes on demand
    fusion.need_inv_warps = bool(
        args.enable_viz or args.enable_viz_detailed or args.live_viz
    )

    def frame_stream():
        """(index, masked uint16 depth) frames. Prefers the native C++
        prefetch ring (native/sobfu_runtime.cpp): worker threads decode
        and mask frames ahead while the TPU solve runs, taking disk I/O
        off the hot path (the reference app decoded synchronously per
        frame, demo.cpp:311-330). Falls back to synchronous Python
        decode when the shared library is unavailable."""
        if not args.no_native_loader:
            try:
                from sobfu_tpu import native

                loader = native.FrameLoader(
                    depths[start:n_frames],
                    masks[start:n_frames] if masks else None,
                )
                for off, d in enumerate(loader):
                    yield start + off, d
                return
            except OSError:
                pass
        for j in range(start, n_frames):
            d = sio.load_depth(depths[j])
            if masks:
                d = sio.apply_mask(d, sio.load_mask(masks[j]))
            yield j, d

    for i, depth in frame_stream():
        # color stream consumed like the reference viewer (demo.cpp:311-330)
        color = (
            sio.load_color(colors[i]) if (want_color and i < len(colors))
            else None
        )

        with timer:
            fusion(jnp.asarray(depth))
            # Materialise a device scalar inside the timed region: with async
            # dispatch (and a backend where block_until_ready can return
            # early) the reported fps would otherwise only measure dispatch.
            if fusion.last_solve is not None:
                float(fusion.last_solve.max_norm)
            else:
                float(fusion.phi_global.tsdf.ravel()[0])

        if args.enable_log and fusion.frame_counter > 1:
            mesh = fusion.get_phi_global_mesh()
            if args.color_mesh and color is not None:
                from sobfu_tpu import viz

                mesh.colors = viz.sample_vertex_colors(
                    mesh, color, fusion.poses[-1], params.intr
                )
            sio.save_mesh_vtk(mesh, os.path.join(mesh_dir, f"mesh_{i:04d}.vtk"))
            disp = np.asarray(displacement(fusion.psi.data))
            sio.save_field_vti(disp, os.path.join(field_dir, f"psi_{i:04d}.vti"))

        if (args.enable_viz or args.enable_viz_detailed) and fusion.frame_counter > 1:
            from sobfu_tpu import viz

            viz.save_screenshot(
                fusion,
                os.path.join(shot_dir, f"frame_{i:04d}.png"),
                detailed=args.enable_viz_detailed,
                color=color,
            )

        if live is not None and fusion.frame_counter > 1:
            live.update(
                fusion, color=color, fps=timer.fps,
                detailed=args.enable_viz_detailed, frame=i,
            )

        if args.checkpoint:
            ckpt.save_checkpoint(args.checkpoint, fusion)

    print(
        f"processed {n_frames - start} frames, avg fps {timer.fps:.2f}, "
        f"steady-state fps {timer.steady_fps():.2f} "
        "(first frames carry the one-time jit compile)"
    )
    if live is not None:
        live.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
