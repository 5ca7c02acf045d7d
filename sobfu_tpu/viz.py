"""Offscreen visualisation: mesh screenshots without a display.

The reference used an interactive PCL visualizer with 2 or 4 viewports and
PNG screenshots (demo.cpp:374-506) and refused to run over SSH. TPU hosts
are headless, so screenshots are rendered offscreen with matplotlib's 3-D
triangle rasteriser: 2 panels (global, live-warped) or 4 panels
(--enable-viz-detailed: + live, global-warped) — the same panel inventory
as the reference viewports.
"""

from __future__ import annotations

import numpy as np


def _plot_mesh(ax, mesh, title: str) -> None:
    v = mesh.vertices
    ax.set_title(title, fontsize=8)
    if v.shape[0] == 0:
        ax.text(0.5, 0.5, 0.5, "empty", fontsize=8)
        return
    # subsample triangles for speed
    tris = v.reshape(-1, 3, 3)
    if tris.shape[0] > 20000:
        idx = np.linspace(0, tris.shape[0] - 1, 20000).astype(int)
        tris = tris[idx]
    from mpl_toolkits.mplot3d.art3d import Poly3DCollection

    pc = Poly3DCollection(tris, linewidths=0.0)
    pc.set_facecolor((0.6, 0.7, 0.9, 1.0))
    ax.add_collection3d(pc)
    lo, hi = tris.min(axis=(0, 1)), tris.max(axis=(0, 1))
    ax.set_xlim(lo[0], hi[0])
    ax.set_ylim(lo[1], hi[1])
    ax.set_zlim(lo[2], hi[2])
    ax.set_axis_off()


def save_screenshot(fusion, path: str, detailed: bool = False) -> None:
    """Render the pipeline's current meshes into a PNG."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    panels = [
        ("phi_global", fusion.get_phi_global_mesh),
        ("phi_n(psi)", fusion.get_phi_n_psi_mesh),
    ]
    if detailed:
        panels += [
            ("phi_n", fusion.get_phi_n_mesh),
            ("phi_global(psi_inv)", fusion.get_phi_global_psi_inv_mesh),
        ]

    ncols = 2
    nrows = (len(panels) + 1) // 2
    fig = plt.figure(figsize=(4 * ncols, 4 * nrows), dpi=80)
    for i, (title, getter) in enumerate(panels):
        ax = fig.add_subplot(nrows, ncols, i + 1, projection="3d")
        _plot_mesh(ax, getter(), title)
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)
