"""Live web viewer tests (reference demo.cpp:374-506's PCL window, rebuilt
as an HTTP viewer for headless TPU hosts)."""

import json
import urllib.request

import numpy as np

from sobfu_tpu.mc import Mesh
from sobfu_tpu.viewer import LiveViewer


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.read()


def test_viewer_serves_page_and_state():
    viewer = LiveViewer(port=0).start()  # ephemeral port
    try:
        page = _get(f"http://127.0.0.1:{viewer.port}/").decode()
        assert "sobfu_tpu live" in page and "state.json" in page

        state = json.loads(_get(f"http://127.0.0.1:{viewer.port}/state.json"))
        assert state["seq"] == 0 and state["panels"] == []

        v = np.asarray(
            [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 0, 1], [0, 1, 1]],
            np.float32,
        )
        mesh = Mesh(vertices=v, normals=np.zeros_like(v))
        color = np.zeros((8, 8, 3), np.uint8)
        viewer.update_meshes([("phi_global", mesh)], color=color, fps=1.5)

        state = json.loads(_get(f"http://127.0.0.1:{viewer.port}/state.json"))
        assert state["seq"] == 1
        assert state["panels"][0]["name"] == "phi_global"
        assert len(state["panels"][0]["v"]) == 18  # 2 triangles x 9 floats
        assert state["fps"] == 1.5
        assert state["color"]  # base64 png present
    finally:
        viewer.stop()


def test_viewer_decimates_large_meshes():
    viewer = LiveViewer(port=0, max_tris=100).start()
    try:
        rng = np.random.default_rng(0)
        v = rng.standard_normal((9000, 3)).astype(np.float32)  # 3000 tris
        viewer.update_meshes([("m", Mesh(vertices=v, normals=v))])
        state = json.loads(_get(f"http://127.0.0.1:{viewer.port}/state.json"))
        assert len(state["panels"][0]["v"]) == 100 * 9
        # normalised into the unit box
        assert max(abs(x) for x in state["panels"][0]["v"]) <= 1.0 + 1e-6
    finally:
        viewer.stop()
