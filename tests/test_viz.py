"""Offscreen visualisation + debug-print smoke tests."""

import os

import jax.numpy as jnp
import numpy as np

from sobfu_tpu.config import Params
from sobfu_tpu.tsdf import TsdfVolume


def test_save_screenshot(tmp_path):
    from tests.test_pipeline import make_params, render_sphere_depth
    from sobfu_tpu.pipeline import SobFusion
    from sobfu_tpu import viz

    fusion = SobFusion(make_params())
    for cx in (0.0, 0.004):
        fusion(jnp.asarray(render_sphere_depth((cx, 0.0, 0.45), 0.08)))
    out = str(tmp_path / "shot.png")
    viz.save_screenshot(fusion, out, detailed=True)
    assert os.path.getsize(out) > 1000


def test_print_sdf_values(capsys):
    p = Params()
    p.volume_dims = (8, 8, 8)
    p.volume_size = (0.1, 0.1, 0.1)
    p.tsdf_trunc_dist = 0.01
    p.eta = 0.01
    v = TsdfVolume(p)
    v.init_sphere((0.05, 0.05, 0.05), 0.03)
    v.print_sdf_values()
    assert len(capsys.readouterr().out) > 10
