"""Depth-preprocessing op tests (reference src/kfusion/cuda/imgproc.cu).

Analytic oracles: constant/planar depth maps where filters and normal
computations have closed forms.
"""

import jax.numpy as jnp
import numpy as np

from sobfu_tpu.ops import imgproc

H, W = 32, 48
INTR = jnp.asarray([40.0, 40.0, W / 2.0, H / 2.0], jnp.float32)


def test_bilateral_preserves_constant_depth():
    d = jnp.full((H, W), 1234, jnp.uint16)
    out = imgproc.bilateral_filter(d, 7, 4.5, 0.04)
    assert out.dtype == jnp.uint16
    np.testing.assert_array_equal(np.asarray(out), 1234)


def test_bilateral_rejects_depth_outliers():
    """A single far-off pixel must not bleed into smooth neighbours
    (that is the point of the depth sigma, imgproc.cu:30-36)."""
    d = np.full((H, W), 1000, np.uint16)
    d[H // 2, W // 2] = 5000
    out = np.asarray(imgproc.bilateral_filter(jnp.asarray(d), 7, 4.5, 0.04))
    assert out[H // 2 + 2, W // 2] == 1000


def test_truncate_depth():
    d = jnp.asarray([[500, 1500, 2500]], jnp.uint16)
    out = imgproc.truncate_depth(d, jnp.float32(2.0))
    np.testing.assert_array_equal(np.asarray(out), [[500, 1500, 0]])


def test_compute_dists_lambda_correction():
    """dists = depth * sqrt(xl^2 + yl^2 + 1) / 1000 (imgproc.cu:233-254)."""
    d = jnp.full((H, W), 1000, jnp.uint16)
    out = np.asarray(imgproc.compute_dists(d, INTR))
    # principal point: lambda = 1
    cy, cx = int(float(INTR[3])), int(float(INTR[2]))
    np.testing.assert_allclose(out[cy, cx], 1.0, rtol=1e-5)
    # corner pixel: longer ray
    xl = (0 - float(INTR[2])) / float(INTR[0])
    yl = (0 - float(INTR[3])) / float(INTR[1])
    np.testing.assert_allclose(
        out[0, 0], np.sqrt(xl * xl + yl * yl + 1.0), rtol=1e-5
    )


def test_depth_pyramid_constant():
    d = jnp.full((H, W), 800, jnp.uint16)
    out = imgproc.depth_pyramid_down(d, jnp.float32(0.04))
    assert out.shape == (H // 2, W // 2)
    np.testing.assert_array_equal(np.asarray(out), 800)


def test_normals_of_flat_wall_point_at_camera():
    """A fronto-parallel wall has normals (0, 0, -1) after the reference's
    -normalize(cross) convention (imgproc.cu:129-157)."""
    d = jnp.full((H, W), 1000, jnp.uint16)
    n = np.asarray(imgproc.compute_normals(d, INTR))
    inner = n[1:-1, 1:-1]
    assert np.isfinite(inner).all()
    np.testing.assert_allclose(np.abs(inner[..., 2]), 1.0, atol=1e-3)


def test_mask_depth_zeroes_invalid():
    d = jnp.full((H, W), 1000, jnp.uint16)
    n = jnp.full((H, W, 3), jnp.nan, jnp.float32)
    out = imgproc.mask_depth(d, n)
    np.testing.assert_array_equal(np.asarray(out), 0)


def test_resize_depth_normals_halves():
    d = jnp.full((H, W), 900, jnp.uint16)
    n = jnp.zeros((H, W, 3), jnp.float32).at[..., 2].set(-1.0)
    d2, n2 = imgproc.resize_depth_normals(d, n)
    assert d2.shape == (H // 2, W // 2)
    np.testing.assert_array_equal(np.asarray(d2), 900)
    np.testing.assert_allclose(np.asarray(n2)[..., 2], -1.0)


def test_rasterise_surface_projects_triangle():
    """A camera-facing triangle must produce hits with correct depth."""
    z = 0.5
    verts = jnp.asarray(
        [[-0.05, -0.05, z], [0.05, -0.05, z], [0.0, 0.08, z]], jnp.float32
    )
    pts, normals = imgproc.rasterise_surface(
        verts, jnp.eye(4), INTR, H, W, samples_per_edge=8
    )
    pts = np.asarray(pts)
    hit = np.abs(pts[..., 2]) > 0
    assert hit.sum() > 3
    np.testing.assert_allclose(pts[hit][:, 2], z, atol=1e-5)


def test_render_tangent_colors():
    n = jnp.zeros((8, 8, 3), jnp.float32).at[..., 2].set(-1.0)
    n = n.at[0, 0].set(jnp.nan)
    img = np.asarray(imgproc.render_tangent_colors(n))
    assert img.dtype == np.uint8
    assert (img[0, 0] == 0).all()  # invalid -> black
    # n = (0,0,-1) -> (127, 127, 0)
    assert abs(int(img[4, 4, 0]) - 127) <= 1
    assert img[4, 4, 2] == 0


def test_render_image_shades_flat_wall():
    d = jnp.full((H, W), 1000, jnp.uint16)
    pts, normals = imgproc.compute_points_normals(d, INTR)
    img = np.asarray(
        imgproc.render_image(pts, normals, jnp.asarray([0.0, 0.0, 0.0]))
    )
    inner = img[1:-2, 1:-2]
    assert inner.max() > 150  # lit
    assert (img[-1] == 0).all()  # last row invalid -> black
