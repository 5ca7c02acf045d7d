"""Field-math unit tests with closed-form oracles.

Ports of the reference's test/deformation_field_test.cpp, plus extra
coverage for the samplers (the reference had none).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from sobfu_tpu import fields
from sobfu_tpu.config import Params
from sobfu_tpu.tsdf import TsdfVolume

DIM = 32  # small grid keeps CPU tests fast; oracles are resolution-independent


def make_params(dim=DIM, size=0.25):
    p = Params()
    p.volume_dims = (dim, dim, dim)
    p.volume_size = (size, size, size)
    p.tsdf_trunc_dist = 10.0 * size / dim
    p.eta = 2.0 * size / dim
    return p


# ---------------------------------------------------------------------------
# identity / displacement (deformation_field_test.cpp:92-108)
# ---------------------------------------------------------------------------


def test_identity_field():
    psi = fields.identity_field((4, 5, 6))
    assert psi.shape == (3, 4, 5, 6)
    # channel 0 = x varies along axis -1, channel 2 = z along axis -3
    np.testing.assert_allclose(psi[0, 0, 0], np.arange(6))
    np.testing.assert_allclose(psi[1, 0, :, 0], np.arange(5))
    np.testing.assert_allclose(psi[2, :, 0, 0], np.arange(4))
    np.testing.assert_allclose(fields.displacement(psi), 0.0)


# ---------------------------------------------------------------------------
# tsdf gradient on a sphere (deformation_field_test.cpp:111-149)
# ---------------------------------------------------------------------------


def test_tsdf_gradient_sphere_norm():
    """||grad tsdf|| = voxel_size / trunc_dist on non-truncated voxels."""
    p = make_params(dim=64)
    vol = TsdfVolume(p)
    vol.init_sphere((0.16, 0.16, 0.16), 0.01)

    grad = fields.tsdf_gradient(vol.tsdf)
    gnorm = np.asarray(jnp.linalg.norm(grad, axis=0))
    tsdf = np.asarray(vol.tsdf)

    expected = p.voxel_sizes()[0] / p.tsdf_trunc_dist
    # interior, non-truncated voxels whose full stencil is also non-truncated
    interior = np.abs(tsdf) < 0.75
    mask = interior.copy()
    m = interior
    mask[1:-1, 1:-1, 1:-1] = (
        m[1:-1, 1:-1, 1:-1]
        & m[:-2, 1:-1, 1:-1] & m[2:, 1:-1, 1:-1]
        & m[1:-1, :-2, 1:-1] & m[1:-1, 2:, 1:-1]
        & m[1:-1, 1:-1, :-2] & m[1:-1, 1:-1, 2:]
    )
    mask[0] = mask[-1] = False
    mask[:, 0] = mask[:, -1] = False
    mask[:, :, 0] = mask[:, :, -1] = False
    # exclude voxels near the sphere centre: the SDF d - r is not
    # differentiable at d = 0, so central differences shrink there
    vs = p.voxel_sizes()[0]
    zz, yy, xx = np.meshgrid(*[np.arange(64)] * 3, indexing="ij")
    d_to_c = np.sqrt(
        ((xx + 0.5) * vs - 0.16) ** 2
        + ((yy + 0.5) * vs - 0.16) ** 2
        + ((zz + 0.5) * vs - 0.16) ** 2
    )
    mask &= d_to_c > 3 * vs
    assert mask.sum() > 100
    np.testing.assert_allclose(gnorm[mask], expected, atol=1e-1 * expected)


def test_gradient_zero_on_boundary():
    f = jnp.asarray(np.random.default_rng(0).normal(size=(8, 8, 8)).astype(np.float32))
    g = fields.tsdf_gradient(f)
    # d/dx is zero on x boundary slices, etc.
    np.testing.assert_allclose(g[0][:, :, 0], 0.0)
    np.testing.assert_allclose(g[0][:, :, -1], 0.0)
    np.testing.assert_allclose(g[1][:, 0, :], 0.0)
    np.testing.assert_allclose(g[2][-1], 0.0)


# ---------------------------------------------------------------------------
# jacobian (deformation_field_test.cpp:152-336)
# ---------------------------------------------------------------------------


def test_jacobian_of_uniform_displacement_is_zero():
    psi = fields.identity_field((DIM, DIM, DIM)) + 2.5
    J = fields.deformation_jacobian(psi)
    np.testing.assert_allclose(np.asarray(J), 0.0, atol=1e-5)


def test_jacobian_of_identity_field_is_identity():
    psi = fields.identity_field((DIM, DIM, DIM))
    J = fields.jacobian(psi)
    Jn = np.asarray(J)
    eye = np.eye(3)
    # interior voxels only (boundary slices are zeroed by the stencil)
    inner = Jn[:, :, 1:-1, 1:-1, 1:-1]
    for r in range(3):
        for c in range(3):
            np.testing.assert_allclose(inner[r, c], eye[r, c], atol=1e-5)


def test_jacobian_laplacian_analytic_field():
    """psi = (x(1-y), exp(-z)+y, z): J and L match the analytic derivatives
    (deformation_field_test.cpp:252-336)."""
    n = 16
    ident = fields.identity_field((n, n, n))
    x, y, z = ident[0], ident[1], ident[2]
    psi = jnp.stack([x * (1 - y), jnp.exp(-z) + y, z], axis=0)

    J = fields.jacobian(psi)
    L = fields.neg_laplacian(psi)

    # analytic Jacobian rows: d(psi_x) = (1-y, -x, 0); d(psi_y) = (0, 1, -e^-z); d(psi_z) = (0,0,1)
    inner = (slice(1, -1),) * 3
    np.testing.assert_allclose(np.asarray(J[0, 0])[inner], np.asarray(1 - y)[inner], atol=1e-4)
    np.testing.assert_allclose(np.asarray(J[0, 1])[inner], np.asarray(-x)[inner], atol=1e-4)
    np.testing.assert_allclose(np.asarray(J[0, 2])[inner], 0.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(J[1, 0])[inner], 0.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(J[1, 1])[inner], 1.0, atol=1e-4)
    # central difference of e^-z: -(e^1 - e^-1)/2 * e^-z  -> within tolerance of -e^-z
    np.testing.assert_allclose(
        np.asarray(J[1, 2])[inner], np.asarray(-jnp.exp(-z) * np.sinh(1.0))[inner], atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(J[2, 2])[inner], 1.0, atol=1e-4)

    # neg laplacian: -(sum of axis second differences)
    # psi_x = x(1-y): second diff zero along each axis -> L_x = 0
    np.testing.assert_allclose(np.asarray(L[0])[inner], 0.0, atol=1e-4)
    # psi_y = e^-z + y: d2/dz2 = e^-z * (e - 2 + e^-1); L = -that
    expected = -np.asarray(jnp.exp(-z))[inner] * (np.e - 2.0 + np.exp(-1.0))
    np.testing.assert_allclose(np.asarray(L[1])[inner], expected, atol=1e-4)
    np.testing.assert_allclose(np.asarray(L[2])[inner], 0.0, atol=1e-4)


# ---------------------------------------------------------------------------
# trilinear sampling
# ---------------------------------------------------------------------------


def test_sample_trilinear_exact_on_linear_field():
    """Trilinear interpolation is exact for a linear function."""
    n = 8
    ident = fields.identity_field((n, n, n))
    vol = 1.5 * ident[0] - 0.25 * ident[1] + 2.0 * ident[2] + 3.0

    rng = np.random.default_rng(1)
    pts = rng.uniform(0, n - 1, size=(3, 50)).astype(np.float32)
    got = fields.sample_trilinear(vol, jnp.asarray(pts))
    want = 1.5 * pts[0] - 0.25 * pts[1] + 2.0 * pts[2] + 3.0
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-4)


def test_sample_trilinear_clamps():
    n = 4
    vol = jnp.arange(n**3, dtype=jnp.float32).reshape(n, n, n)
    pts = jnp.asarray([[-5.0, 10.0], [0.0, 10.0], [0.0, 10.0]])  # (x,y,z) columns
    got = np.asarray(fields.sample_trilinear(vol, pts))
    assert got[0] == vol[0, 0, 0]
    assert got[1] == vol[n - 1, n - 1, n - 1]


def test_warp_identity_is_noop():
    p = make_params()
    vol = TsdfVolume(p)
    vol.init_sphere((0.12, 0.12, 0.12), 0.02)
    psi = fields.identity_field(vol.dims_zyx)
    warped, w = fields.warp_tsdf(vol.tsdf, vol.weight, psi)
    np.testing.assert_allclose(np.asarray(warped), np.asarray(vol.tsdf), atol=1e-6)
    np.testing.assert_allclose(np.asarray(w), np.asarray(vol.weight), atol=1e-6)


def test_warp_translation_shifts_field():
    """Warping by psi = id + (1,0,0) samples phi at x+1."""
    n = 8
    vol = jnp.asarray(
        np.random.default_rng(2).normal(size=(n, n, n)).astype(np.float32)
    )
    psi = fields.identity_field((n, n, n)).at[0].add(1.0)
    warped, _ = fields.warp_tsdf(vol, jnp.ones_like(vol), psi)
    np.testing.assert_allclose(
        np.asarray(warped)[:, :, :-1], np.asarray(vol)[:, :, 1:], atol=1e-6
    )


# ---------------------------------------------------------------------------
# inverse field (vector_fields.cu:111-138)
# ---------------------------------------------------------------------------


def test_estimate_inverse_of_smooth_translation():
    """For a small constant displacement the inverse is the negation."""
    n = 16
    psi = fields.identity_field((n, n, n)).at[0].add(0.5)
    psi_inv = fields.estimate_inverse(psi)
    disp_inv = np.asarray(fields.displacement(psi_inv))
    inner = (slice(2, -2),) * 3
    np.testing.assert_allclose(disp_inv[0][inner], -0.5, atol=1e-3)
    np.testing.assert_allclose(disp_inv[1][inner], 0.0, atol=1e-3)
    np.testing.assert_allclose(disp_inv[2][inner], 0.0, atol=1e-3)


def test_deformation_field_wrapper():
    df = fields.DeformationField((6, 5, 4))
    assert df.data.shape == (3, 4, 5, 6)
    assert df.no_nans()
    df.data = df.data.at[0].add(jnp.nan)
    assert not df.no_nans()


def test_interpolate_gradient_and_laplacian_at_identity():
    """Warp-composed differentials at the identity equal the plain ones
    (reference interpolate_gradient/laplacian, vector_fields.cu:210-272)."""
    rng = np.random.default_rng(7)
    dims = (12, 10, 8)
    tsdf = jnp.asarray(rng.standard_normal(dims), jnp.float32)
    psi = fields.identity_field(dims)
    np.testing.assert_allclose(
        np.asarray(fields.interpolate_gradient(tsdf, psi)),
        np.asarray(fields.tsdf_gradient(tsdf)),
        atol=1e-6,
    )
    f = jnp.asarray(rng.standard_normal((3,) + dims), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(fields.interpolate_laplacian(f, psi)),
        np.asarray(fields.neg_laplacian(f)),
        atol=1e-6,
    )


def test_estimate_inverse_window_matches_exact():
    dims = (16, 16, 16)
    psi = fields.identity_field(dims) + 0.6 * jnp.sin(
        fields.identity_field(dims) * 0.4
    )
    inv_exact = fields.estimate_inverse(psi, 16)
    inv_win = fields.estimate_inverse_window(psi, 16, 3)
    np.testing.assert_allclose(
        np.asarray(inv_win), np.asarray(inv_exact), atol=1e-5
    )


def test_zoffset_samplers_match_plain_window():
    """The z-offset variants with z0=0 and the full volume must equal the
    plain windowed samplers."""
    rng = np.random.default_rng(9)
    dims = (12, 10, 8)
    vol = jnp.asarray(rng.standard_normal(dims), jnp.float32)
    psi = fields.identity_field(dims) + jnp.asarray(
        rng.uniform(-2, 2, (3,) + dims), jnp.float32
    )
    np.testing.assert_allclose(
        np.asarray(fields.sample_trilinear_window_zoffset(vol, psi, 0, 3)),
        np.asarray(fields.sample_trilinear_window(vol, psi, 3)),
        atol=1e-6,
    )
    w = jnp.asarray((rng.random(dims) > 0.5), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(fields.sample_nearest_floor_window_zoffset(w, psi, 0, 3)),
        np.asarray(fields.sample_nearest_floor_window(w, psi, 3)),
        atol=0,
    )


def test_hybrid_window_exact_matches_exact_sampler():
    """sample_hybrid_window_exact == the exact gather sampler on a field
    mixing sub-voxel background with a far-out-of-window region, for both
    the trilinear and the floor rule, and under capacity overflow (the
    lax.cond full-exact fallback)."""
    rng = np.random.default_rng(3)
    dims = (16, 24, 32)
    vol = jnp.asarray(rng.normal(size=dims), jnp.float32)
    ident = fields.identity_field(dims)
    # smooth sub-voxel background
    disp = 0.4 * jnp.asarray(
        np.sin(np.stack(np.meshgrid(
            np.linspace(0, 3, dims[0]), np.linspace(0, 2, dims[1]),
            np.linspace(0, 4, dims[2]), indexing="ij",
        ))), jnp.float32,
    )
    # a blob of large displacement (way outside window 2)
    blob = np.zeros((3,) + dims, np.float32)
    blob[0, 4:9, 6:12, 8:16] = 6.3
    blob[2, 4:9, 6:12, 8:16] = -5.1
    psi = ident + disp + jnp.asarray(blob)

    exact = fields.sample_trilinear(vol, psi)
    hyb = fields.sample_hybrid_window_exact(vol, psi, max_disp=2)
    np.testing.assert_allclose(np.asarray(hyb), np.asarray(exact), atol=1e-5)

    exact_f = fields.sample_nearest_floor(vol, psi)
    hyb_f = fields.sample_hybrid_window_exact(vol, psi, max_disp=2, floor=True)
    np.testing.assert_array_equal(np.asarray(hyb_f), np.asarray(exact_f))

    # overflow: cap smaller than the blob voxel count -> exact fallback
    hyb_o = fields.sample_hybrid_window_exact(vol, psi, max_disp=2, cap=16)
    np.testing.assert_allclose(
        np.asarray(hyb_o), np.asarray(exact), atol=1e-6
    )
