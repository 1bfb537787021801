import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gfnet_tpu.core.geometry import (
    get_perspective_transform,
    normalized_grid,
    transform_points,
    unnormalize_coords,
    normalize_coords,
    warp_perspective,
)
from gfnet_tpu.core.homography import (
    corner_error,
    dlt_homography,
    irls_homography,
    ransac_homography,
    transfer_error,
)


def random_h(rng, scale=0.3):
    """A well-conditioned random homography around identity."""
    H = np.eye(3)
    H[:2, :2] += rng.uniform(-scale, scale, (2, 2))
    H[:2, 2] = rng.uniform(-20, 20, 2)
    H[2, :2] = rng.uniform(-1e-3, 1e-3, 2)
    return H


def test_normalized_grid_matches_reference_convention():
    g = normalized_grid(4, 8)
    assert g.shape == (4, 8, 2)
    np.testing.assert_allclose(g[0, 0], [-1 + 1 / 8, -1 + 1 / 4], atol=1e-6)
    np.testing.assert_allclose(g[-1, -1], [1 - 1 / 8, 1 - 1 / 4], atol=1e-6)


def test_coord_roundtrip():
    rng = np.random.default_rng(0)
    xn = jnp.asarray(rng.uniform(-1, 1, (5, 2)).astype(np.float32))
    x = unnormalize_coords(xn, 37, 91)
    back = normalize_coords(x, 37, 91)
    np.testing.assert_allclose(back, xn, atol=1e-5)


def test_transform_points_projective():
    rng = np.random.default_rng(1)
    H = jnp.asarray(random_h(rng), dtype=jnp.float32)
    pts = jnp.asarray(rng.uniform(0, 100, (10, 2)).astype(np.float32))
    out = transform_points(H, pts)
    ph = np.concatenate([np.asarray(pts), np.ones((10, 1))], axis=-1)
    exp = (np.asarray(H) @ ph.T).T
    exp = exp[:, :2] / exp[:, 2:]
    np.testing.assert_allclose(out, exp, rtol=1e-4, atol=1e-3)


def test_get_perspective_transform_exact():
    rng = np.random.default_rng(2)
    for _ in range(5):
        H_true = random_h(rng)
        src = rng.uniform(0, 448, (4, 2))
        ph = np.concatenate([src, np.ones((4, 1))], -1)
        dst = (H_true @ ph.T).T
        dst = dst[:, :2] / dst[:, 2:]
        H = get_perspective_transform(
            jnp.asarray(src, jnp.float32), jnp.asarray(dst, jnp.float32)
        )
        Hn = np.asarray(H) / np.asarray(H)[2, 2]
        Ht = H_true / H_true[2, 2]
        np.testing.assert_allclose(Hn, Ht, rtol=1e-3, atol=1e-3)


def test_get_perspective_transform_batched():
    rng = np.random.default_rng(3)
    src = jnp.asarray(rng.uniform(0, 100, (6, 4, 2)).astype(np.float32))
    dst = jnp.asarray(rng.uniform(0, 100, (6, 4, 2)).astype(np.float32))
    H = get_perspective_transform(src, dst)
    assert H.shape == (6, 3, 3)
    proj = transform_points(H, src)
    np.testing.assert_allclose(proj, dst, atol=0.1)


def test_dlt_recovers_exact_homography():
    rng = np.random.default_rng(4)
    H_true = random_h(rng)
    src = rng.uniform(0, 448, (50, 2))
    ph = np.concatenate([src, np.ones((50, 1))], -1)
    dst = (H_true @ ph.T).T
    dst = dst[:, :2] / dst[:, 2:]
    H = dlt_homography(jnp.asarray(src, jnp.float32), jnp.asarray(dst, jnp.float32))
    err = transfer_error(H[None], jnp.asarray(src[None], jnp.float32), jnp.asarray(dst[None], jnp.float32))
    assert float(jnp.max(err)) < 0.05


def test_irls_downweights_outliers():
    rng = np.random.default_rng(5)
    H_true = random_h(rng)
    n = 200
    src = rng.uniform(0, 448, (n, 2))
    ph = np.concatenate([src, np.ones((n, 1))], -1)
    dst = (H_true @ ph.T).T
    dst = dst[:, :2] / dst[:, 2:]
    dst += rng.normal(0, 0.5, dst.shape)  # inlier noise
    n_out = 40
    dst[:n_out] = rng.uniform(0, 448, (n_out, 2))  # gross outliers
    w = jnp.ones((n,), jnp.float32)
    H = irls_homography(
        jnp.asarray(src, jnp.float32), jnp.asarray(dst, jnp.float32), w, iters=6
    )
    ce = corner_error(H, jnp.asarray(H_true, jnp.float32), 448, 448)
    assert float(ce) < 3.0


def test_ransac_robust_to_heavy_outliers():
    rng = np.random.default_rng(6)
    H_true = random_h(rng)
    n = 1000
    src = rng.uniform(0, 448, (n, 2))
    ph = np.concatenate([src, np.ones((n, 1))], -1)
    dst = (H_true @ ph.T).T
    dst = dst[:, :2] / dst[:, 2:]
    dst += rng.normal(0, 0.3, dst.shape)
    n_out = 400  # 40% outliers
    dst[:n_out] = rng.uniform(0, 448, (n_out, 2))
    H, inl = ransac_homography(
        jnp.asarray(src, jnp.float32),
        jnp.asarray(dst, jnp.float32),
        key=jax.random.PRNGKey(0),
    )
    ce = corner_error(H, jnp.asarray(H_true, jnp.float32), 448, 448)
    assert float(ce) < 2.0
    # most true inliers recovered
    assert int(jnp.sum(inl[n_out:])) > 500


def test_ransac_matches_opencv_quality():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(7)
    H_true = random_h(rng)
    n = 2000
    src = rng.uniform(0, 448, (n, 2))
    ph = np.concatenate([src, np.ones((n, 1))], -1)
    dst = (H_true @ ph.T).T
    dst = dst[:, :2] / dst[:, 2:]
    dst += rng.normal(0, 1.0, dst.shape)
    dst[:600] = rng.uniform(0, 448, (600, 2))

    H_cv, _ = cv2.findHomography(
        src.astype(np.float32), dst.astype(np.float32), cv2.RANSAC, 3.0
    )
    H_us, _ = ransac_homography(
        jnp.asarray(src, jnp.float32),
        jnp.asarray(dst, jnp.float32),
        key=jax.random.PRNGKey(1),
    )
    ce_cv = float(corner_error(jnp.asarray(H_cv, jnp.float32), jnp.asarray(H_true, jnp.float32), 448, 448))
    ce_us = float(corner_error(H_us, jnp.asarray(H_true, jnp.float32), 448, 448))
    assert ce_us < max(2 * ce_cv, 1.0)


def test_warp_perspective_identity():
    rng = np.random.default_rng(8)
    img = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32))
    H = jnp.broadcast_to(jnp.eye(3), (2, 3, 3))
    out = warp_perspective(img, H, (16, 16))
    np.testing.assert_allclose(out, img, atol=1e-5)


def test_warp_perspective_translation():
    img = np.zeros((1, 8, 8, 1), np.float32)
    img[0, 2, 3, 0] = 1.0
    # dst(x) = src(H^-1 x): H = translation by (+2, +1) moves the pixel
    H = np.eye(3, dtype=np.float32)
    H[0, 2] = 2.0
    H[1, 2] = 1.0
    out = warp_perspective(jnp.asarray(img), jnp.asarray(H[None]), (8, 8))
    assert float(out[0, 3, 5, 0]) == pytest.approx(1.0, abs=1e-5)
