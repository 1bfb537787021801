"""On-device robust homography estimation.

Replaces the reference's CPU OpenCV call
`cv2.findHomography(..., cv2.RANSAC, confidence=0.99999, ransacReprojThreshold=3)`
(ref `estimation.py:66-72`) with a fully batched, jit-compiled TPU pipeline:

  1. vectorized RANSAC: K minimal 4-point hypotheses solved in one batched
     8x8 `linalg.solve` (MXU-friendly), inliers counted with one matmul-shaped
     transfer-error pass over all N matches;
  2. least-squares refit on the best hypothesis' inliers via weighted,
     Hartley-normalized DLT (9x9 eigendecomposition);
  3. a few IRLS re-weighting steps for robustness.

Everything is static-shape: N matches, K hypotheses, fixed IRLS iterations.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from gfnet_tpu.core.geometry import get_perspective_transform, transform_points

Array = jax.Array


def _normalization_transform(pts: Array, w: Array) -> Array:
    """Weighted Hartley normalization: translate to centroid, scale mean dist to sqrt(2).

    pts (N, 2), w (N,) nonnegative. Returns (3, 3) similarity T with
    T @ pts_h having zero mean and average distance sqrt(2).
    """
    wsum = jnp.sum(w) + 1e-12
    mean = jnp.sum(pts * w[:, None], axis=0) / wsum
    d = jnp.sqrt(jnp.sum((pts - mean) ** 2, axis=-1))
    mean_d = jnp.sum(d * w) / wsum
    s = jnp.sqrt(2.0) / (mean_d + 1e-12)
    T = jnp.array(
        [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], dtype=pts.dtype
    )
    T = T.at[0, 0].set(s).at[1, 1].set(s)
    T = T.at[0, 2].set(-s * mean[0]).at[1, 2].set(-s * mean[1])
    return T


def dlt_homography(
    src: Array, dst: Array, weights: Array | None = None, method: str = "solve"
) -> Array:
    """Weighted DLT homography from N>=4 correspondences.

    src, dst: (N, 2) pixel coords; weights: (N,) nonnegative. Returns (3, 3)
    with H[2,2] normalized to 1.

    method="solve" (default): fix h22=1 in the Hartley-normalized frame and
    solve the 8x8 weighted normal equations — one `linalg.solve`, ~10x
    faster on TPU than the eigendecomposition and numerically safe because
    normalization keeps h22 well away from 0 for real homographies (the
    same parameterization OpenCV's LMEDS/RANSAC refinement uses).
    method="eigh": smallest eigenvector of the 9x9 normal matrix (exact
    total-least-squares null space; slower — TPU eigh is iterative).
    """
    n = src.shape[0]
    w = jnp.ones((n,), src.dtype) if weights is None else weights
    T1 = _normalization_transform(src, w)
    T2 = _normalization_transform(dst, w)
    s = transform_points(T1, src[None])[0]
    d = transform_points(T2, dst[None])[0]
    x, y = s[..., 0], s[..., 1]
    u, v = d[..., 0], d[..., 1]
    zeros = jnp.zeros_like(x)
    ones = jnp.ones_like(x)
    rows_u = jnp.stack(
        [x, y, ones, zeros, zeros, zeros, -u * x, -u * y, -u], axis=-1
    )
    rows_v = jnp.stack(
        [zeros, zeros, zeros, x, y, ones, -v * x, -v * y, -v], axis=-1
    )
    A = jnp.concatenate([rows_u, rows_v], axis=0)  # (2N, 9)
    Wv = jnp.concatenate([w, w], axis=0)[:, None]
    if method == "eigh":
        M = (A * Wv).T @ A  # (9, 9)
        evals, evecs = jnp.linalg.eigh(M.astype(jnp.float32))
        h = evecs[:, 0]
        Hn = h.reshape(3, 3)
    else:
        A8, a9 = A[:, :8], A[:, 8]
        M8 = (A8 * Wv).T @ A8  # (8, 8)
        b8 = -(A8 * Wv).T @ a9
        M8 = M8 + 1e-8 * jnp.eye(8, dtype=M8.dtype)
        h8 = jnp.linalg.solve(M8, b8)
        Hn = jnp.concatenate([h8, jnp.ones((1,), h8.dtype)]).reshape(3, 3)
    H = jnp.linalg.inv(T2) @ Hn @ T1
    return H / jnp.where(jnp.abs(H[2, 2]) < 1e-12, 1e-12, H[2, 2])


def transfer_error(H: Array, src: Array, dst: Array) -> Array:
    """One-way transfer error |H(src) - dst| per correspondence, (..., N)."""
    proj = transform_points(H, src)
    return jnp.linalg.norm(proj - dst, axis=-1)


def irls_homography(
    src: Array,
    dst: Array,
    weights: Array,
    iters: int = 4,
    sigma: float = 3.0,
    init_H: Array | None = None,
) -> Array:
    """IRLS-refined weighted DLT with a Cauchy robust kernel.

    weights are prior match confidences; per-iteration the effective weight is
    prior * 1/(1 + (r/sigma)^2).
    """
    H0 = dlt_homography(src, dst, weights) if init_H is None else init_H

    def body(_, H):
        r = transfer_error(H[None], src[None], dst[None])[0]
        w = weights / (1.0 + (r / sigma) ** 2)
        return dlt_homography(src, dst, w)

    return jax.lax.fori_loop(0, iters, body, H0)


@partial(jax.jit, static_argnames=("num_hypotheses", "irls_iters"))
def ransac_homography(
    src: Array,
    dst: Array,
    weights: Array | None = None,
    key: Array | None = None,
    num_hypotheses: int = 512,
    threshold: float = 3.0,
    irls_iters: int = 4,
) -> tuple[Array, Array]:
    """Vectorized RANSAC + inlier least-squares refit, fully on device.

    src, dst: (N, 2) pixel coords. Returns (H (3,3), inlier_mask (N,)).

    TPU mapping: the K minimal solves are one batched (K,8,8) solve; the
    K x N error table is a couple of (K,N) element-wise passes — no host
    round-trip, unlike the reference's cv2.RANSAC (`estimation.py:66-72`).
    """
    n = src.shape[0]
    if key is None:
        key = jax.random.PRNGKey(0)
    if weights is None:
        weights = jnp.ones((n,), src.dtype)

    # Minimal sample indices (K, 4). Duplicate picks yield degenerate H that
    # simply scores few inliers, so uniform-with-replacement is safe.
    idx = jax.random.randint(key, (num_hypotheses, 4), 0, n)
    s4 = src[idx]  # (K, 4, 2)
    d4 = dst[idx]
    Hs = get_perspective_transform(s4, d4)  # (K, 3, 3)
    finite = jnp.all(jnp.isfinite(Hs.reshape(num_hypotheses, 9)), axis=-1)

    err = transfer_error(Hs, src[None], dst[None])  # (K, N)
    inl = (err < threshold).astype(jnp.float32)
    score = jnp.sum(inl * weights[None, :], axis=-1)
    score = jnp.where(finite, score, -1.0)
    best = jnp.argmax(score)
    best_inl = inl[best]

    # Guard: if RANSAC found nothing (degenerate input), fall back to priors.
    w_fit = jnp.where(jnp.sum(best_inl) >= 4, best_inl * weights, weights)
    H = irls_homography(src, dst, w_fit, iters=irls_iters, sigma=threshold)
    final_err = transfer_error(H[None], src[None], dst[None])[0]
    return H, final_err < threshold


def corner_error(
    H_pred: Array, H_gt: Array, w: float, h: float, cap: float = 70.0
) -> Array:
    """Mean 4-corner transfer error, capped — the ACE metric
    (ref `estimation.py:79-92`)."""
    corners = jnp.array(
        [[0.0, 0.0], [0.0, h - 1], [w - 1, 0.0], [w - 1, h - 1]], dtype=jnp.float32
    )
    c_gt = transform_points(H_gt, corners)
    c_pred = transform_points(H_pred, corners)
    err = jnp.mean(jnp.linalg.norm(c_gt - c_pred, axis=-1))
    return jnp.minimum(err, cap)
