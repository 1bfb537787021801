"""Projective geometry primitives, pure jnp.

Covers the reference's kornia usage and normalized↔pixel conventions:
  - coordinate conventions        ref `utils/utils.py:12-15`, `model/network.py:362-367`
  - transform_points              ref kornia.geometry.linalg.transform_points
                                  (used in `losses/robust_loss.py:26`,
                                  `datasets/generate_random_H_large_size.py:65`)
  - get_perspective_transform     ref kornia.geometry.transform (4-point solve,
                                  `datasets/generate_random_H_large_size.py:30,71`)
  - warp_perspective              ref kornia warp (`...large_size.py:33,83`,
                                  `datasets/homography_dataset_large_size.py:207`)

All functions are batched and jit/vmap friendly; shapes are static.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def normalized_grid(h: int, w: int, dtype=jnp.float32) -> Array:
    """Pixel-center grid in the [-1+1/n, 1-1/n] convention, xy order.

    Matches `torch.linspace(-1+1/G, 1-1/G, G)` meshgrid stacking used all over
    the reference (`model/network.py:362-367,432-437`). Returns (h, w, 2).
    """
    ys = jnp.linspace(-1 + 1 / h, 1 - 1 / h, h, dtype=dtype)
    xs = jnp.linspace(-1 + 1 / w, 1 - 1 / w, w, dtype=dtype)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([gx, gy], axis=-1)


def unnormalize_coords(xn: Array, h: int, w: int) -> Array:
    """[-1,1] normalized → pixel coords in [0.5, n-0.5] (ref `utils/utils.py:12-15`)."""
    x = (xn[..., 0] + 1) * (w / 2)
    y = (xn[..., 1] + 1) * (h / 2)
    return jnp.stack([x, y], axis=-1)


def normalize_coords(x: Array, h: int, w: int) -> Array:
    """Inverse of :func:`unnormalize_coords`."""
    xn = x[..., 0] * (2 / w) - 1
    yn = x[..., 1] * (2 / h) - 1
    return jnp.stack([xn, yn], axis=-1)


def denormalize_corner_aligned(xn: Array, h: int, w: int) -> Array:
    """[-1,1] normalized → pixel coords via the (n-1) corner-aligned convention.

    Matches `convert_coordinates` in the reference eval path
    (`estimation.py:26-45`): pixel = (n-1) * (x+1)/2.
    """
    x = (w - 1) * (xn[..., 0] + 1) / 2
    y = (h - 1) * (xn[..., 1] + 1) / 2
    return jnp.stack([x, y], axis=-1)


def transform_points(H: Array, pts: Array, eps: float = 1e-8) -> Array:
    """Apply projective transform(s) H (..., 3, 3) to points (..., N, 2)."""
    ones = jnp.ones_like(pts[..., :1])
    ph = jnp.concatenate([pts, ones], axis=-1)  # (..., N, 3)
    out = jnp.einsum("...ij,...nj->...ni", H, ph)
    z = out[..., 2:3]
    z = jnp.where(jnp.abs(z) < eps, jnp.where(z < 0, -eps, eps), z)
    return out[..., :2] / z


def get_perspective_transform(src: Array, dst: Array) -> Array:
    """Exact homography from 4 correspondences via an 8x8 linear solve.

    src, dst: (..., 4, 2) pixel coords. Returns (..., 3, 3) with H[2,2]=1.
    Equivalent to kornia's `get_perspective_transform`
    (ref `datasets/generate_random_H_large_size.py:30`).
    """
    # Normalize both point sets to ~unit scale for f32 conditioning, solve,
    # then denormalize: H = T_dst^{-1} @ Hn @ T_src.
    def norm_params(p):
        mean = jnp.mean(p, axis=-2, keepdims=True)
        scale = jnp.mean(jnp.abs(p - mean), axis=(-2, -1), keepdims=True) + 1e-8
        return mean, scale

    sm, ss = norm_params(src)
    dm, ds = norm_params(dst)
    sn = (src - sm) / ss
    dn = (dst - dm) / ds

    x, y = sn[..., 0], sn[..., 1]  # (..., 4)
    u, v = dn[..., 0], dn[..., 1]
    zeros = jnp.zeros_like(x)
    ones = jnp.ones_like(x)
    # Rows for u: [x y 1 0 0 0 -ux -uy]; rows for v: [0 0 0 x y 1 -vx -vy]
    rows_u = jnp.stack([x, y, ones, zeros, zeros, zeros, -u * x, -u * y], axis=-1)
    rows_v = jnp.stack([zeros, zeros, zeros, x, y, ones, -v * x, -v * y], axis=-1)
    A = jnp.concatenate([rows_u, rows_v], axis=-2)  # (..., 8, 8)
    b = jnp.concatenate([u, v], axis=-1)[..., None]  # (..., 8, 1)
    h = jnp.linalg.solve(A, b)[..., 0]  # (..., 8)
    Hn = jnp.concatenate([h, jnp.ones_like(h[..., :1])], axis=-1)
    Hn = Hn.reshape(*Hn.shape[:-1], 3, 3)

    batch = Hn.shape[:-2]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=Hn.dtype), batch + (3, 3))
    ssq = jnp.squeeze(ss, axis=(-2, -1))[..., None, None]
    dsq = jnp.squeeze(ds, axis=(-2, -1))[..., None, None]
    # T_src: p -> (p - sm) / ss
    T_src = eye / ssq
    T_src = T_src.at[..., 0, 2].set(-sm[..., 0, 0] / jnp.squeeze(ssq, (-2, -1)))
    T_src = T_src.at[..., 1, 2].set(-sm[..., 0, 1] / jnp.squeeze(ssq, (-2, -1)))
    T_src = T_src.at[..., 2, 2].set(1.0)
    # T_dst^{-1}: q -> q * ds + dm
    T_dst_inv = eye * dsq
    T_dst_inv = T_dst_inv.at[..., 0, 2].set(dm[..., 0, 0])
    T_dst_inv = T_dst_inv.at[..., 1, 2].set(dm[..., 0, 1])
    T_dst_inv = T_dst_inv.at[..., 2, 2].set(1.0)
    H = T_dst_inv @ Hn @ T_src
    return H / H[..., 2:3, 2:3]


def warp_perspective(
    img: Array,
    H: Array,
    out_hw: tuple[int, int],
    align_corners: bool = True,
) -> Array:
    """Inverse-warp `img` (B, H, W, C) by homography H (B, 3, 3), NHWC.

    dst(x) = src(H^{-1} x), bilinear, zero padding — matching kornia's
    `warp_perspective` (default align_corners True as used at
    `datasets/homography_dataset_large_size.py:207`).
    """
    from gfnet_tpu.ops.sampler import grid_sample

    b = img.shape[0]
    oh, ow = out_hw
    gy, gx = jnp.meshgrid(
        jnp.arange(oh, dtype=img.dtype), jnp.arange(ow, dtype=img.dtype), indexing="ij"
    )
    pts = jnp.stack([gx, gy], axis=-1).reshape(1, oh * ow, 2)
    pts = jnp.broadcast_to(pts, (b, oh * ow, 2))
    Hinv = jnp.linalg.inv(H)
    src = transform_points(Hinv, pts).reshape(b, oh, ow, 2)
    ih, iw = img.shape[1], img.shape[2]
    if align_corners:
        grid = jnp.stack(
            [src[..., 0] * (2 / max(iw - 1, 1)) - 1, src[..., 1] * (2 / max(ih - 1, 1)) - 1],
            axis=-1,
        )
    else:
        grid = jnp.stack(
            [(2 * src[..., 0] + 1) / iw - 1, (2 * src[..., 1] + 1) / ih - 1], axis=-1
        )
    return grid_sample(img, grid, align_corners=align_corners, padding_mode="zeros")
