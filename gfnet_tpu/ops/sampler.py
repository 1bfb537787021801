"""Bilinear grid sampling with exact `F.grid_sample` semantics.

The reference leans on cuDNN grid_sample for flow-warping
(`model/network.py:537,547`) and local-correlation window sampling
(`utils/local_correlation.py:56-58`), always with `align_corners=False`,
bilinear, zero padding. Checkpoint-transfer accuracy hinges on matching those
border semantics exactly (SURVEY.md §7 hard part #1) — golden-tested against
torch in tests/test_sampler.py.

Layout is NHWC; the gather is expressed with flat advanced indexing which XLA
lowers to a single gather op. The hot structured case (regular-spacing local
windows) bypasses this entirely — see ops/local_correlation.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def grid_sample(
    img: Array,
    grid: Array,
    align_corners: bool = False,
    padding_mode: str = "zeros",
) -> Array:
    """Sample `img` (B, H, W, C) at normalized xy `grid` (B, ..., 2).

    Returns (B, ..., C). grid[..., 0] is x in [-1, 1], grid[..., 1] is y.
    """
    assert padding_mode in ("zeros", "border")
    b, h, w, c = img.shape
    out_shape = grid.shape[:-1] + (c,)
    grid = grid.reshape(b, -1, 2)
    n = grid.shape[1]

    gx, gy = grid[..., 0], grid[..., 1]
    if align_corners:
        x = (gx + 1) * 0.5 * (w - 1)
        y = (gy + 1) * 0.5 * (h - 1)
    else:
        x = ((gx + 1) * w - 1) * 0.5
        y = ((gy + 1) * h - 1) * 0.5

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yi: Array, xi: Array) -> tuple[Array, Array]:
        if padding_mode == "zeros":
            valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        else:
            valid = jnp.ones(xi.shape, dtype=bool)
        xc = jnp.clip(xi, 0, w - 1)
        yc = jnp.clip(yi, 0, h - 1)
        flat = img.reshape(b, h * w, c)
        vals = jnp.take_along_axis(
            flat, (yc * w + xc)[..., None], axis=1
        )  # (B, N, C)
        return vals, valid

    v00, m00 = gather(y0i, x0i)
    v01, m01 = gather(y0i, x0i + 1)
    v10, m10 = gather(y0i + 1, x0i)
    v11, m11 = gather(y0i + 1, x0i + 1)

    w00 = ((1 - wy) * (1 - wx))[..., None]
    w01 = ((1 - wy) * wx)[..., None]
    w10 = (wy * (1 - wx))[..., None]
    w11 = (wy * wx)[..., None]
    if padding_mode == "zeros":
        w00 = jnp.where(m00[..., None], w00, 0)
        w01 = jnp.where(m01[..., None], w01, 0)
        w10 = jnp.where(m10[..., None], w10, 0)
        w11 = jnp.where(m11[..., None], w11, 0)
    out = v00 * w00.astype(img.dtype) + v01 * w01.astype(img.dtype) \
        + v10 * w10.astype(img.dtype) + v11 * w11.astype(img.dtype)
    return out.reshape(out_shape)
