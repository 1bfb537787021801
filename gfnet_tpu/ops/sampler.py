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

TPU row-gathers cost ~per index row, not per byte, at these tiny row widths
(C=8..32 → 16..64B rows). For large point counts the packed lowering below
pre-concatenates each pixel's 2x2 neighborhood into channels so ONE gather
row fetches all four bilinear corners — 4x fewer index rows, measured 2.1x
faster at the fine-refiner warp shapes (scripts/profile_warp.py, v5e) and
bit-identical. `grid_sample` auto-dispatches on static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _unnormalize(grid: Array, h: int, w: int, align_corners: bool):
    gx, gy = grid[..., 0], grid[..., 1]
    if align_corners:
        x = (gx + 1) * 0.5 * (w - 1)
        y = (gy + 1) * 0.5 * (h - 1)
    else:
        x = ((gx + 1) * w - 1) * 0.5
        y = ((gy + 1) * h - 1) * 0.5
    return x, y


def _grid_sample_packed(img: Array, grid: Array, align_corners: bool) -> Array:
    """Single-gather bilinear sampling, zeros padding only.

    Pads by 2 so every clipped out-of-range index row lands on zero padding —
    exactly reproducing the zero-contribution of invalid corners in the base
    lowering (torch `padding_mode="zeros"`, ref `local_correlation.py:56-58`).
    Non-finite coords map to far-out-of-range, i.e. sample to 0.
    """
    b, h, w, c = img.shape
    out_shape = grid.shape[:-1] + (c,)
    grid = grid.reshape(b, -1, 2)

    x, y = _unnormalize(grid, h, w, align_corners)
    x = jnp.where(jnp.isfinite(x), x, -1e9)
    y = jnp.where(jnp.isfinite(y), y, -1e9)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    # weight products stay in f32 and cast at the final multiply — matches
    # _grid_sample_base so the shape-heuristic dispatch never changes results
    # (for bf16 images too, the hot refiner warp path)
    wx = x - x0
    wy = y - y0

    pad = 2
    imgp = jnp.pad(img, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    hp, wp = h + 2 * pad, w + 2 * pad
    # packed[y, x] = [img[y,x], img[y,x+1], img[y+1,x], img[y+1,x+1]]
    packed = jnp.concatenate(
        [imgp[:, :-1, :-1], imgp[:, :-1, 1:], imgp[:, 1:, :-1], imgp[:, 1:, 1:]],
        axis=-1,
    )  # (B, hp-1, wp-1, 4C)

    yb = jnp.clip(y0.astype(jnp.int32) + pad, 0, hp - 2)
    xb = jnp.clip(x0.astype(jnp.int32) + pad, 0, wp - 2)
    flat = packed.reshape(b, (hp - 1) * (wp - 1), 4 * c)
    vals = jnp.take_along_axis(flat, (yb * (wp - 1) + xb)[..., None], axis=1)
    v00, v01, v10, v11 = jnp.split(vals, 4, axis=-1)
    out = (
        v00 * ((1 - wy) * (1 - wx))[..., None].astype(img.dtype)
        + v01 * ((1 - wy) * wx)[..., None].astype(img.dtype)
        + v10 * (wy * (1 - wx))[..., None].astype(img.dtype)
        + v11 * (wy * wx)[..., None].astype(img.dtype)
    )
    return out.reshape(out_shape)


def _grid_sample_patch(img: Array, grid: Array, align_corners: bool) -> Array:
    """Patch-slice bilinear sampling, zeros padding only.

    ONE `lax.gather` of contiguous (2, 2, C) slices per point instead of
    index-row lookups — the TPU executes multi-element slice_sizes as wide
    contiguous copies (same trick as ops/local_correlation's patch impl,
    where it measured ~10x over the row-gather form). Semantics identical to
    the base lowering: zero padding via a 2-cell margin + CLIP mode, so every
    out-of-range corner lands on zeros.
    """
    b, h, w, c = img.shape
    out_shape = grid.shape[:-1] + (c,)
    grid = grid.reshape(b, -1, 2)
    n = grid.shape[1]

    x, y = _unnormalize(grid, h, w, align_corners)
    x = jnp.where(jnp.isfinite(x), x, -1e9)
    y = jnp.where(jnp.isfinite(y), y, -1e9)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    pad = 2
    imgp = jnp.pad(img, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    hp, wp = h + 2 * pad, w + 2 * pad
    yb = jnp.clip(y0.astype(jnp.int32) + pad, 0, hp - 2)
    xb = jnp.clip(x0.astype(jnp.int32) + pad, 0, wp - 2)
    bidx = jnp.broadcast_to(jnp.arange(b, dtype=jnp.int32)[:, None], (b, n))
    starts = jnp.stack([bidx, yb, xb], axis=-1).reshape(b * n, 3)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),
        collapsed_slice_dims=(0,),
        start_index_map=(0, 1, 2),
    )
    patch = jax.lax.gather(
        imgp, starts, dnums, slice_sizes=(1, 2, 2, c),
        mode=jax.lax.GatherScatterMode.CLIP,
    ).reshape(b, n, 2, 2, c)

    # weight products in f32, cast at the final multiply — identical
    # arithmetic to _grid_sample_packed/_base so dispatch never changes results
    out = (
        patch[:, :, 0, 0] * ((1 - wy) * (1 - wx))[..., None].astype(img.dtype)
        + patch[:, :, 0, 1] * ((1 - wy) * wx)[..., None].astype(img.dtype)
        + patch[:, :, 1, 0] * (wy * (1 - wx))[..., None].astype(img.dtype)
        + patch[:, :, 1, 1] * (wy * wx)[..., None].astype(img.dtype)
    )
    return out.reshape(out_shape)


def grid_sample(
    img: Array,
    grid: Array,
    align_corners: bool = False,
    padding_mode: str = "zeros",
    impl: str = "auto",
) -> Array:
    """Sample `img` (B, H, W, C) at normalized xy `grid` (B, ..., 2).

    Returns (B, ..., C). grid[..., 0] is x in [-1, 1], grid[..., 1] is y.
    """
    assert padding_mode in ("zeros", "border")
    if impl == "patch" or (
        impl == "auto"
        and padding_mode == "zeros"
        and jax.default_backend() in ("tpu", "axon")
    ):
        # patch-slice gather: fastest on TPU at every profiled warp shape and
        # batch (scripts/profile_warp_r4.py); the pointwise-row forms hit a
        # pathological gather regime at B >= 8 fine scales (5 GB/s).
        return _grid_sample_patch(img, grid, align_corners)
    if impl == "packed" or (impl == "auto" and padding_mode == "zeros"):
        b, h, w, c = img.shape
        n = grid.size // (2 * b)
        # Packed wins when gather rows dominate the one-off packing cost
        # (fit on v5e measurements, scripts/profile_warp.py).
        if n * 384 >= h * w * c:
            return _grid_sample_packed(img, grid, align_corners)
    return _grid_sample_base(img, grid, align_corners, padding_mode)


def _grid_sample_base(
    img: Array, grid: Array, align_corners: bool, padding_mode: str
) -> Array:
    """Four-gather lowering; handles border padding and small point counts."""
    b, h, w, c = img.shape
    out_shape = grid.shape[:-1] + (c,)
    grid = grid.reshape(b, -1, 2)

    x, y = _unnormalize(grid, h, w, align_corners)
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
