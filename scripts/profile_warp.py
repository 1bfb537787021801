"""grid_sample (bilinear, zeros, align_corners=False) lowering variants.

The fine-refiner warps gather 320^2 points x 8 channels from a 560^2 map;
XLA's row-gather cost scales with index count, so packing the 2x2 corner
neighborhood into channels (one gather, 4x fewer indices) should win.

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_warp.py
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from gfnet_tpu.ops.sampler import grid_sample


def fetch(out):
    return np.asarray(jnp.sum(jax.tree_util.tree_leaves(out)[0]))


def timed(fn, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn()
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    fetch(out)
    return (time.perf_counter() - t0) / iters


def grid_sample_packed(img, grid):
    """Zero-pad by 2, pack the 2x2 neighborhood into channels, single gather."""
    b, h, w, c = img.shape
    out_shape = grid.shape[:-1] + (c,)
    grid = grid.reshape(b, -1, 2)

    gx, gy = grid[..., 0], grid[..., 1]
    x = ((gx + 1) * w - 1) * 0.5
    y = ((gy + 1) * h - 1) * 0.5
    x = jnp.where(jnp.isfinite(x), x, -1e9)
    y = jnp.where(jnp.isfinite(y), y, -1e9)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0).astype(img.dtype)
    wy = (y - y0).astype(img.dtype)

    pad = 2
    imgp = jnp.pad(img, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    hp, wp = h + 2 * pad, w + 2 * pad
    # pack corners: packed[y, x] = [img[y,x], img[y,x+1], img[y+1,x], img[y+1,x+1]]
    packed = jnp.concatenate(
        [
            imgp[:, :-1, :-1],
            imgp[:, :-1, 1:],
            imgp[:, 1:, :-1],
            imgp[:, 1:, 1:],
        ],
        axis=-1,
    )  # (B, hp-1, wp-1, 4C)

    yb = jnp.clip(y0.astype(jnp.int32) + pad, 0, hp - 2)
    xb = jnp.clip(x0.astype(jnp.int32) + pad, 0, wp - 2)
    flat = packed.reshape(b, (hp - 1) * (wp - 1), 4 * c)
    vals = jnp.take_along_axis(flat, (yb * (wp - 1) + xb)[..., None], axis=1)
    v00, v01, v10, v11 = jnp.split(vals, 4, axis=-1)
    w00 = ((1 - wy) * (1 - wx))[..., None]
    w01 = ((1 - wy) * wx)[..., None]
    w10 = (wy * (1 - wx))[..., None]
    w11 = (wy * wx)[..., None]
    out = v00 * w00 + v01 * w01 + v10 * w10 + v11 * w11
    return out.reshape(out_shape)


def grid_sample_slice(img, grid):
    """lax.gather with slice_sizes (1,2,2,C) from a zero-padded map."""
    b, h, w, c = img.shape
    out_shape = grid.shape[:-1] + (c,)
    grid = grid.reshape(b, -1, 2)
    n = grid.shape[1]

    gx, gy = grid[..., 0], grid[..., 1]
    x = ((gx + 1) * w - 1) * 0.5
    y = ((gy + 1) * h - 1) * 0.5
    x = jnp.where(jnp.isfinite(x), x, -1e9)
    y = jnp.where(jnp.isfinite(y), y, -1e9)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0).astype(img.dtype)
    wy = (y - y0).astype(img.dtype)

    pad = 2
    imgp = jnp.pad(img, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    hp, wp = h + 2 * pad, w + 2 * pad
    yb = jnp.clip(y0.astype(jnp.int32) + pad, 0, hp - 2)
    xb = jnp.clip(x0.astype(jnp.int32) + pad, 0, wp - 2)

    def per_image(im, yb1, xb1):
        idx = jnp.stack([yb1, xb1], axis=-1)  # (N, 2)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3),
            collapsed_slice_dims=(),
            start_index_map=(0, 1),
        )
        return jax.lax.gather(
            im, idx, dn, slice_sizes=(2, 2, c), mode=jax.lax.GatherScatterMode.CLIP
        )  # (N, 2, 2, C)

    vals = jax.vmap(per_image)(imgp, yb, xb)
    w00 = ((1 - wy) * (1 - wx))[..., None]
    w01 = ((1 - wy) * wx)[..., None]
    w10 = (wy * (1 - wx))[..., None]
    w11 = (wy * wx)[..., None]
    out = (
        vals[:, :, 0, 0] * w00 + vals[:, :, 0, 1] * w01
        + vals[:, :, 1, 0] * w10 + vals[:, :, 1, 1] * w11
    )
    return out.reshape(out_shape)


def main():
    rng = np.random.default_rng(0)
    for tag, hw, g, c in (
        ("ref1@320<-560", 560, 320, 8),
        ("ref2@160<-560", 560, 160, 16),
        ("ref1@256<-448", 448, 256, 8),
        ("ref2@128<-448", 448, 128, 16),
        ("ref4@80<-560", 560, 80, 32),
    ):
        img = jnp.asarray(rng.normal(0, 1, (2, hw, hw, c)).astype(np.float32)).astype(jnp.bfloat16)
        grid = jnp.asarray(rng.uniform(-1.1, 1.1, (2, g, g, 2)).astype(np.float32))
        fns = {
            "base": jax.jit(grid_sample),
            "packed": jax.jit(grid_sample_packed),
            "slice": jax.jit(grid_sample_slice),
        }
        outs = {}
        rows = []
        for k, f in fns.items():
            try:
                outs[k] = f(img, grid)
                rows.append(f"{k} {timed(partial(f, img, grid)) * 1e3:7.2f}ms")
            except Exception as e:  # noqa: BLE001
                rows.append(f"{k} FAIL({type(e).__name__})")
        base = outs["base"].astype(jnp.float32)
        diffs = {
            k: float(jnp.max(jnp.abs(v.astype(jnp.float32) - base)))
            for k, v in outs.items() if k != "base"
        }
        print(f"{tag:<16} " + "  ".join(rows) + f"   maxdiff {diffs}", flush=True)


if __name__ == "__main__":
    main()
