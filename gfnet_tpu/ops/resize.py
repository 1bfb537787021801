"""Matmul-based image resizing — the TPU-native replacement for
`F.interpolate` / grid-aligned `grid_sample` calls in the reference.

Instead of gather-based sampling, each separable resize is expressed as two
dense matrix products `W_h @ x @ W_w^T` whose (out, in) weight matrices are
built once at trace time (static shapes) — this runs on the MXU and fuses
with neighboring element-wise ops under XLA.

Semantics match torch exactly (golden-tested in tests/test_resize.py):
  - bilinear, align_corners False/True   (flow/certainty upsampling,
    ref `model/network.py:238-249,271-281`; ViT-size image resize
    `model/network.py:161`; FPN top-down upsample `model/FPN.py:59-66`)
  - bicubic (a=-0.75), align_corners=False, optional explicit scale factor
    (DINOv2 pos-embed interpolation, ref `model/transformer/dinov2.py:182-186`)
  - nearest-exact (loss EPE gating, ref `losses/robust_loss.py:119`)
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _cubic_kernel(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Keys cubic convolution kernel with torch's a=-0.75."""
    at = np.abs(t)
    return np.where(
        at <= 1,
        (a + 2) * at**3 - (a + 3) * at**2 + 1,
        np.where(at < 2, a * at**3 - 5 * a * at**2 + 8 * a * at - 4 * a, 0.0),
    )


def _antialias_weight_matrix(in_size: int, out_size: int, mode: str) -> np.ndarray:
    """PIL-style antialiased resize weights (torch `F.interpolate(antialias=True)`,
    which torchvision's `transforms.Resize` uses on tensors — the reference's
    eval preprocessing, `utils/utils.py:90`).

    Per output pixel: taps within `radius * scale` of the source center,
    kernel stretched by the scale factor, weights normalized to sum 1.
    Antialiasing only matters when downscaling; callers use the standard
    path otherwise. Note torch's aa-bicubic uses a = -0.5 (PIL), not -0.75.
    """
    radius = {"bilinear": 1.0, "bicubic": 2.0}[mode]
    scale = in_size / out_size
    support = radius * scale if scale > 1.0 else radius
    kscale = max(scale, 1.0)
    W = np.zeros((out_size, in_size))
    for i in range(out_size):
        center = (i + 0.5) * scale
        xmin = max(int(center - support + 0.5), 0)
        xmax = min(int(center + support + 0.5), in_size)
        t = (np.arange(xmin, xmax) - center + 0.5) / kscale
        w = np.maximum(0.0, 1.0 - np.abs(t)) if mode == "bilinear" else _cubic_kernel(t, a=-0.5)
        s = w.sum()
        if s != 0:
            W[i, xmin:xmax] = w / s
    return W


@lru_cache(maxsize=256)
def resize_weight_matrix(
    in_size: int,
    out_size: int,
    mode: str = "bilinear",
    align_corners: bool = False,
    scale: float | None = None,
    antialias: bool = False,
) -> np.ndarray:
    """Build the (out_size, in_size) resize weight matrix.

    `scale` (out/in ratio) overrides the implied ratio for coordinate mapping,
    matching torch's behavior when `scale_factor` is passed explicitly with
    `recompute_scale_factor=None` (used by DINOv2 pos-embed interpolation).
    """
    if antialias and mode in ("bilinear", "bicubic"):
        # torch routes antialias=True through the PIL-style kernel for both
        # down- and up-scale (upscale degenerates to kscale=1: identical to
        # standard bilinear, but bicubic switches to a=-0.5).
        assert not align_corners and scale is None
        return _antialias_weight_matrix(in_size, out_size, mode)
    out_idx = np.arange(out_size, dtype=np.float64)
    if mode == "nearest-exact":
        ratio = in_size / out_size if scale is None else 1.0 / scale
        src = np.minimum(np.floor((out_idx + 0.5) * ratio), in_size - 1).astype(np.int64)
        W = np.zeros((out_size, in_size))
        W[np.arange(out_size), src] = 1.0
        return W
    if mode == "nearest":
        ratio = in_size / out_size if scale is None else 1.0 / scale
        src = np.minimum(np.floor(out_idx * ratio), in_size - 1).astype(np.int64)
        W = np.zeros((out_size, in_size))
        W[np.arange(out_size), src] = 1.0
        return W

    if align_corners:
        ratio = (in_size - 1) / max(out_size - 1, 1)
        src = out_idx * ratio
    else:
        ratio = in_size / out_size if scale is None else 1.0 / scale
        src = (out_idx + 0.5) * ratio - 0.5

    W = np.zeros((out_size, in_size))
    if mode == "bilinear":
        # torch clamps source coords to >= 0 when not align_corners
        src_c = np.clip(src, 0, in_size - 1)
        lo = np.floor(src_c).astype(np.int64)
        hi = np.minimum(lo + 1, in_size - 1)
        frac = src_c - lo
        W[np.arange(out_size), lo] += 1 - frac
        W[np.arange(out_size), hi] += frac
    elif mode == "bicubic":
        lo = np.floor(src).astype(np.int64)
        frac = src - lo
        for tap in range(-1, 3):
            w = _cubic_kernel(tap - frac)
            idx = np.clip(lo + tap, 0, in_size - 1)
            np.add.at(W, (np.arange(out_size), idx), w)
    else:
        raise ValueError(f"unknown resize mode {mode}")
    return W


def interpolate(
    x: Array,
    size: tuple[int, int] | int,
    mode: str = "bilinear",
    align_corners: bool = False,
    scale: tuple[float, float] | None = None,
    antialias: bool = False,
) -> Array:
    """Resize NHWC tensor `x` (B, H, W, C) to `size` (h, w).

    Implemented as two MXU matmuls along H and W. Mode/corner semantics match
    `torch.nn.functional.interpolate` (see module docstring), including
    `antialias=True` on downscale (torchvision Resize tensor semantics).
    """
    if isinstance(size, int):
        size = (size, size)
    b, h, w, c = x.shape
    oh, ow = size
    if (oh, ow) == (h, w) and scale is None:
        return x
    sh = None if scale is None else scale[0]
    sw = None if scale is None else scale[1]
    Wh = jnp.asarray(resize_weight_matrix(h, oh, mode, align_corners, sh, antialias), x.dtype)
    Ww = jnp.asarray(resize_weight_matrix(w, ow, mode, align_corners, sw, antialias), x.dtype)
    # (oh,h) @ (b,h,w*c) over H, then (ow,w) over W.
    y = jnp.einsum("oh,bhwc->bowc", Wh, x)
    y = jnp.einsum("pw,bowc->bopc", Ww, y)
    return y


def interpolate_s2d(
    x: Array, size: tuple[int, int], mode: str = "bilinear",
    align_corners: bool = False, p: int = 2,
) -> Array:
    """Resize directly into space-to-depth layout: (B, H, W, C) →
    (B, oh/p, ow/p, p²C), channels ordered phase-major (ph*C + c,
    ph = p*py + px) — bit-identical to
    `space_to_depth_n(interpolate(x, size), p)`.

    Each output phase is the resize through the phase's row/col slice of the
    separable weight matrices, so the full-resolution (oh, ow, C) tensor —
    lane-padded up to 16x at the fine FPN/refiner channel counts — is never
    materialized. Used by the s2d refiner front-end (models/refiner.py) and
    the packed FPN decoder stage (models/fpn.py)."""
    oh, ow = size
    assert oh % p == 0 and ow % p == 0, (size, p)
    b, h, w, c = x.shape
    Wh = resize_weight_matrix(h, oh, mode, align_corners)
    Ww = resize_weight_matrix(w, ow, mode, align_corners)
    phases = []
    for py in range(p):
        zh = jnp.einsum("oh,bhwc->bowc", jnp.asarray(Wh[py::p], x.dtype), x)
        for px in range(p):
            phases.append(
                jnp.einsum("pw,bowc->bopc", jnp.asarray(Ww[px::p], x.dtype), zh)
            )
    return jnp.concatenate(phases, axis=-1)
