"""Generalized space-to-depth execution for small-channel dense convolutions.

The FPN front-end (ref `model/FPN.py:5-36`) runs 7x7/5x5/3x3 convs at full
resolution with 3-16 channels. On TPU the channel dim maps to the 128-wide
lane axis, so these tensors waste up to 16x of every vector register and HBM
round-trip, and the convs' tiny contractions underfeed the MXU. Packing PxP
spatial phases into channels runs the same math as a dense 3x3 convolution on
a P-times-smaller grid with lane-filling channel counts.

Exactness: with stride S, input packing P_in, output packing P_out = P_in/S,
output original position Y = S*(P_out*y + q) reads input S*Y + u - r =
P_in*y + e with e = S*q + u - r; so tap u of output phase q maps to packed
cell offset floor(e/P_in) in {-1,0,1} (for all kernels used here: K<=7 at
P_in=4, K<=5 at P_in=2) and input phase e mod P_in. The expanded kernel
scatters the original weights into a zero-structured
(3, 3, P_in^2*I, P_out^2*O) kernel; SAME padding of one packed cell supplies
>= r original zero rows, matching the original SAME padding. Same taps, same
accumulation dtype — only the summation layout changes (golden-tested in
tests/test_fpn_s2d.py).

Channel layout is phase-major: packed channel = phase * C + c, with
phase = py * P + px (matches models/refiner.py's 2x2 machinery).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def space_to_depth_n(x: Array, p: int) -> Array:
    """(B, H, W, C) -> (B, H/p, W/p, p*p*C), phase-major channels."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // p, p, w // p, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // p, w // p, p * p * c)


def depth_to_space_n(x: Array, p: int) -> Array:
    """Inverse of :func:`space_to_depth_n`."""
    b, h, w, cp = x.shape
    c = cp // (p * p)
    x = x.reshape(b, h, w, p, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h * p, w * p, c)


@functools.lru_cache(maxsize=32)
def _dense_tap_map(k: int, p_in: int, p_out: int, stride: int) -> np.ndarray:
    """(3, 3, P_in^2, P_out^2, K*K) 0/1 scatter map (see module docstring)."""
    t = np.zeros((3, 3, p_in * p_in, p_out * p_out, k * k), np.float32)
    r = k // 2
    for qy in range(p_out):
        for qx in range(p_out):
            for uy in range(k):
                for ux in range(k):
                    ey, ex = stride * qy + uy - r, stride * qx + ux - r
                    dy, py = ey // p_in, ey % p_in
                    dx, px = ex // p_in, ex % p_in
                    assert -1 <= dy <= 1 and -1 <= dx <= 1, (k, p_in, stride)
                    t[dy + 1, dx + 1, py * p_in + px, qy * p_out + qx,
                      uy * k + ux] = 1.0
    return t


def expand_dense_kernel(w: Array, p_in: int, p_out: int, stride: int) -> Array:
    """(K, K, I, O) HWIO kernel -> (3, 3, P_in^2*I, P_out^2*O) packed kernel.

    Requires p_out * stride == p_in (output packed grid keeps the input
    packed grid's spatial dims, so the packed conv is always stride 1)."""
    assert p_out * stride == p_in, (p_in, p_out, stride)
    k, _, i, o = w.shape
    if k == 1 and stride == 1:
        # 1x1 conv: pure phase-block-diagonal — no neighbor cells involved
        eye = jnp.eye(p_in * p_in, dtype=w.dtype)
        full = eye[:, None, :, None] * w[0, 0][None, :, None, :]
        return full.reshape(1, 1, p_in * p_in * i, p_out * p_out * o)
    tap = jnp.asarray(_dense_tap_map(k, p_in, p_out, stride))
    out = jnp.einsum("abfqt,tio->abfiqo", tap, w.reshape(k * k, i, o))
    return out.reshape(3, 3, p_in * p_in * i, p_out * p_out * o)
