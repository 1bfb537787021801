"""Pallas TPU kernel for local correlation windows.

The reference's hottest op (`utils/local_correlation.py:4-72`) is a per-cell
(2r+1)^2-tap bilinear window gather against the target feature map followed by
a dot with the query feature. A naive gather formulation re-reads
B*G*G*K*C*4corners values from HBM; this kernel instead:

  1. exploits that all K taps of one cell sit on an integer-pixel lattice
     sharing ONE fractional offset, so a cell needs only a contiguous
     (2r+2)^2 patch and a 4-term shifted combine;
  2. keeps the (padded) target feature map resident in VMEM per (batch, row)
     program, so each patch read is a VMEM dynamic slice, not an HBM gather;
  3. reorders dot-then-combine (both linear): per cell one
     ((2r+2)^2, C) x (C,) matvec on the MXU, then a 4-term VPU combine.

Zero-padding semantics of `grid_sample(padding_mode="zeros",
align_corners=False)` are reproduced exactly by zero-padding the target with
margin P >= 2r+2 and clamping base indices — fully-out-of-range windows land
entirely in the zero margin (golden-tested against the gather reference).

A custom VJP propagates gradients to the query features only, matching the
reference's `disable_local_corr_grad=True` (`model/network.py:76`,
`local_correlation.py:54`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _precompute(flow: Array, h: int, w: int, radius: int, pad: int):
    """Integer window bases (into the padded map) + shared fractional weights."""
    px = ((flow[..., 0] + 1) * w - 1) * 0.5
    py = ((flow[..., 1] + 1) * h - 1) * 0.5
    # guard non-finite flow: send the window fully into the zero margin
    px = jnp.where(jnp.isfinite(px), px, -1e9)
    py = jnp.where(jnp.isfinite(py), py, -1e9)
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    fx = (px - x0).astype(jnp.float32)
    fy = (py - y0).astype(jnp.float32)
    win = 2 * radius + 2
    bx = jnp.clip(x0.astype(jnp.int32) - radius + pad, 0, w + 2 * pad - win)
    by = jnp.clip(y0.astype(jnp.int32) - radius + pad, 0, h + 2 * pad - win)
    return by, bx, fy, fx


def _fwd_kernel(query_ref, by_ref, bx_ref, fy_ref, fx_ref, target_ref, out_ref, *, radius, g, c):
    win = 2 * radius + 2
    inv_sqrt_c = 1.0 / float(np.sqrt(c))

    def body(j, _):
        y = by_ref[0, j]
        x = bx_ref[0, j]
        patch = target_ref[0, pl.ds(y, win), pl.ds(x, win), :]  # (win, win, C)
        q = query_ref[0, 0, j, :]  # (C,)
        s = jnp.dot(
            patch.reshape(win * win, c), q, preferred_element_type=jnp.float32
        ).reshape(win, win)
        wy = fy_ref[0, j]
        wx = fx_ref[0, j]
        comb = (
            (1 - wy) * (1 - wx) * s[: win - 1, : win - 1]
            + (1 - wy) * wx * s[: win - 1, 1:]
            + wy * (1 - wx) * s[1:, : win - 1]
            + wy * wx * s[1:, 1:]
        )
        out_ref[0, 0, j, :] = comb.reshape((win - 1) * (win - 1)) * inv_sqrt_c
        return 0

    jax.lax.fori_loop(0, g, body, 0)


def _bwd_kernel(g_ref, by_ref, bx_ref, fy_ref, fx_ref, target_ref, dq_ref, *, radius, g, c):
    """dq[j] = patch^T @ spread(g_j): adjoint of dot-then-combine."""
    win = 2 * radius + 2
    inv_sqrt_c = 1.0 / float(np.sqrt(c))

    def body(j, _):
        y = by_ref[0, j]
        x = bx_ref[0, j]
        patch = target_ref[0, pl.ds(y, win), pl.ds(x, win), :]  # (win, win, C)
        gj = g_ref[0, 0, j, :].reshape(win - 1, win - 1) * inv_sqrt_c
        wy = fy_ref[0, j]
        wx = fx_ref[0, j]
        sw = jnp.zeros((win, win), jnp.float32)
        sw = sw.at[: win - 1, : win - 1].add((1 - wy) * (1 - wx) * gj)
        sw = sw.at[: win - 1, 1:].add((1 - wy) * wx * gj)
        sw = sw.at[1:, : win - 1].add(wy * (1 - wx) * gj)
        sw = sw.at[1:, 1:].add(wy * wx * gj)
        dq_ref[0, 0, j, :] = jnp.dot(
            sw.reshape(1, win * win),
            patch.reshape(win * win, c),
            preferred_element_type=jnp.float32,
        ).reshape(c)
        return 0

    jax.lax.fori_loop(0, g, body, 0)


def _run(kernel, main_in, by, bx, fy, fx, target_pad, out_channels, *, radius, interpret):
    b, _, g, _ = main_in.shape[0], None, main_in.shape[2], None
    g1 = main_in.shape[1]
    g2 = main_in.shape[2]
    hp, wp, c = target_pad.shape[1], target_pad.shape[2], target_pad.shape[3]

    grid = (b, g1)
    kern = functools.partial(kernel, radius=radius, g=g2, c=c)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, g2, main_in.shape[3]), lambda bb, i: (bb, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g2), lambda bb, i: (bb * g1 + i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, g2), lambda bb, i: (bb * g1 + i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, g2), lambda bb, i: (bb * g1 + i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, g2), lambda bb, i: (bb * g1 + i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, hp, wp, c), lambda bb, i: (bb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, g2, out_channels), lambda bb, i: (bb, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, g1, g2, out_channels), jnp.float32),
        interpret=interpret,
    )(main_in, by, bx, fy, fx, target_pad)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def local_correlation_pallas(
    query: Array, target: Array, flow: Array, radius: int, interpret: bool = False
) -> Array:
    """(B, G, G, C), (B, H, W, C), (B, G, G, 2) → (B, G, G, (2r+1)^2)."""
    out, _ = _fwd(query, target, flow, radius, interpret)
    return out


def _prep(query, target, flow, radius):
    b, g1, g2, c = query.shape
    _, h, w, _ = target.shape
    pad = 2 * radius + 4
    by, bx, fy, fx = _precompute(flow.astype(jnp.float32), h, w, radius, pad)
    target_pad = jnp.pad(
        target.astype(jnp.float32), ((0, 0), (pad, pad), (pad, pad), (0, 0))
    )
    flat = lambda t: t.reshape(b * g1, g2)
    return flat(by), flat(bx), flat(fy), flat(fx), target_pad


def _fwd(query, target, flow, radius, interpret):
    k = (2 * radius + 1) ** 2
    by, bx, fy, fx, target_pad = _prep(query, target, flow, radius)
    out = _run(
        _fwd_kernel, query.astype(jnp.float32), by, bx, fy, fx, target_pad, k,
        radius=radius, interpret=interpret,
    )
    return out, (target, flow)


def _bwd(radius, interpret, res, g):
    target, flow = res
    by, bx, fy, fx, target_pad = _prep(g, target, flow, radius)  # g has query's grid shape
    dq = _run(
        _bwd_kernel, g.astype(jnp.float32), by, bx, fy, fx, target_pad,
        target.shape[3], radius=radius, interpret=interpret,
    )
    # no grads into target/flow (reference: window sampling under no_grad)
    return dq, None, None


local_correlation_pallas.defvjp(_fwd, _bwd)
