"""Global correlation volume + softmax position-expectation flow init.

Covers `GFNet.corr_volume` (ref `model/network.py:415-428`) and
`GFNet.pos_embed` (ref `model/network.py:430-440`) as one numerically-stable
fused computation: the (B, G^2, G^2) similarity matrix is a single MXU batched
matmul over the coarsest grid, and the flow initialization is the softmax
expectation of the normalized target-coordinate grid — a second tiny matmul —
so nothing but the flow ever needs to leave registers/VMEM after XLA fusion.

Layout: features NHWC (B, H, W, C).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gfnet_tpu.core.geometry import normalized_grid

Array = jax.Array


def global_correlation(feat0: Array, feat1: Array) -> Array:
    """corr[b, j, i] = <feat1[b, j], feat0[b, i]> / sqrt(C).

    feat0/feat1: (B, H, W, C). Returns (B, H1*W1, H0*W0), target-major like
    the reference's `einsum('bci,bcj->bji')` (ref `model/network.py:427`).
    """
    b, h0, w0, ch = feat0.shape
    _, h1, w1, _ = feat1.shape
    f0 = feat0.reshape(b, h0 * w0, ch)
    f1 = feat1.reshape(b, h1 * w1, ch)
    return jnp.einsum(
        "bjc,bic->bji", f1, f0, preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.asarray(ch, jnp.float32))


def softmax_pos_embed(corr: Array, h1: int, w1: int) -> Array:
    """Expected target coordinate under softmax over target cells.

    corr: (B, H1*W1, H0*W0). Returns flow (B, H0, W0, 2) of normalized xy —
    the matcher's flow-field initialization (ref `model/network.py:430-440`,
    softmax over dim=1 then expectation against the [-1+1/n, 1-1/n] grid).
    """
    b, n1, n0 = corr.shape
    assert n1 == h1 * w1
    p = jax.nn.softmax(corr, axis=1)  # over target cells
    grid = normalized_grid(h1, w1).reshape(n1, 2)  # (N1, 2)
    flow = jnp.einsum("bji,jd->bid", p, grid, preferred_element_type=jnp.float32)
    h0w0 = int(n0**0.5)
    return flow.reshape(b, h0w0, h0w0, 2)


def corr_volume_flow(feat0: Array, feat1: Array) -> Array:
    """Fused corr-volume + softmax expectation → initial flow (B, H0, W0, 2)."""
    _, h1, w1, _ = feat1.shape
    corr = global_correlation(feat0, feat1)
    return softmax_pos_embed(corr, h1, w1)
