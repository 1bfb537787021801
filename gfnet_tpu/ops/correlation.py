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


def corr_volume_flow_sharded(feat0: Array, feat1: Array, mesh, axis: str = "data") -> Array:
    """Grid-block-sharded corr-volume + softmax expectation.

    The G^2 x G^2 correlation volume is this workload's long-sequence
    analogue (SURVEY.md §5): at large grids the (B, N1, N0) score matrix
    dominates memory. This variant blocks the TARGET grid cells across the
    mesh axis — each device holds only its N1/d slice of target features and
    scores — and combines via a flash-attention-style numerically-stable
    distributed softmax expectation:

        M      = pmax_j' ( max_local corr )                 (lax.pmax)
        s, e   = Σ_local exp(corr - M) · {1, grid_j}
        flow   = psum(e) / psum(s)                          (lax.psum over ICI)

    Scope of the memory win (measured, workspace/sharded_corr_scope.json):
    the corr-init PROGRAM's per-device temp drops exactly d-fold at every
    grid size (8x on an 8-mesh at G=32..128). Inside the flagship two-pass
    pipeline, though, the G=32 score matrix (4 MB) is nowhere near the
    dominant temp, so the whole-program per-device drop is ~17% (1.30 vs
    1.56 GB, MULTICHIP_r04.json) — the d-fold headline applies to
    large-grid/single-pass configs where the quartic score term dominates.
    Results match the dense `corr_volume_flow` elementwise (tested on the
    8-device CPU mesh). Query features are replicated (small: N0 x C).

    jit-friendly: sharding is expressed with with_sharding_constraint +
    shard_map, so the whole thing can live inside the matcher's pass1
    executable (reached via `GFNetMatcher.shard_for_mesh` when a request's
    batch leaves the mesh idle — the latency-scaling serving mode).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    b, h0, w0, ch = feat0.shape
    _, h1, w1, _ = feat1.shape
    n1 = h1 * w1
    d = mesh.shape[axis]
    assert n1 % d == 0, (n1, d)
    f0 = feat0.reshape(b, h0 * w0, ch)
    f1 = feat1.reshape(b, n1, ch)
    grid = jnp.broadcast_to(normalized_grid(h1, w1).reshape(n1, 2), (b, n1, 2))
    inv_sqrt_c = 1.0 / jnp.sqrt(jnp.asarray(ch, jnp.float32))
    wsc = jax.lax.with_sharding_constraint

    def block(f0_rep, f1_blk, grid_blk):
        # f1_blk/grid_blk: this device's target-cell slice (B, N1/d, ·)
        corr = (
            jnp.einsum("bjc,bic->bji", f1_blk, f0_rep,
                       preferred_element_type=jnp.float32) * inv_sqrt_c
        )
        m = jax.lax.pmax(jnp.max(corr, axis=1), axis)  # (B, N0) global max
        e = jnp.exp(corr - m[:, None, :])
        s = jax.lax.psum(jnp.sum(e, axis=1), axis)  # (B, N0)
        num = jax.lax.psum(
            jnp.einsum("bji,bjd->bid", e, grid_blk,
                       preferred_element_type=jnp.float32),
            axis,
        )  # (B, N0, 2)
        return num / s[..., None]

    from jax.experimental.shard_map import shard_map

    flow = shard_map(
        block,
        mesh=mesh,
        in_specs=(P(), P(None, axis, None), P(None, axis, None)),
        out_specs=P(),
    )(
        wsc(f0, NamedSharding(mesh, P())),
        wsc(f1, NamedSharding(mesh, P(None, axis, None))),
        wsc(grid, NamedSharding(mesh, P(None, axis, None))),
    )
    return flow.reshape(b, h0, w0, 2)
