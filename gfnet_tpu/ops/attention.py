"""Attention primitives for the ViT backbone and cross-view decoder.

The reference dispatches between flash-attn / xformers / naive CUDA kernels
(`model/transformer/layers/attention.py:39-48`); on TPU every variant lowers
to the same fused XLA scaled-dot-product attention (seq len is only ~1k-1.6k
image tokens), so a single primitive covers the whole attention zoo.

The one semantic that must survive is the "entropy invariance" softmax scale:
scale = head_dim^-0.5 * log(N) / log(train_avg_length)
(ref `attention.py:84,213,249`), used by every cross-view decoder config.
"""

from __future__ import annotations

import math
import os
from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array

# Longest kv length routed to the one-shot kernel. The kernel defaults to
# whole-row q blocks (one program per batch*head) gated by a 24 MB f32 logits
# budget, falling back to 512-row q tiles past it (see
# ops/pallas/oneshot_attention.py); at kv 4096 even the tiled block is
# 512 * 4096 * 4 B = 8 MB of VMEM — beyond that, stream with flash instead.
_ONESHOT_MAX_KV = 4096


def entropy_invariant_scale(
    head_dim: int, seq_len: int, train_avg_length: int | None
) -> float:
    scale = head_dim**-0.5
    if train_avg_length is not None:
        scale *= math.log(seq_len) / math.log(train_avg_length)
    return scale


def scaled_dot_product_attention(
    q: Array, k: Array, v: Array, scale: float | None = None
) -> Array:
    """q, k, v: (B, N, H, D) → (B, N, H, D). Softmax in f32 for stability."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    logits = jnp.einsum(
        "bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32
    ) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", probs, v)


def fused_attention(
    q: Array, k: Array, v: Array, scale: float | None = None
) -> Array:
    """Fused attention on TPU (no N x N logit round-trip through HBM),
    einsum fallback elsewhere.

    q, k, v: (B, N, H, D). Two TPU kernels, picked by kv length
    (override with GFNET_ATTN_IMPL=oneshot|flash):

      - one-shot (ops/pallas/oneshot_attention.py) for the short image-token
        sequences this engine actually sees (~1k-1.6k): whole attention rows
        in VMEM, no streaming-softmax machinery — measured ~1.45x faster than
        the flash kernel at N=1025/1601 on v5e (scripts/profile_oneshot.py);
      - the jax flash kernel for anything longer: sequences are padded to a
        multiple of 512 with segment-id masking (padded keys are in a
        different segment than real queries).

    Numerically both are the same f32-accumulator softmax as the reference's
    flash-attn (`attention.py:141-170`), unlike a bf16-materialized-logits
    shortcut.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if jax.default_backend() not in ("tpu", "axon"):
        return scaled_dot_product_attention(q, k, v, scale)

    impl = os.environ.get("GFNET_ATTN_IMPL", "auto")
    if impl == "oneshot" or (impl == "auto" and k.shape[1] <= _ONESHOT_MAX_KV):
        return _oneshot_sdpa_grad(q, k, v, float(scale))

    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    b, n, h, d = q.shape
    nk = k.shape[1]
    # block 512 measured fastest end-to-end on v5e despite padding
    # 1025→1536 (block 256 halves the padding waste but loses more to
    # smaller per-step matmuls: 7.5 vs 8.2 pairs/s e2e)
    blk = 512
    np_ = -(-n // blk) * blk
    npk = -(-nk // blk) * blk

    def pad_seq(x, target):
        return jnp.pad(x, ((0, 0), (0, target - x.shape[1]), (0, 0), (0, 0)))

    qp = jnp.moveaxis(pad_seq(q, np_), 1, 2)  # (B, H, Np, D)
    kp = jnp.moveaxis(pad_seq(k, npk), 1, 2)
    vp = jnp.moveaxis(pad_seq(v, npk), 1, 2)
    seg_q = (jnp.arange(np_) < n).astype(jnp.int32)[None].repeat(b, 0)
    seg_kv = (jnp.arange(npk) < nk).astype(jnp.int32)[None].repeat(b, 0)
    bs = BlockSizes(
        block_q=min(blk, np_), block_k_major=min(blk, npk), block_k=min(blk, npk),
        block_b=1,
        block_q_major_dkv=min(blk, np_), block_k_major_dkv=min(blk, npk),
        block_k_dkv=min(blk, npk), block_q_dkv=min(blk, np_),
        block_k_major_dq=min(blk, npk), block_k_dq=min(blk, npk),
        block_q_dq=min(blk, np_),
    )
    out = flash_attention(
        qp, kp, vp, segment_ids=SegmentIds(q=seg_q, kv=seg_kv),
        sm_scale=float(scale), block_sizes=bs,
    )
    return jnp.moveaxis(out, 1, 2)[:, :n]


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _oneshot_sdpa_grad(q: Array, k: Array, v: Array, scale: float) -> Array:
    """One-shot Pallas forward with an XLA (einsum-SDPA) backward.

    The one-shot kernel has no Pallas VJP; the trained modules that call it
    (cross-view decoder) differentiate through the mathematically identical
    einsum formulation instead — recomputed in backward, so nothing extra is
    saved from the forward (same residuals as plain SDPA-with-remat)."""
    from gfnet_tpu.ops.pallas.oneshot_attention import oneshot_attention

    return oneshot_attention(q, k, v, scale=scale)


def _oneshot_fwd(q, k, v, scale):
    return _oneshot_sdpa_grad(q, k, v, scale), (q, k, v)


def _oneshot_bwd(scale, res, g):
    q, k, v = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: scaled_dot_product_attention(q_, k_, v_, scale), q, k, v
    )
    return vjp(g)


_oneshot_sdpa_grad.defvjp(_oneshot_fwd, _oneshot_bwd)


def linear_attention(q: Array, k: Array, v: Array, eps: float = 1e-6) -> Array:
    """elu(x)+1 linear attention (ref `attention.py:261-291`
    CrossLinearAttention, the config-selectable O(N) variant).

    q, k, v: (B, N, H, D) → (B, N, H, D), computed in f32 like the reference's
    autocast-disabled block (`attention.py:277`).
    """
    q = jax.nn.elu(q.astype(jnp.float32)) + 1
    k = jax.nn.elu(k.astype(jnp.float32)) + 1
    v32 = v.astype(jnp.float32)
    kv = jnp.einsum("bshd,bshm->bhmd", k, v32)  # (B, H, D_v, D_k)
    z = 1.0 / (jnp.einsum("blhd,bhd->blh", q, jnp.sum(k, axis=1)) + eps)
    out = jnp.einsum("blhd,bhmd,blh->blhm", q, kv, z)
    return out.astype(v.dtype)
