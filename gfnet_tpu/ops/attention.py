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

import jax
import jax.numpy as jnp

Array = jax.Array


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
