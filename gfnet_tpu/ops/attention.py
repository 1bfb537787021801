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
