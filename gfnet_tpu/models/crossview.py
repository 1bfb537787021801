"""Cross-view transformer decoder over ViT-grid tokens.

Re-design of `model/crossview_decoder_light.py:12-111` +
`model/transformer/layers/block.py:255-329` (CrossBlock) +
`model/transformer/layers/attention.py:173-258` (CrossAttention family).

Each of the `num_cross_attn` blocks is applied bidirectionally with shared
weights: x attends to y and y attends to x with the same block parameters
(ref `crossview_decoder_light.py:51-56`). Attention uses the
entropy-invariant softmax scale (`attention.py:249`); on TPU the flash-attn
dependency collapses into fused XLA SDPA (seq len = ViT grid, ~1k tokens).

Config semantics preserved: pre_norm_query=True means key/value enter
attention *un*-normalized (ref `block.py:323-327`); LayerScale init 1.0.
"""

from __future__ import annotations

import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from gfnet_tpu.config import DecoderConfig
from gfnet_tpu.models.common import LayerScale
from gfnet_tpu.ops.attention import (
    entropy_invariant_scale,
    fused_attention,
    linear_attention,
)

Array = jax.Array


@lru_cache(maxsize=32)
def sine_position_encoding(d_model: int, h: int, w: int, max_shape=(128, 128)) -> np.ndarray:
    """2D sinusoidal PE normalized to max_shape (ref
    `crossview_decoder_light.py:84-97`). Returns (h, w, d_model) float32."""
    pe = np.zeros((d_model, h, w), np.float32)
    y_pos = np.cumsum(np.ones((h, w), np.float32), axis=0) * max_shape[0] / h
    x_pos = np.cumsum(np.ones((h, w), np.float32), axis=1) * max_shape[1] / w
    div = np.exp(
        np.arange(0, d_model // 2, 2, dtype=np.float32) * (-np.log(10000.0) / (d_model // 2))
    )[:, None, None]
    pe[0::4] = np.sin(x_pos[None] * div)
    pe[1::4] = np.cos(x_pos[None] * div)
    pe[2::4] = np.sin(y_pos[None] * div)
    pe[3::4] = np.cos(y_pos[None] * div)
    return np.transpose(pe, (1, 2, 0))


class CrossAttention(nn.Module):
    """Separate q/k/v projections, entropy-invariant scale
    (ref `attention.py:173-224`; qkv_bias=False, proj_bias=True defaults)."""

    dim: int
    num_heads: int
    train_avg_length: int | None
    dtype: jnp.dtype = jnp.bfloat16
    # "FLASH2"/"XFormers" → fused XLA SDPA; "Linear" → elu+1 linear attention
    # (the reference's get_attention_type dispatch, `attention.py:39-48`)
    attention_type: str = "FLASH2"

    @nn.compact
    def __call__(self, x: Array, key: Array, value: Array) -> Array:
        b, n, c = x.shape
        hd = self.dim // self.num_heads
        q = nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="k_proj")(key)
        v = nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="v_proj")(value)
        q = q.reshape(b, n, self.num_heads, hd)
        k = k.reshape(b, -1, self.num_heads, hd)
        v = v.reshape(b, -1, self.num_heads, hd)
        if self.attention_type == "Linear":
            out = linear_attention(q, k, v).reshape(b, n, c)
        else:
            scale = entropy_invariant_scale(hd, n, self.train_avg_length)
            # fused_attention (one-shot Pallas kernel on TPU) keeps the
            # (B, H, N, N) logits in VMEM — the einsum SDPA's f32 logit
            # round-trip is ~330 MB of HBM traffic per 1600-token pass
            out = fused_attention(q, k, v, scale=scale).reshape(b, n, c)
        return nn.Dense(self.dim, use_bias=True, dtype=self.dtype, name="proj")(out)


class CrossBlock(nn.Module):
    """Cross block, pre-norm or post-norm (ref `block.py:255-329`).

    post_norm=True (ref `block.py:319-321`): attention consumes the raw
    residual stream and LayerNorm wraps each residual sum; pre-norm
    (`block.py:322-328`) normalizes the query (and key/value too when
    pre_norm_query=False).
    """

    dim: int
    num_heads: int
    cfg: DecoderConfig
    dtype: jnp.dtype = jnp.bfloat16

    def _mlp(self, h: Array) -> Array:
        cfg = self.cfg
        hidden = int(self.dim * cfg.mlp_ratio)
        if cfg.ffn_type == "glu":
            # SwiGLU FFN (ref `layers/swiglu_ffn.py:13-42`): fused w12 then
            # silu(x1) * x2 → w3
            h12 = nn.Dense(2 * hidden, dtype=self.dtype, name="mlp_w12")(h)
            x1, x2 = jnp.split(h12, 2, axis=-1)
            return nn.Dense(self.dim, dtype=self.dtype, name="mlp_w3")(
                jax.nn.silu(x1) * x2
            )
        from gfnet_tpu.models.vit import gelu

        h = nn.Dense(hidden, dtype=self.dtype, name="mlp_fc1")(h)
        h = gelu(h)
        return nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(h)

    @nn.compact
    def __call__(self, x: Array, key: Array, value: Array) -> Array:
        cfg = self.cfg
        train_len = cfg.train_avg_length if cfg.softmax_scale == "entropy_invariance" else None
        norm1 = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")
        norm2 = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")
        attn = CrossAttention(
            self.dim, self.num_heads, train_len, self.dtype,
            attention_type=cfg.attention_type, name="attn",
        )
        ls1 = LayerScale(self.dim, cfg.init_values, name="ls1")
        ls2 = LayerScale(self.dim, cfg.init_values, name="ls2")
        if cfg.post_norm:
            x = norm1(x + ls1(attn(x, key, value)))
            return norm2(x + ls2(self._mlp(x)))
        if not cfg.pre_norm_query:
            xq, key, value = norm1(x), norm1(key), norm1(value)
        else:
            xq = norm1(x)
            if os.environ.get("GFNET_KV_NORM") == "1":
                # PROXY-ONLY stabilization (off by default; no reference
                # counterpart): parameter-free standardization of the k/v
                # stream. With pre_norm_query the reference feeds k/v
                # UN-normalized (`block.py:322-328`) — benign from a
                # pretrained DINOv2, but under a RANDOM frozen backbone the
                # residual stream's scale grows through the shared blocks
                # (LayerScale init 1.0) and training explodes. Checkpoints
                # are unaffected (no params); a head trained with this flag
                # must be evaluated with it set.
                std_norm = lambda t: (
                    (t - jnp.mean(t, -1, keepdims=True))
                    * jax.lax.rsqrt(jnp.var(t, -1, keepdims=True) + 1e-6)
                ).astype(t.dtype)
                key, value = std_norm(key), std_norm(value)
        x = x + ls1(attn(xq, key, value))
        return x + ls2(self._mlp(norm2(x)))


class CrossViewDecoder(nn.Module):
    """Bidirectional cross-view decoder (ref `crossview_decoder_light.py:12-62`).

    Takes the two views' ViT patch tokens (B, H*W, d_vit) and the grid shape,
    returns per-view NHWC feature maps (B, H, W, out_dim).
    """

    d_vit: int
    out_dim: int
    cfg: DecoderConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, y: Array, grid_hw: tuple[int, int]) -> tuple[Array, Array]:
        h, w = grid_hw
        b = x.shape[0]
        proj = nn.Dense(self.out_dim, use_bias=False, dtype=self.dtype, name="proj")
        x = proj(x.astype(self.dtype))
        y = proj(y.astype(self.dtype))
        pe = jnp.asarray(sine_position_encoding(self.out_dim, h, w)).reshape(1, h * w, -1)
        x = x + pe.astype(self.dtype)
        y = y + pe.astype(self.dtype)
        for i in range(self.cfg.num_cross_attn):
            blk = CrossBlock(
                self.out_dim, self.cfg.nhead, self.cfg, self.dtype, name=f"cross{i}"
            )
            x_new = blk(x, key=y, value=y)
            y_new = blk(y, key=x, value=x)
            x, y = x_new, y_new
        return x.reshape(b, h, w, self.out_dim), y.reshape(b, h, w, self.out_dim)
