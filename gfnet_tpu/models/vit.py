"""DINOv2 Vision Transformer backbone, flax/NHWC, frozen feature extractor.

From-scratch re-implementation of the behavior of the reference's vendored
DINOv2 (`model/transformer/dinov2.py`, `model/transformer/layers/*`) restricted
to what GFNet actually uses: `forward_features(...)['x_norm_patchtokens']` of a
ViT-L/14 with LayerScale(1.0), MLP FFN, no stochastic depth, eval-only
(`model/network.py:46-58,165-170`).

TPU mapping notes:
  - attention/MLP are plain MXU matmuls in bf16 (fp16-autocast in the ref);
    seq len is ~1k-1.6k tokens so fused XLA SDPA is already near roofline;
  - the bicubic pos-embed interpolation (`dinov2.py:166-190`, including the
    +0.1 scale-factor quirk) is an MXU matmul pair via ops.resize;
  - weights live in a separate "frozen" param tree; callers wrap the apply in
    `jax.lax.stop_gradient` — mirroring the reference's list-hiding trick
    (`model/network.py:58`) that keeps DINOv2 out of checkpoints/DDP.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from gfnet_tpu.config import DinoConfig
from gfnet_tpu.models.common import LayerScale
from gfnet_tpu.ops.attention import fused_attention
from gfnet_tpu.ops.resize import interpolate

Array = jax.Array


class Attention(nn.Module):
    """Fused-QKV self attention (ref `layers/attention.py:51-101`)."""

    dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, n, c = x.shape
        hd = self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, use_bias=True, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.num_heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        # flash attention on TPU: the ViT's (B, H, 1025, 1025) logits would
        # otherwise be materialized in f32 every block (profiled as the
        # backbone's dominant HBM traffic)
        out = fused_attention(q, k, v)
        out = out.reshape(b, n, c)
        return nn.Dense(self.dim, use_bias=True, dtype=self.dtype, name="proj")(out)


def gelu(x: Array) -> Array:
    """GELU matching torch's default exact (erf) form (ref `layers/mlp.py:30`).

    bf16 uses the tanh approximation: its error vs erf (max |err| ~3e-4 near
    |x|~2) is below bf16 resolution at the activation scales observed in the
    network, and it measures ~0.14ms/ViT-L-block faster on v5e
    (scripts/profile_vit.py). All other dtypes (f32/f64) keep exact erf for
    torch parity.
    """
    approx = x.dtype == jnp.bfloat16
    return jax.nn.gelu(x, approximate=approx)


class Mlp(nn.Module):
    """GELU MLP (ref `layers/mlp.py:17-42`)."""

    dim: int
    hidden: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = gelu(x)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x)


class SwiGLUFFNFused(nn.Module):
    """SwiGLU FFN with the DINOv2 fused-width rule (ref `layers/swiglu_ffn.py:13-62`):
    hidden = (int(dim * mlp_ratio * 2/3) + 7) // 8 * 8, packed w12 projection.
    Used by real DINOv2-g checkpoints (`dinov2.py:109-110`)."""

    dim: int
    hidden: int  # pre-2/3 width, i.e. int(dim * mlp_ratio)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        hf = (int(self.hidden * 2 / 3) + 7) // 8 * 8
        x12 = nn.Dense(2 * hf, dtype=self.dtype, name="w12")(x)
        x1, x2 = x12[..., :hf], x12[..., hf:]
        return nn.Dense(self.dim, dtype=self.dtype, name="w3")(jax.nn.silu(x1) * x2)


class Block(nn.Module):
    """Pre-norm residual block with LayerScale (ref `layers/block.py:36-107`)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    init_values: float = 1.0
    dtype: jnp.dtype = jnp.bfloat16
    ffn_layer: str = "mlp"  # "mlp" | "swiglufused" (ref `dinov2.py:107-116`)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        h = Attention(self.dim, self.num_heads, self.dtype, name="attn")(h)
        x = x + LayerScale(self.dim, self.init_values, name="ls1")(h)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        hidden = int(self.dim * self.mlp_ratio)
        if self.ffn_layer == "mlp":
            h = Mlp(self.dim, hidden, self.dtype, name="mlp")(h)
        elif self.ffn_layer in ("swiglu", "swiglufused"):
            h = SwiGLUFFNFused(self.dim, hidden, self.dtype, name="mlp")(h)
        else:
            raise ValueError(f"unknown ffn_layer {self.ffn_layer!r}")
        return x + LayerScale(self.dim, self.init_values, name="ls2")(h)


class _BlockScanBody(nn.Module):
    """(carry, _) → (carry, None) adapter so Block scans under nn.scan."""

    dim: int
    num_heads: int
    mlp_ratio: float
    init_values: float
    dtype: jnp.dtype
    ffn_layer: str = "mlp"

    @nn.compact
    def __call__(self, x: Array, _):
        y = Block(
            self.dim, self.num_heads, self.mlp_ratio, self.init_values,
            self.dtype, self.ffn_layer, name="block",
        )(x)
        return y, None


class VisionTransformer(nn.Module):
    """DINOv2-style ViT (ref `model/transformer/dinov2.py:43-297`).

    __call__ takes NHWC images (B, H, W, 3) with H, W multiples of patch_size
    and returns final-LN patch tokens (B, H/p * W/p, D)
    ('x_norm_patchtokens', ref `dinov2.py:222-237`).
    """

    cfg: DinoConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cfg = self.cfg
        b, h, w, _ = x.shape
        p = cfg.patch_size
        assert h % p == 0 and w % p == 0
        gh, gw = h // p, w // p

        # PatchEmbed: 14x14 stride-14 conv (ref `layers/patch_embed.py:26-96`)
        tok = nn.Conv(
            cfg.d_model, (p, p), strides=(p, p), padding="VALID",
            dtype=self.dtype, name="patch_embed",
        )(x.astype(self.dtype))
        tok = tok.reshape(b, gh * gw, cfg.d_model)

        cls = self.param(
            "cls_token", nn.initializers.normal(1e-6), (1, 1, cfg.d_model), jnp.float32
        )
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, cfg.pos_embed_size * cfg.pos_embed_size + 1, cfg.d_model),
            jnp.float32,
        )
        tok = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (b, 1, cfg.d_model)), tok], axis=1
        )
        tok = tok + interpolate_pos_encoding(pos, gh, gw, cfg.pos_embed_size).astype(
            self.dtype
        )

        # The 24 identical blocks run as ONE nn.scan over stacked params:
        # a single traced/compiled block body instead of `depth` inlined
        # copies — cuts XLA trace+compile time ~depth-fold for ViT-L while
        # the steady-state schedule is unchanged.
        ScannedBlock = nn.scan(
            _BlockScanBody,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=cfg.depth,
            metadata_params={nn.meta.PARTITION_NAME: None},
        )
        tok, _ = ScannedBlock(
            cfg.d_model,
            cfg.num_heads,
            cfg.mlp_ratio,
            cfg.init_values,
            self.dtype,
            cfg.ffn_layer,
            name="blocks",
        )(tok, None)
        tok = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(tok)
        return tok[:, 1:]  # drop cls — x_norm_patchtokens


def interpolate_pos_encoding(pos: Array, gh: int, gw: int, base: int) -> Array:
    """Bicubic-resample the patch pos-embed grid (ref `dinov2.py:166-190`).

    Reproduces torch's explicit-scale-factor mapping including the +0.1
    anti-rounding offset. pos: (1, base*base+1, D).
    """
    n = base * base
    if gh * gw == n and gh == gw:
        return pos
    cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
    d = pos.shape[-1]
    grid = patch_pos.reshape(1, base, base, d)
    scale = ((gh + 0.1) / base, (gw + 0.1) / base)
    out = interpolate(grid, (gh, gw), mode="bicubic", align_corners=False, scale=scale)
    out = out.reshape(1, gh * gw, d)
    return jnp.concatenate([cls_pos, out], axis=1)


def vit_small(**kw) -> VisionTransformer:
    """ViT-S/14 factory (ref `dinov2.py:307-317`)."""
    cfg = DinoConfig(d_model=384, depth=12, num_heads=6, patch_size=14, pos_embed_size=37)
    return VisionTransformer(cfg, **kw)


def vit_base(**kw) -> VisionTransformer:
    """ViT-B/14 factory (ref `dinov2.py:320-330`)."""
    cfg = DinoConfig(d_model=768, depth=12, num_heads=12, patch_size=14, pos_embed_size=37)
    return VisionTransformer(cfg, **kw)


def vit_large(**kw) -> VisionTransformer:
    """ViT-L/14 factory (ref `dinov2.py:333-343` + `model/network.py:48-53`)."""
    cfg = DinoConfig(d_model=1024, depth=24, num_heads=16, patch_size=14, pos_embed_size=37)
    return VisionTransformer(cfg, **kw)


def vit_giant2(ffn_layer: str = "swiglufused", **kw) -> VisionTransformer:
    """ViT-g/14 factory (ref `dinov2.py:346-359`).

    Real DINOv2-g checkpoints use the fused SwiGLU FFN (`dinov2.py:109-110`),
    so that is the default here; pass ffn_layer="mlp" to mirror the reference
    file's (never-exercised) vendored default instead."""
    cfg = DinoConfig(
        d_model=1536, depth=40, num_heads=24, patch_size=14,
        pos_embed_size=37, ffn_layer=ffn_layer,
    )
    return VisionTransformer(cfg, **kw)


def load_dinov2_params(path: str) -> dict:
    """Load converted DINOv2 weights (see tools/convert_dinov2.py) as a flax
    param tree for `VisionTransformer`. `path` is an .npz archive."""
    raw = np.load(path)
    params: dict = {}

    def put(keys, val):
        d = params
        for k in keys[:-1]:
            d = d.setdefault(k, {})
        d[keys[-1]] = jnp.asarray(val)

    for name in raw.files:
        put(name.split("/"), raw[name])
    return params
