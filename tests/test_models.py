"""Shape/dtype/behavior tests for the model stack on the tiny config."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gfnet_tpu.config import tiny_test_config
from gfnet_tpu.models.crossview import CrossViewDecoder, sine_position_encoding
from gfnet_tpu.models.fpn import FPNDecoder, FPNEncoder
from gfnet_tpu.models.gfnet import GFNet
from gfnet_tpu.models.refiner import ConvRefiner
from gfnet_tpu.models.vit import VisionTransformer, interpolate_pos_encoding


@pytest.fixture(scope="module")
def cfg():
    return tiny_test_config()


def test_vit_shapes(cfg):
    vit = VisionTransformer(cfg.dino, dtype=jnp.float32)
    x = jnp.zeros((2, 112, 112, 3))
    params = vit.init(jax.random.PRNGKey(0), x)
    tok = vit.apply(params, x)
    assert tok.shape == (2, 8 * 8, cfg.dino.d_model)
    assert jnp.all(jnp.isfinite(tok))


def test_vit_pos_embed_native_vs_interp(cfg):
    pos = jax.random.normal(jax.random.PRNGKey(1), (1, 8 * 8 + 1, 16))
    same = interpolate_pos_encoding(pos, 8, 8, 8)
    assert same is pos  # no-op at native grid
    up = interpolate_pos_encoding(pos, 12, 12, 8)
    assert up.shape == (1, 12 * 12 + 1, 16)
    # cls position untouched
    np.testing.assert_allclose(up[:, 0], pos[:, 0])


def test_sine_pe_structure():
    pe = sine_position_encoding(16, 8, 10)
    assert pe.shape == (8, 10, 16)
    # channel 1 is cos(x * div0): at x=1 col 0 -> cos(1 * 128/10 * 1) pattern is
    # constant along rows
    np.testing.assert_allclose(pe[:, 0, 1], pe[0, 0, 1] * np.ones(8), atol=1e-6)


def test_crossview_decoder_symmetry(cfg):
    dec = CrossViewDecoder(
        d_vit=cfg.dino.d_model, out_dim=16, cfg=cfg.dino.decoder_cfg, dtype=jnp.float32
    )
    k = jax.random.PRNGKey(2)
    x = jax.random.normal(k, (2, 64, cfg.dino.d_model))
    y = jax.random.normal(jax.random.PRNGKey(3), (2, 64, cfg.dino.d_model))
    params = dec.init(jax.random.PRNGKey(4), x, y, (8, 8))
    fx, fy = dec.apply(params, x, y, (8, 8))
    assert fx.shape == (2, 8, 8, 16) and fy.shape == (2, 8, 8, 16)
    # weight sharing: swapping inputs swaps outputs
    gx, gy = dec.apply(params, y, x, (8, 8))
    np.testing.assert_allclose(np.asarray(fx), np.asarray(gy), rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(np.asarray(fy), np.asarray(gx), rtol=2e-2, atol=2e-3)


def test_fpn_pyramid_shapes(cfg):
    chs = tuple(cfg.encoder.feat_chs)[::-1]  # fine→coarse
    enc = FPNEncoder(chs, dtype=jnp.float32)
    dec = FPNDecoder(chs, dtype=jnp.float32)
    x = jnp.zeros((2, 64, 64, 3))
    ep = enc.init(jax.random.PRNGKey(0), x)
    c01, c11, c21, c31 = enc.apply(ep, x)
    assert c01.shape == (2, 64, 64, chs[0])
    assert c11.shape == (2, 32, 32, chs[1])
    assert c21.shape == (2, 16, 16, chs[2])
    assert c31.shape == (2, 8, 8, chs[3])
    dp = dec.init(jax.random.PRNGKey(1), c01, c11, c21, c31)
    o0, o1, o2, o3 = dec.apply(dp, c01, c11, c21, c31)
    assert o0.shape == (2, 8, 8, chs[3])
    assert o1.shape == (2, 16, 16, chs[2])
    assert o2.shape == (2, 32, 32, chs[1])
    assert o3.shape == (2, 64, 64, chs[0])


def test_conv_refiner_output(cfg):
    r = 2
    c = 8
    disp = 8
    hidden = 2 * c + disp + (2 * r + 1) ** 2
    ref = ConvRefiner(hidden_dim=hidden, displacement_dim=disp, radius=r, dtype=jnp.float32)
    q = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 12, c))
    t = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 12, c))
    flow = jnp.zeros((2, 8, 8, 2))
    params = ref.init(jax.random.PRNGKey(2), q, t, flow)
    df, dc = ref.apply(params, q, t, flow)
    assert df.shape == (2, 8, 8, 2)
    assert dc.shape == (2, 8, 8, 1)
    assert jnp.all(jnp.isfinite(df))


def test_gfnet_forward_corresps(cfg):
    head = GFNet(cfg, dtype=jnp.float32)
    b, h, w = 1, *cfg.initial_res
    gh = h // cfg.dino.patch_size
    imA = jax.random.uniform(jax.random.PRNGKey(0), (b, h, w, 3))
    imB = jax.random.uniform(jax.random.PRNGKey(1), (b, h, w, 3))
    tokens = jax.random.normal(jax.random.PRNGKey(2), (2 * b, gh * gh, cfg.dino.d_model))
    vars_ = head.init(jax.random.PRNGKey(3), imA, imB, tokens)
    corresps = head.apply(vars_, imA, imB, tokens)
    assert list(corresps.keys()) == ["16", "8", "4", "2", "1"]
    for i, scale in enumerate(["16", "8", "4", "2", "1"]):
        g = cfg.matcher.num_grid[i]
        fl = corresps[scale][1]["flow"]
        ce = corresps[scale][1]["certainty"]
        assert fl.shape == (b, g, g, 2), (scale, fl.shape)
        assert ce.shape == (b, g, g, 1)
        assert bool(jnp.all(jnp.isfinite(fl)))


def test_gfnet_forward_symmetric_doubles_batch(cfg):
    head = GFNet(cfg, dtype=jnp.float32)
    b, h, w = 1, *cfg.initial_res
    gh = h // cfg.dino.patch_size
    imA = jax.random.uniform(jax.random.PRNGKey(0), (b, h, w, 3))
    imB = jax.random.uniform(jax.random.PRNGKey(1), (b, h, w, 3))
    tokens = jax.random.normal(jax.random.PRNGKey(2), (2 * b, gh * gh, cfg.dino.d_model))
    vars_ = head.init(jax.random.PRNGKey(3), imA, imB, tokens)
    corresps = head.apply(vars_, imA, imB, tokens, symmetric=True)
    assert corresps["1"][1]["flow"].shape[0] == 2 * b


def test_gfnet_grad_flows_only_into_head(cfg):
    """Gradient smoke test: loss on final flow produces finite grads."""
    head = GFNet(cfg, dtype=jnp.float32)
    b, h, w = 1, *cfg.initial_res
    gh = h // cfg.dino.patch_size
    imA = jax.random.uniform(jax.random.PRNGKey(0), (b, h, w, 3))
    imB = jax.random.uniform(jax.random.PRNGKey(1), (b, h, w, 3))
    tokens = jax.random.normal(jax.random.PRNGKey(2), (2 * b, gh * gh, cfg.dino.d_model))
    vars_ = head.init(jax.random.PRNGKey(3), imA, imB, tokens)

    def loss_fn(params):
        out, _ = head.apply(
            {"params": params, "batch_stats": vars_["batch_stats"]},
            imA, imB, tokens, train=True, mutable=["batch_stats"],
        )
        return sum(
            jnp.mean(out[s][1]["flow"] ** 2) + jnp.mean(out[s][1]["certainty"] ** 2)
            for s in out
        )

    grads = jax.grad(loss_fn)(vars_["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in leaves)
    total = sum(float(jnp.sum(jnp.abs(g))) for g in leaves)
    assert total > 0


def test_vit_swiglu_ffn_golden(cfg):
    """SwiGLU backbone variant (real DINOv2-g FFN, ref `layers/swiglu_ffn.py:44-62`
    + `dinov2.py:109-110`): forward works and matches the torch formula
    hidden = (int(4d*2/3)+7)//8*8, silu(x1)*x2 through packed w12."""
    import dataclasses

    import torch

    dino = dataclasses.replace(cfg.dino, ffn_layer="swiglufused")
    vit = VisionTransformer(dino, dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (1, 112, 112, 3)), jnp.float32)
    params = vit.init(jax.random.PRNGKey(0), x)
    tok = vit.apply(params, x)
    assert tok.shape == (1, 8 * 8, dino.d_model)
    assert jnp.all(jnp.isfinite(tok))

    # packed-w12 width rule + formula vs a torch transcription of SwiGLUFFNFused
    mlp = params["params"]["blocks"]["block"]["mlp"]
    d = dino.d_model
    hf = (int(d * dino.mlp_ratio * 2 / 3) + 7) // 8 * 8
    assert mlp["w12"]["kernel"].shape == (dino.depth, d, 2 * hf)
    w12 = np.asarray(mlp["w12"]["kernel"][0])
    b12 = np.asarray(mlp["w12"]["bias"][0])
    w3 = np.asarray(mlp["w3"]["kernel"][0])
    b3 = np.asarray(mlp["w3"]["bias"][0])
    h = np.random.default_rng(1).normal(0, 1, (5, d)).astype(np.float32)
    x12 = torch.from_numpy(h @ w12 + b12)
    x1, x2 = x12.chunk(2, dim=-1)
    want = (torch.nn.functional.silu(x1) * x2).numpy() @ w3 + b3

    from gfnet_tpu.models.vit import SwiGLUFFNFused

    got = SwiGLUFFNFused(d, int(d * dino.mlp_ratio), dtype=jnp.float32).apply(
        {"params": {"w12": {k: jnp.asarray(v[0]) for k, v in mlp["w12"].items()},
                    "w3": {k: jnp.asarray(v[0]) for k, v in mlp["w3"].items()}}},
        jnp.asarray(h),
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)
