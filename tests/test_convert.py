"""Weight-conversion parity tests.

The DINOv2 conversion is the highest numeric risk (SURVEY.md §7 hard part
#2): a small drift amplifies through the correlation volume. Here a
from-first-principles torch ViT with DINOv2 semantics (pre-norm blocks,
LayerScale, exact GELU, fused qkv, cls+pos tokens, final LN) is built at
tiny size, its state dict converted, and outputs compared elementwise.
"""

import os
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as TF  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gfnet_tpu.config import DinoConfig, tiny_test_config  # noqa: E402
from gfnet_tpu.models.vit import VisionTransformer  # noqa: E402
from gfnet_tpu.utils.convert import (  # noqa: E402
    convert_dinov2_state_dict,
    convert_gfnet_head_state_dict,
)


class _TorchBlock(tnn.Module):
    def __init__(self, d, heads):
        super().__init__()
        self.norm1 = tnn.LayerNorm(d, eps=1e-6)
        self.attn = tnn.ModuleDict(
            {"qkv": tnn.Linear(d, 3 * d), "proj": tnn.Linear(d, d)}
        )
        self.ls1 = tnn.ParameterDict({"gamma": tnn.Parameter(torch.ones(d))})
        self.norm2 = tnn.LayerNorm(d, eps=1e-6)
        self.mlp = tnn.ModuleDict(
            {"fc1": tnn.Linear(d, 4 * d), "fc2": tnn.Linear(4 * d, d)}
        )
        self.ls2 = tnn.ParameterDict({"gamma": tnn.Parameter(torch.ones(d))})
        self.heads = heads

    def forward(self, x):
        b, n, d = x.shape
        h = self.norm1(x)
        qkv = self.attn["qkv"](h).reshape(b, n, 3, self.heads, d // self.heads)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)
        a = TF.scaled_dot_product_attention(q, k, v)
        a = a.transpose(1, 2).reshape(b, n, d)
        x = x + self.ls1["gamma"] * self.attn["proj"](a)
        h = self.norm2(x)
        h = self.mlp["fc2"](TF.gelu(self.mlp["fc1"](h)))
        return x + self.ls2["gamma"] * h


class _TorchDino(tnn.Module):
    """Minimal DINOv2-equivalent forward_features (patch tokens out)."""

    def __init__(self, d=32, depth=2, heads=2, patch=14, base=8):
        super().__init__()
        self.patch_embed = tnn.ModuleDict({"proj": tnn.Conv2d(3, d, patch, patch)})
        self.cls_token = tnn.Parameter(torch.randn(1, 1, d) * 0.02)
        self.pos_embed = tnn.Parameter(torch.randn(1, base * base + 1, d) * 0.02)
        self.blocks = tnn.ModuleList([_TorchBlock(d, heads) for _ in range(depth)])
        self.norm = tnn.LayerNorm(d, eps=1e-6)
        self.base = base

    def forward(self, x):
        b = x.shape[0]
        t = self.patch_embed["proj"](x).flatten(2).transpose(1, 2)
        t = torch.cat([self.cls_token.expand(b, -1, -1), t], dim=1)
        t = t + self.pos_embed  # native grid only in this test
        for blk in self.blocks:
            t = blk(t)
        return self.norm(t)[:, 1:]

    def ref_style_state_dict(self):
        sd = {}
        sd["patch_embed.proj.weight"] = self.patch_embed["proj"].weight
        sd["patch_embed.proj.bias"] = self.patch_embed["proj"].bias
        sd["cls_token"] = self.cls_token
        sd["pos_embed"] = self.pos_embed
        for i, blk in enumerate(self.blocks):
            p = f"blocks.{i}."
            sd[p + "norm1.weight"] = blk.norm1.weight
            sd[p + "norm1.bias"] = blk.norm1.bias
            sd[p + "attn.qkv.weight"] = blk.attn["qkv"].weight
            sd[p + "attn.qkv.bias"] = blk.attn["qkv"].bias
            sd[p + "attn.proj.weight"] = blk.attn["proj"].weight
            sd[p + "attn.proj.bias"] = blk.attn["proj"].bias
            sd[p + "ls1.gamma"] = blk.ls1["gamma"]
            sd[p + "ls2.gamma"] = blk.ls2["gamma"]
            sd[p + "norm2.weight"] = blk.norm2.weight
            sd[p + "norm2.bias"] = blk.norm2.bias
            sd[p + "mlp.fc1.weight"] = blk.mlp["fc1"].weight
            sd[p + "mlp.fc1.bias"] = blk.mlp["fc1"].bias
            sd[p + "mlp.fc2.weight"] = blk.mlp["fc2"].weight
            sd[p + "mlp.fc2.bias"] = blk.mlp["fc2"].bias
        sd["norm.weight"] = self.norm.weight
        sd["norm.bias"] = self.norm.bias
        return {k: v.detach().numpy() for k, v in sd.items()}


def test_dinov2_conversion_numerical_parity():
    torch.manual_seed(0)
    tmodel = _TorchDino().eval()
    x = torch.rand(2, 3, 112, 112)
    with torch.no_grad():
        ref = tmodel(x).numpy()

    params = convert_dinov2_state_dict(tmodel.ref_style_state_dict())
    cfg = DinoConfig(d_model=32, depth=2, num_heads=2, patch_size=14, pos_embed_size=8)
    vit = VisionTransformer(cfg, dtype=jnp.float32)
    ours = vit.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(x.permute(0, 2, 3, 1).numpy()),
    )
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-5)


def test_head_conversion_tree_matches_template():
    """A reference-named random state dict converts into exactly our head
    variable tree (same paths, shapes, no extras/missing)."""
    from gfnet_tpu.matcher.api import GFNetMatcher

    cfg = tiny_test_config()
    matcher = GFNetMatcher(cfg, dtype=jnp.float32)
    template = matcher.head_vars

    rng = np.random.default_rng(0)

    def make_sd():
        sd = {}
        fd = tuple(cfg.encoder.feat_chs)  # (16, 8, 8, 8) coarse→fine
        d = fd[0]
        sd["dino_decoder.proj.weight"] = rng.standard_normal((d, cfg.dino.d_model)).astype("f")
        for i in range(cfg.dino.decoder_cfg.num_cross_attn):
            p = f"dino_decoder.cross_attn_blocks.{i}."
            for nm in ("norm1", "norm2"):
                sd[p + nm + ".weight"] = np.ones(d, "f")
                sd[p + nm + ".bias"] = np.zeros(d, "f")
            for proj in ("q_proj", "k_proj", "v_proj"):
                sd[p + f"attn.{proj}.weight"] = rng.standard_normal((d, d)).astype("f")
            sd[p + "attn.proj.weight"] = rng.standard_normal((d, d)).astype("f")
            sd[p + "attn.proj.bias"] = np.zeros(d, "f")
            sd[p + "ls1.gamma"] = np.ones(d, "f")
            sd[p + "ls2.gamma"] = np.ones(d, "f")
            sd[p + "mlp.fc1.weight"] = rng.standard_normal((4 * d, d)).astype("f")
            sd[p + "mlp.fc1.bias"] = np.zeros(4 * d, "f")
            sd[p + "mlp.fc2.weight"] = rng.standard_normal((d, 4 * d)).astype("f")
            sd[p + "mlp.fc2.bias"] = np.zeros(d, "f")

        def conv_bn(prefix, cin, cout, k):
            sd[prefix + ".conv.weight"] = rng.standard_normal((cout, cin, k, k)).astype("f")
            sd[prefix + ".bn.weight"] = np.ones(cout, "f")
            sd[prefix + ".bn.bias"] = np.zeros(cout, "f")
            sd[prefix + ".bn.running_mean"] = np.zeros(cout, "f")
            sd[prefix + ".bn.running_var"] = np.ones(cout, "f")

        f = fd[::-1]  # fine→coarse
        conv_bn("encoder.conv00", 3, f[0], 7)
        conv_bn("encoder.conv01", f[0], f[0], 5)
        conv_bn("encoder.downsample1", f[0], f[1], 5)
        conv_bn("encoder.conv10", f[1], f[1], 3)
        conv_bn("encoder.conv11", f[1], f[1], 3)
        conv_bn("encoder.downsample2", f[1], f[2], 5)
        conv_bn("encoder.conv20", f[2], f[2], 3)
        conv_bn("encoder.conv21", f[2], f[2], 3)
        conv_bn("encoder.downsample3", f[2], f[3], 3)
        conv_bn("encoder.conv30", f[3], f[3], 3)
        conv_bn("encoder.conv31", f[3], f[3], 3)

        def seq(prefix, cin, cout, k):
            sd[prefix + ".0.weight"] = rng.standard_normal((cout, cin, k, k)).astype("f")
            sd[prefix + ".0.bias"] = np.zeros(cout, "f")
            sd[prefix + ".1.weight"] = np.ones(cout, "f")
            sd[prefix + ".1.bias"] = np.zeros(cout, "f")
            sd[prefix + ".1.running_mean"] = np.zeros(cout, "f")
            sd[prefix + ".1.running_var"] = np.ones(cout, "f")

        seq("decoder.out0", f[3], f[3], 1)
        seq("decoder.inner1", f[3] + f[2], f[2], 3)
        seq("decoder.out1", f[2], f[2], 1)
        seq("decoder.inner2", f[2] + f[1], f[1], 3)
        seq("decoder.out2", f[1], f[1], 1)
        seq("decoder.inner3", f[1] + f[0], f[0], 3)
        seq("decoder.out3", f[0], f[0], 1)
        seq("merge_layer", 2 * fd[0], fd[0], 3)

        feat_at = {"16": fd[0], "8": fd[0], "4": fd[1], "2": fd[2], "1": fd[3]}
        for i, scale in enumerate(("16", "8", "4", "2", "1")):
            r = cfg.matcher.radius[i]
            disp = cfg.matcher.displacement_dim[i]
            kwin = (2 * r + 1) ** 2 if r > 0 else 0
            hidden = 2 * feat_at[scale] + disp + kwin
            t = f"conv_refiner.{scale}."
            sd[t + "disp_emb.weight"] = rng.standard_normal((disp, 2, 1, 1)).astype("f")
            sd[t + "disp_emb.bias"] = np.zeros(disp, "f")

            def block(tb):
                sd[tb + "0.weight"] = rng.standard_normal((hidden, 1, 5, 5)).astype("f")
                sd[tb + "0.bias"] = np.zeros(hidden, "f")
                sd[tb + "1.weight"] = np.ones(hidden, "f")
                sd[tb + "1.bias"] = np.zeros(hidden, "f")
                sd[tb + "1.running_mean"] = np.zeros(hidden, "f")
                sd[tb + "1.running_var"] = np.ones(hidden, "f")
                sd[tb + "3.weight"] = rng.standard_normal((hidden, hidden, 1, 1)).astype("f")
                sd[tb + "3.bias"] = np.zeros(hidden, "f")

            block(t + "block1.")
            for j in range(8):
                block(t + f"hidden_blocks.{j}.")
            sd[t + "out_conv.weight"] = rng.standard_normal((3, hidden, 1, 1)).astype("f")
            sd[t + "out_conv.bias"] = np.zeros(3, "f")
        return sd

    converted = convert_gfnet_head_state_dict(make_sd())

    def paths(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            p = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                out.update(paths(v, p))
            else:
                out[p] = tuple(np.shape(v))
        return out

    tpl_p = paths(jax.tree_util.tree_map(np.asarray, template["params"]))
    cv_p = paths(converted["params"])
    assert set(tpl_p) == set(cv_p), (
        sorted(set(tpl_p) - set(cv_p))[:5],
        sorted(set(cv_p) - set(tpl_p))[:5],
    )
    for k in tpl_p:
        assert tpl_p[k] == cv_p[k], (k, tpl_p[k], cv_p[k])
    tpl_b = paths(jax.tree_util.tree_map(np.asarray, template["batch_stats"]))
    cv_b = paths(converted["batch_stats"])
    assert set(tpl_b) == set(cv_b)


def test_npz_kv_norm_protocol_flag_autoapplies(tmp_path, monkeypatch):
    """Heads trained under the GFNET_KV_NORM proxy recipe embed a protocol
    flag; loading one must enable the same forward semantics for the process
    (utils/convert.py) instead of relying on the caller exporting the env."""
    import jax.numpy as jnp

    from gfnet_tpu.utils.convert import load_head_checkpoint

    template = {"params": {"w": jnp.zeros((2, 3), jnp.float32)},
                "batch_stats": {"m": jnp.zeros((3,), jnp.float32)}}
    w = np.arange(6, dtype=np.float32).reshape(2, 3)
    m = np.ones((3,), np.float32)
    path = str(tmp_path / "head.npz")
    np.savez(path, **{"params/w": w, "batch_stats/m": m,
                      "__protocol_kv_norm__": np.asarray(1)})

    monkeypatch.delenv("GFNET_KV_NORM", raising=False)
    restored = load_head_checkpoint(path, template)
    assert os.environ.get("GFNET_KV_NORM") == "1"
    assert set(restored) == {"params", "batch_stats"}  # flag not in the tree
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]), w)

    # flag absent -> env untouched (real pretrained-backbone checkpoints)
    monkeypatch.delenv("GFNET_KV_NORM", raising=False)
    np.savez(path, **{"params/w": w, "batch_stats/m": m})
    load_head_checkpoint(path, template)
    assert os.environ.get("GFNET_KV_NORM") is None
