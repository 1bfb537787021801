"""Torch-checkpoint → flax parameter conversion.

One-time weight bridges (SURVEY.md §7 minimum slice):
  - `convert_dinov2_state_dict`: the public DINOv2 ViT-L/14 torch checkpoint
    (`dinov2_vitl14_pretrain.pth`, ref `model/network.py:46`) → our
    models.vit.VisionTransformer param tree;
  - `convert_gfnet_head_state_dict`: a reference GFNet checkpoint
    (`ckpts/*/latest.pth` "model" entry, ref `checkpointing/checkpoint.py:28`)
    → our models.gfnet.GFNet head variables (params + batch_stats);
  - `load_head_checkpoint`: dispatch loader (orbax dir / .npz / torch .pth).

Conventions: torch conv weight (O, I/g, kh, kw) → flax (kh, kw, I/g, O);
torch linear (O, I) → flax (I, O); BatchNorm running stats go to the
`batch_stats` collection.
"""

from __future__ import annotations

import os
from typing import Any, Mapping

import numpy as np


def _t_conv(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _t_lin(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (1, 0))


def _set(tree: dict, path: str, value) -> None:
    keys = path.split("/")
    d = tree
    for k in keys[:-1]:
        d = d.setdefault(k, {})
    d[keys[-1]] = np.asarray(value)


def convert_dinov2_state_dict(sd: Mapping[str, Any]) -> dict:
    """torch DINOv2 state dict → flax params for VisionTransformer."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    p: dict = {}
    _set(p, "patch_embed/kernel", _t_conv(sd["patch_embed.proj.weight"]))
    _set(p, "patch_embed/bias", sd["patch_embed.proj.bias"])
    _set(p, "cls_token", sd["cls_token"])
    _set(p, "pos_embed", sd["pos_embed"])
    n_blocks = 1 + max(
        int(k.split(".")[1]) for k in sd if k.startswith("blocks.")
    )
    # Blocks run as one nn.scan over stacked params (models/vit.py): each
    # leaf gets a leading depth axis under blocks/block/...
    pairs = [
        ("norm1/scale", "norm1.weight", None),
        ("norm1/bias", "norm1.bias", None),
        ("attn/qkv/kernel", "attn.qkv.weight", _t_lin),
        ("attn/qkv/bias", "attn.qkv.bias", None),
        ("attn/proj/kernel", "attn.proj.weight", _t_lin),
        ("attn/proj/bias", "attn.proj.bias", None),
        ("ls1/gamma", "ls1.gamma", None),
        ("ls2/gamma", "ls2.gamma", None),
        ("norm2/scale", "norm2.weight", None),
        ("norm2/bias", "norm2.bias", None),
        ("mlp/fc1/kernel", "mlp.fc1.weight", _t_lin),
        ("mlp/fc1/bias", "mlp.fc1.bias", None),
        ("mlp/fc2/kernel", "mlp.fc2.weight", _t_lin),
        ("mlp/fc2/bias", "mlp.fc2.bias", None),
    ]
    for flax_path, torch_name, tf in pairs:
        stacked = np.stack(
            [
                (tf(sd[f"blocks.{i}.{torch_name}"]) if tf else sd[f"blocks.{i}.{torch_name}"])
                for i in range(n_blocks)
            ]
        )
        _set(p, "blocks/block/" + flax_path, stacked)
    _set(p, "norm/scale", sd["norm.weight"])
    _set(p, "norm/bias", sd["norm.bias"])
    return p


def _convert_conv_bn(p, bs, torch_prefix, flax_prefix, sd, has_bias=False):
    _set(p, flax_prefix + "/conv/kernel", _t_conv(sd[torch_prefix + ".conv.weight"]))
    if has_bias and torch_prefix + ".conv.bias" in sd:
        _set(p, flax_prefix + "/conv/bias", sd[torch_prefix + ".conv.bias"])
    _set(p, flax_prefix + "/bn/scale", sd[torch_prefix + ".bn.weight"])
    _set(p, flax_prefix + "/bn/bias", sd[torch_prefix + ".bn.bias"])
    _set(bs, flax_prefix + "/bn/mean", sd[torch_prefix + ".bn.running_mean"])
    _set(bs, flax_prefix + "/bn/var", sd[torch_prefix + ".bn.running_var"])


def _convert_seq_conv_bn(p, bs, torch_prefix, flax_prefix, sd):
    """torch nn.Sequential(conv, bn, act) → ConvBNAct."""
    _set(p, flax_prefix + "/conv/kernel", _t_conv(sd[torch_prefix + ".0.weight"]))
    if torch_prefix + ".0.bias" in sd:
        _set(p, flax_prefix + "/conv/bias", sd[torch_prefix + ".0.bias"])
    _set(p, flax_prefix + "/bn/scale", sd[torch_prefix + ".1.weight"])
    _set(p, flax_prefix + "/bn/bias", sd[torch_prefix + ".1.bias"])
    _set(bs, flax_prefix + "/bn/mean", sd[torch_prefix + ".1.running_mean"])
    _set(bs, flax_prefix + "/bn/var", sd[torch_prefix + ".1.running_var"])


def convert_cross_block(p: dict, sd: Mapping[str, Any], t: str, o: str) -> None:
    """One reference CrossBlock (`block.py:255-329`) at torch prefix `t` →
    flax params under path prefix `o` (models.crossview.CrossBlock layout)."""
    _set(p, o + "norm1/scale", sd[t + "norm1.weight"])
    _set(p, o + "norm1/bias", sd[t + "norm1.bias"])
    for proj in ("q_proj", "k_proj", "v_proj"):
        _set(p, o + f"attn/{proj}/kernel", _t_lin(sd[t + f"attn.{proj}.weight"]))
    _set(p, o + "attn/proj/kernel", _t_lin(sd[t + "attn.proj.weight"]))
    _set(p, o + "attn/proj/bias", sd[t + "attn.proj.bias"])
    _set(p, o + "ls1/gamma", sd[t + "ls1.gamma"])
    _set(p, o + "ls2/gamma", sd[t + "ls2.gamma"])
    _set(p, o + "norm2/scale", sd[t + "norm2.weight"])
    _set(p, o + "norm2/bias", sd[t + "norm2.bias"])
    if t + "mlp.w12.weight" in sd:
        # SwiGLU FFN variant (ref `layers/swiglu_ffn.py:13-33`)
        _set(p, o + "mlp_w12/kernel", _t_lin(sd[t + "mlp.w12.weight"]))
        _set(p, o + "mlp_w12/bias", sd[t + "mlp.w12.bias"])
        _set(p, o + "mlp_w3/kernel", _t_lin(sd[t + "mlp.w3.weight"]))
        _set(p, o + "mlp_w3/bias", sd[t + "mlp.w3.bias"])
    else:
        _set(p, o + "mlp_fc1/kernel", _t_lin(sd[t + "mlp.fc1.weight"]))
        _set(p, o + "mlp_fc1/bias", sd[t + "mlp.fc1.bias"])
        _set(p, o + "mlp_fc2/kernel", _t_lin(sd[t + "mlp.fc2.weight"]))
        _set(p, o + "mlp_fc2/bias", sd[t + "mlp.fc2.bias"])


def convert_gfnet_head_state_dict(sd: Mapping[str, Any]) -> dict:
    """Reference GFNet checkpoint["model"] → our head variables
    {"params": ..., "batch_stats": ...}."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    p: dict = {}
    bs: dict = {}

    # cross-view decoder (ref names `dino_decoder.*`)
    _set(p, "crossview/proj/kernel", _t_lin(sd["dino_decoder.proj.weight"]))
    n_cross = 1 + max(
        int(k.split(".")[2]) for k in sd if k.startswith("dino_decoder.cross_attn_blocks.")
    )
    for i in range(n_cross):
        convert_cross_block(
            p, sd, f"dino_decoder.cross_attn_blocks.{i}.", f"crossview/cross{i}/"
        )

    # FPN encoder (ref `model/FPN.py:5-21`)
    for name in (
        "conv00", "conv01", "downsample1", "conv10", "conv11",
        "downsample2", "conv20", "conv21", "downsample3", "conv30", "conv31",
    ):
        _convert_conv_bn(p, bs, f"encoder.{name}", f"encoder/{name}", sd)

    # FPN decoder sequentials (ref `model/FPN.py:43-52`)
    for name in ("out0", "inner1", "out1", "inner2", "out2", "inner3", "out3"):
        _convert_seq_conv_bn(p, bs, f"decoder.{name}", f"fpn_decoder/{name}", sd)

    # merge layer (ref `model/network.py:66`)
    _convert_seq_conv_bn(p, bs, "merge_layer", "merge_layer", sd)

    # conv refiners (ref `model/network.py:77-155,505-531`)
    for scale in ("16", "8", "4", "2", "1"):
        t = f"conv_refiner.{scale}."
        o = f"refiners_{scale}/"
        _set(p, o + "disp_emb/kernel", _t_conv(sd[t + "disp_emb.weight"]))
        _set(p, o + "disp_emb/bias", sd[t + "disp_emb.bias"])

        def block(tb, ob):
            _set(p, ob + "dw/kernel", _t_conv(sd[tb + "0.weight"]))
            _set(p, ob + "dw/bias", sd[tb + "0.bias"])
            _set(p, ob + "bn/scale", sd[tb + "1.weight"])
            _set(p, ob + "bn/bias", sd[tb + "1.bias"])
            _set(bs, ob + "bn/mean", sd[tb + "1.running_mean"])
            _set(bs, ob + "bn/var", sd[tb + "1.running_var"])
            _set(p, ob + "pw/kernel", _t_conv(sd[tb + "3.weight"]))
            _set(p, ob + "pw/bias", sd[tb + "3.bias"])

        block(t + "block1.", o + "block1/")
        # hidden blocks run under nn.scan → stacked on a leading depth axis
        n_hidden = len(
            {k.split(".")[3] for k in sd if k.startswith(t + "hidden_blocks.")}
        )
        hpairs = [
            (p, "dw/kernel", "0.weight", _t_conv),
            (p, "dw/bias", "0.bias", None),
            (p, "bn/scale", "1.weight", None),
            (p, "bn/bias", "1.bias", None),
            (bs, "bn/mean", "1.running_mean", None),
            (bs, "bn/var", "1.running_var", None),
            (p, "pw/kernel", "3.weight", _t_conv),
            (p, "pw/bias", "3.bias", None),
        ]
        for tree, fpath, tname, tf in hpairs:
            stacked = np.stack(
                [
                    (tf(sd[t + f"hidden_blocks.{j}.{tname}"]) if tf
                     else sd[t + f"hidden_blocks.{j}.{tname}"])
                    for j in range(n_hidden)
                ]
            )
            _set(tree, o + "hidden/block/" + fpath, stacked)
        _set(p, o + "out_conv/kernel", _t_conv(sd[t + "out_conv.weight"]))
        _set(p, o + "out_conv/bias", sd[t + "out_conv.bias"])

    return {"params": p, "batch_stats": bs}


def _tree_cast_like(tree, template):
    import jax
    import jax.numpy as jnp

    return jax.tree_util.tree_map(
        lambda v, t: jnp.asarray(v, t.dtype).reshape(t.shape), tree, template
    )


def load_head_checkpoint(path: str, template_vars) -> dict:
    """Load head variables from an orbax dir / .npz / torch .pth checkpoint."""
    if os.path.isdir(path):
        import jax
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(
            os.path.abspath(path),
            jax.tree_util.tree_map(
                ocp.utils.to_shape_dtype_struct,
                {
                    "params": template_vars["params"],
                    "batch_stats": template_vars["batch_stats"],
                },
            ),
        )
        return dict(restored)
    if path.endswith(".npz"):
        raw = np.load(path)
        out: dict = {}
        for name in raw.files:
            if name == "__protocol_kv_norm__":
                # heads trained under the random-backbone cross-modal proxy
                # (GFNET_KV_NORM=1, see models/crossview.py:138) embed the
                # flag so evaluation auto-applies the same forward semantics
                # instead of relying on the caller exporting the env var
                if raw[name] and os.environ.get("GFNET_KV_NORM") != "1":
                    os.environ["GFNET_KV_NORM"] = "1"
                    print(
                        f"[gfnet] {os.path.basename(path)} was trained with "
                        "k/v standardization; enabling GFNET_KV_NORM=1 for "
                        "this process"
                    )
                continue
            _set(out, name, raw[name])
        return _tree_cast_like(out, template_vars)
    # torch .pth
    import torch

    states = torch.load(path, map_location="cpu", weights_only=False)
    sd = states.get("model", states)
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    converted = convert_gfnet_head_state_dict(sd)
    return _tree_cast_like(converted, template_vars)
