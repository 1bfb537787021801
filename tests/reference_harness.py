"""Import-and-drive harness for the actual reference GFNet on CPU.

Loads `/root/reference/model/network.py` (the real upstream composition —
`GFNet.forward` `network.py:203-283`, `match` `:285-384`) so parity tests can
compare this engine against machine-run reference outputs instead of hand
transcriptions. Three environmental gaps are stubbed, none of which changes
the numerics under test:

  - `romatch` (undeclared pip dep of `model/transformer/__init__.py:5`) —
    satisfied from the reference's own `utils/utils.py` implementations;
  - `torchvision` (absent in this image) — a minimal Resize/Normalize/
    ToTensor built on `F.interpolate(antialias=True)`, torchvision >= 0.17
    tensor semantics (`antialias=None` ≡ True, `utils/utils.py:90`);
  - flash-attn (CUDA-only) — `CrossFlashAttention2.forward`
    (`attention.py:227-258`) is rebound to an exact SDPA lowering of
    `flash_attn_func(q, k, v, softmax_scale)`: same projections, per-head
    attention over the sequence, same entropy-invariance scale. (The repo's
    own naive `CrossAttention.forward` (`attention.py:216-222`) is NOT used:
    it omits the head/sequence permute before `q @ k^T`, attending across
    heads — dead-in-practice code, every shipped config selects FLASH2.)

The hard-coded DINOv2 download + ViT-L construction (`network.py:46-54`) is
replaced by a small `DinoVisionTransformer` with identical topology so the
whole composition (frozen ViT included) runs in seconds on CPU.
"""

from __future__ import annotations

import sys
import types
from functools import partial

import numpy as np
import torch
import torch.nn.functional as TF

REF_ROOT = "/root/reference"

_MODE_MAP = {
    0: "nearest",
    2: "bilinear",
    3: "bicubic",
    "nearest": "nearest",
    "bilinear": "bilinear",
    "bicubic": "bicubic",
}


def _install_torchvision_stub() -> None:
    if "torchvision" in sys.modules:
        return

    class InterpolationMode:
        NEAREST = "nearest"
        BILINEAR = "bilinear"
        BICUBIC = "bicubic"

    class Resize:
        """transforms.Resize for CHW tensors, antialias=None ≡ True."""

        def __init__(self, size, interpolation="bilinear", antialias=None):
            self.size = tuple(size) if not isinstance(size, int) else (size, size)
            self.mode = _MODE_MAP[interpolation]

        def __call__(self, im):
            aa = self.mode in ("bilinear", "bicubic")
            out = TF.interpolate(
                im[None],
                size=self.size,
                mode=self.mode,
                align_corners=False if aa else None,
                antialias=aa,
            )
            return out[0]

    class Normalize:
        def __init__(self, mean, std):
            self.mean = torch.tensor(mean).view(-1, 1, 1)
            self.std = torch.tensor(std).view(-1, 1, 1)

        def __call__(self, im):
            return (im - self.mean) / self.std

    class ToTensor:
        def __call__(self, pic):
            arr = np.array(pic, dtype=np.float32).transpose(2, 0, 1) / 255.0
            return torch.from_numpy(arr)

    class Compose:
        def __init__(self, ops):
            self.ops = ops

        def __call__(self, x):
            for op in self.ops:
                x = op(x)
            return x

    tv = types.ModuleType("torchvision")
    tr = types.ModuleType("torchvision.transforms")
    trf = types.ModuleType("torchvision.transforms.functional")
    tr.Resize = Resize
    tr.Normalize = Normalize
    tr.ToTensor = ToTensor
    tr.Compose = Compose
    tr.InterpolationMode = InterpolationMode
    trf.InterpolationMode = InterpolationMode
    tv.transforms = tr
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tr
    sys.modules["torchvision.transforms.functional"] = trf


def _install_romatch_stub() -> None:
    if "romatch" in sys.modules:
        return
    import importlib

    refutils = importlib.import_module("utils.utils")
    rm = types.ModuleType("romatch")
    rmu = types.ModuleType("romatch.utils")
    rmuu = types.ModuleType("romatch.utils.utils")
    rmuu.get_grid = refutils.get_grid
    rmuu.get_autocast_params = refutils.get_autocast_params
    rm.utils = rmu
    rmu.utils = rmuu
    sys.modules["romatch"] = rm
    sys.modules["romatch.utils"] = rmu
    sys.modules["romatch.utils.utils"] = rmuu


_loaded = None


def load_reference():
    """Import the reference `model.network` (cached) with stubs installed.

    Returns the module. CrossFlashAttention2 is rebound to the naive
    CrossAttention forward so FLASH2 configs run on CPU.
    """
    global _loaded
    if _loaded is not None:
        return _loaded
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    _install_torchvision_stub()
    _install_romatch_stub()
    import model.network as refnet  # noqa: PLC0415
    from model.transformer.layers import attention as refattn  # noqa: PLC0415

    import math

    def _sdpa_cross_forward(self, x, key=None, value=None, **kw):
        B, N, C = x.shape
        key = x if key is None else key
        value = x if value is None else value
        hd = C // self.num_heads
        q = self.q_proj(x).reshape(B, N, self.num_heads, hd).transpose(1, 2)
        k = self.k_proj(key).reshape(B, -1, self.num_heads, hd).transpose(1, 2)
        v = self.v_proj(value).reshape(B, -1, self.num_heads, hd).transpose(1, 2)
        scale = (
            None
            if self.softmax_scale is None
            else self.scale * math.log(N, self.train_avg_length)
        )
        out = TF.scaled_dot_product_attention(q, k, v, scale=scale)
        out = out.transpose(1, 2).reshape(B, N, C)
        return self.proj_drop(self.proj(out))

    refattn.CrossFlashAttention2.forward = _sdpa_cross_forward
    _loaded = refnet
    return refnet


def small_conf(post_norm: bool = False, ffn_type: str = "ffn") -> dict:
    """A miniature of gfnet_configs/basic.json: same topology, small dims."""
    return {
        "dino_cfg": {
            "d_model": 48,
            "decoder_cfg": {
                "num_cross_attn": 2,
                "init_values": 1.0,
                "nhead": 2,
                "attention_type": "FLASH2",
                "ffn_type": ffn_type,
                "softmax_scale": "entropy_invariance",
                "train_avg_length": 64,
                "post_norm": post_norm,
                "pre_norm_query": True,
            },
        },
        "encoder_cfg": {"feat_chs": [16, 8, 8, 8]},
        "matcher": {
            "num_grid": [8, 8, 16, 32, 64],
            "radius": [3, 2, 2, 1, 0],
            "displacement_dim": [8, 8, 8, 8, 8],
            "num_itr": [2, 2, 1, 1, 1],
        },
    }


SMALL_VIT = dict(embed_dim=48, depth=2, num_heads=2)


def _small_vit_factory(**kw):
    """Replacement for `model.transformer.vit_large` (`dinov2.py:333-343`):
    same DinoVisionTransformer class and block/attention wiring, small dims."""
    from model.transformer.dinov2 import DinoVisionTransformer  # noqa: PLC0415
    from model.transformer.layers import (  # noqa: PLC0415
        MemEffAttention,
        NestedTensorBlock,
    )

    kw = dict(kw)
    kw.setdefault("mlp_ratio", 4)
    return DinoVisionTransformer(
        block_fn=partial(NestedTensorBlock, attn_class=MemEffAttention),
        **SMALL_VIT,
        **kw,
    )


def randomize_module_(module: torch.nn.Module, seed: int) -> None:
    """Deterministically randomize every float tensor in a module's state,
    keeping BN running_var positive. Makes LayerScale/BN/pos-embed parity
    violations visible (default init is often 0/1 identity-ish)."""
    g = torch.Generator().manual_seed(seed)
    sd = module.state_dict()
    new = {}
    for k, v in sd.items():
        if not v.dtype.is_floating_point:
            new[k] = v
        elif "running_var" in k:
            new[k] = 0.5 + torch.rand(v.shape, generator=g)
        else:
            new[k] = 0.25 * torch.randn(v.shape, generator=g)
    module.load_state_dict(new)


def build_reference_gfnet(
    conf: dict,
    seed: int = 0,
    initial_res=(112, 112),
    upsample_res=(168, 168),
    symmetric: bool = True,
    upsample_preds: bool = True,
    attenuate_cert: bool = True,
):
    """Construct the real reference GFNet (f32, CPU) with randomized weights.

    Returns the eval-mode torch model; its head state_dict converts through
    `convert_gfnet_head_state_dict`, its `.dino[0]` through
    `convert_dinov2_state_dict`.
    """
    refnet = load_reference()
    import model.transformer as reft  # noqa: PLC0415

    orig_factory = reft.vit_large
    orig_hub = torch.hub.load_state_dict_from_url
    try:
        reft.vit_large = _small_vit_factory
        torch.hub.load_state_dict_from_url = (
            lambda *a, **k: _small_vit_factory(
                img_size=518, patch_size=14, init_values=1.0,
                ffn_layer="mlp", block_chunks=0,
            ).state_dict()
        )
        model = refnet.GFNet(
            conf,
            amp=False,
            amp_dtype=torch.float32,
            initial_res=initial_res,
            upsample_res=upsample_res,
            symmetric=symmetric,
            upsample_preds=upsample_preds,
            attenuate_cert=attenuate_cert,
        )
    finally:
        reft.vit_large = orig_factory
        torch.hub.load_state_dict_from_url = orig_hub
    randomize_module_(model, seed)
    randomize_module_(model.dino[0], seed + 1)
    model.eval()
    return model
