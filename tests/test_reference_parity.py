"""Full-composition golden tests against the ACTUAL reference implementation.

Runs the real `/root/reference/model/network.py` GFNet (CPU, f32, exact SDPA
substitute for flash-attn — see tests/reference_harness.py) and this engine
with IDENTICAL converted weights and identical inputs, asserting elementwise
parity of:

  - `GFNet.forward` corresps per scale/iteration (ref `network.py:203-283`),
    symmetric and non-symmetric, eval and train mode;
  - the upsample-refinement re-entry (`network.py:223-249`);
  - `GFNet.match` end-to-end: preprocessing, both passes, certainty
    attenuation, clamping, symmetric warp stitch (`network.py:285-384`).

This machine-checks the whole composition (concat order, per-scale
displacement scaling `network.py:262`, detached inter-scale upsample
`:271-281`) rather than per-op transcriptions.

Eval-mode tests run num_itr=1 (the shipped basic.json schedule): at
iterations >= 2 the reference's inference early-zero mask
(`network.py:264-265`, rel-change < 1e-6) is evaluated exactly at float
noise level when weights are random (measured median rel ~= 2e-6), so ANY
two float implementations — including the reference against itself on a
different BLAS — flip cells. The iteration loop itself is covered by the
train-mode test (the reference skips early-zero when training,
`network.py:264`), which also pins batch-stat BatchNorm semantics.
"""

import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from gfnet_tpu.config import ModelConfig  # noqa: E402
from gfnet_tpu.matcher.api import GFNetMatcher  # noqa: E402
from gfnet_tpu.utils.convert import (  # noqa: E402
    convert_dinov2_state_dict,
    convert_gfnet_head_state_dict,
)
from reference_harness import build_reference_gfnet, small_conf  # noqa: E402

IMAGENET_MEAN = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
IMAGENET_STD = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)


def _model_config(conf: dict) -> ModelConfig:
    base = ModelConfig.from_dict(conf)
    dino = dataclasses.replace(
        base.dino, d_model=48, depth=2, num_heads=2, patch_size=14, pos_embed_size=37
    )
    return base.replace(
        dino=dino,
        initial_res=(112, 112),
        upsample_res=(168, 168),
        symmetric=True,
        upsample_preds=True,
        attenuate_cert=True,
    )


@pytest.fixture(scope="module")
def engines():
    conf = small_conf()
    conf["matcher"]["num_itr"] = [1, 1, 1, 1, 1]
    ref = build_reference_gfnet(conf, seed=0)
    vit_params = {"params": convert_dinov2_state_dict(ref.dino[0].state_dict())}
    head_vars = convert_gfnet_head_state_dict(
        {k: v.numpy() for k, v in ref.state_dict().items()}
    )
    ours = GFNetMatcher(
        _model_config(conf), vit_params=vit_params, head_vars=head_vars,
        dtype=jnp.float32,
    )
    return ref, ours


def _rand_images(seed, res):
    g = torch.Generator().manual_seed(seed)
    a = torch.rand(1, 3, res, res, generator=g)
    b = torch.rand(1, 3, res, res, generator=g)
    return a, b


def _normed(t):
    return (t - IMAGENET_MEAN) / IMAGENET_STD


def _nhwc(t):
    return jnp.asarray(t.permute(0, 2, 3, 1).numpy())


def _assert_corresps_close(ref_out, our_out, atol):
    assert set(ref_out.keys()) == set(our_out.keys())
    for s in ref_out:
        assert set(ref_out[s].keys()) == set(our_out[s].keys()), s
        for itr in ref_out[s]:
            for key in ("flow", "certainty"):
                want = ref_out[s][itr][key].detach().permute(0, 2, 3, 1).numpy()
                got = np.asarray(our_out[s][itr][key])
                assert got.shape == want.shape, (s, itr, key)
                np.testing.assert_allclose(
                    got, want, atol=atol, rtol=0,
                    err_msg=f"scale {s} itr {itr} {key}",
                )


@pytest.mark.parametrize("symmetric", [True, False])
def test_forward_composition_parity(engines, symmetric):
    """`GFNet.forward` (initial pass, eval) elementwise vs the reference."""
    ref, ours = engines
    a, b = _rand_images(11, 112)
    an, bn = _normed(a), _normed(b)
    with torch.no_grad():
        ref_out = ref.forward({"im_A": an, "im_B": bn}, symmetric=symmetric)
    our_out = ours.forward(ours.head_vars, _nhwc(an), _nhwc(bn), symmetric=symmetric)
    _assert_corresps_close(ref_out, our_out, atol=2e-4)


def test_train_mode_iteration_parity(engines):
    """Train-mode forward with num_itr=2 at the coarse scales: pins the
    iteration loop (ref `network.py:257-269`, no early-zero when training)
    and batch-stat BatchNorm semantics across FPN/refiners/merge."""
    ref, ours = engines
    two_itr = [2, 2, 1, 1, 1]
    ref.num_itr = two_itr
    cfg2 = ours.cfg.replace(
        matcher=dataclasses.replace(ours.cfg.matcher, num_itr=tuple(two_itr))
    )
    ours2 = GFNetMatcher(
        cfg2, vit_params=ours.vit_params, head_vars=ours.head_vars,
        dtype=jnp.float32,
    )
    a, b = _rand_images(19, 112)
    an, bn = _normed(a), _normed(b)
    # train-mode forward mutates BN running stats in place — snapshot and
    # restore so the shared module-scoped fixture stays pristine
    snapshot = {k: v.clone() for k, v in ref.state_dict().items()}
    ref.train(True)
    try:
        with torch.no_grad():
            ref_out = ref.forward({"im_A": an, "im_B": bn}, symmetric=True)
    finally:
        ref.train(False)
        ref.num_itr = [1, 1, 1, 1, 1]
        ref.load_state_dict(snapshot)
    our_out, _ = ours2.forward(
        ours2.head_vars, _nhwc(an), _nhwc(bn), symmetric=True,
        train=True, mutable=True,
    )
    _assert_corresps_close(ref_out, our_out, atol=5e-4)


def test_upsample_forward_parity(engines):
    """The 560-style second pass: re-entry from pre_corresps at the "8" scale
    (ref `network.py:223-249`) with scale_factor (ref `network.py:347`)."""
    ref, ours = engines
    a, b = _rand_images(13, 112)
    au, bu = _rand_images(17, 168)
    an, bn = _normed(a), _normed(b)
    aun, bun = _normed(au), _normed(bu)
    sf = float(np.sqrt(168 * 168 / (112 * 112)))
    with torch.no_grad():
        pass1 = ref.forward({"im_A": an, "im_B": bn}, symmetric=True)
        finest = pass1["1"][ref.num_itr[-1]]
        ref.num_grid_up = [12, 24, 48, 96]
        ref.num_itr_up = ref.num_itr[-4:]
        ref_out = ref.forward(
            {"im_A": aun, "im_B": bun},
            pre_corresps={"flow": finest["flow"], "certainty": finest["certainty"]},
            scale_factor=sf,
            upsample=True,
            symmetric=True,
        )
    our_pass1 = ours.forward(ours.head_vars, _nhwc(an), _nhwc(bn), symmetric=True)
    our_finest = our_pass1["1"][ref.num_itr[-1]]
    our_out = ours.forward(
        ours.head_vars,
        _nhwc(aun),
        _nhwc(bun),
        symmetric=True,
        upsample=True,
        scale_factor=sf,
        pre_flow=our_finest["flow"],
        pre_certainty=our_finest["certainty"],
    )
    _assert_corresps_close(ref_out, our_out, atol=5e-4)


def test_match_end_to_end_parity(engines):
    """`GFNet.match` on raw images: preprocessing + both passes + attenuation
    + symmetric warp stitch (ref `network.py:285-384`). The outputs compared
    here are exactly what `sample()` consumes (`estimation.py:57-60`)."""
    ref, ours = engines
    a, b = _rand_images(29, 168)
    with torch.no_grad():
        ref_warp, ref_cert = ref.match(a, b)  # (96, 192, 4), (96, 192)
    our_warp, our_cert = ours.match(
        jnp.asarray(a[0].permute(1, 2, 0).numpy()),
        jnp.asarray(b[0].permute(1, 2, 0).numpy()),
    )
    np.testing.assert_allclose(
        np.asarray(our_warp), ref_warp.numpy(), atol=1e-3, rtol=0
    )
    np.testing.assert_allclose(
        np.asarray(our_cert), ref_cert.numpy(), atol=1e-3, rtol=0
    )


@pytest.mark.parametrize("post_norm", [False, True])
@pytest.mark.parametrize("ffn_type", ["ffn", "glu"])
def test_crossblock_variant_parity(post_norm, ffn_type):
    """CrossBlock variants vs the reference class itself: post-norm ordering
    (ref `block.py:319-321`) and the SwiGLU FFN (`swiglu_ffn.py:13-33`).
    The shipped configs use pre-norm+ffn; these variants are config-reachable
    so they must not silently diverge (or no-op)."""
    from reference_harness import load_reference, small_conf

    load_reference()
    from model.transformer.layers.attention import CrossFlashAttention2
    from model.transformer.layers.block import CrossBlock as RefCrossBlock
    from model.transformer.layers.mlp import Mlp as RefMlp
    from model.transformer.layers.swiglu_ffn import SwiGLUFFN

    from gfnet_tpu.models.crossview import CrossBlock
    from gfnet_tpu.utils.convert import convert_cross_block
    from reference_harness import randomize_module_

    dcfg_raw = small_conf(post_norm=post_norm, ffn_type=ffn_type)
    dec = dcfg_raw["dino_cfg"]["decoder_cfg"]
    ref_blk = RefCrossBlock(
        dim=16,
        num_heads=dec["nhead"],
        attn_class=CrossFlashAttention2,
        ffn_layer=SwiGLUFFN if ffn_type == "glu" else RefMlp,
        **dec,
    )
    randomize_module_(ref_blk, seed=7)
    ref_blk.eval()

    tree: dict = {}
    convert_cross_block(
        tree, {k: v.numpy() for k, v in ref_blk.state_dict().items()}, "", "blk/"
    )
    params = tree["blk"]

    dcfg = ModelConfig.from_dict(dcfg_raw).dino.decoder_cfg
    blk = CrossBlock(16, dec["nhead"], dcfg, jnp.float32)

    g = torch.Generator().manual_seed(23)
    x = torch.randn(1, 64, 16, generator=g)
    y = torch.randn(1, 64, 16, generator=g)
    with torch.no_grad():
        want = ref_blk(x=x, key=y, value=y).numpy()
    got = np.asarray(
        blk.apply(
            {"params": params},
            jnp.asarray(x.numpy()),
            jnp.asarray(y.numpy()),
            jnp.asarray(y.numpy()),
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=0)
