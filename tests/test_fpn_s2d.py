"""Phase-packed FPN encoder == plain encoder (exact math, packed layout).

Covers ops/s2d.py's generalized dense-kernel expansion (4x4 and 2x2 phases,
stride-2 transitions) through the real FPNEncoder, plus the end-to-end model
gate (GFNET_FPN_S2D) and gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gfnet_tpu.models.fpn import FPNEncoder
from gfnet_tpu.ops.s2d import depth_to_space_n, expand_dense_kernel, space_to_depth_n


def test_s2d_n_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 16, 24, 5)).astype(np.float32))
    for p in (2, 4):
        y = space_to_depth_n(x, p)
        assert y.shape == (2, 16 // p, 24 // p, p * p * 5)
        np.testing.assert_array_equal(np.asarray(depth_to_space_n(y, p)), np.asarray(x))


@pytest.mark.parametrize(
    "k,p_in,p_out,stride,i,o",
    [(7, 4, 4, 1, 3, 8), (5, 4, 4, 1, 8, 8), (5, 4, 2, 2, 8, 16),
     (3, 2, 2, 1, 16, 16), (5, 2, 1, 2, 16, 32)],
)
def test_expand_dense_kernel_matches_conv(k, p_in, p_out, stride, i, o):
    """Every (kernel, packing, stride) combination the FPN front-end uses,
    vs the plain conv with torch-style symmetric K//2 padding."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, i)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(k, k, i, o)).astype(np.float32))

    def conv(xx, ww, s, pad):
        return jax.lax.conv_general_dilated(
            xx, ww, (s, s), [(pad, pad)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    want = conv(x, w, stride, k // 2)
    got = conv(space_to_depth_n(x, p_in), expand_dense_kernel(w, p_in, p_out, stride), 1, 1)
    if p_out > 1:
        got = depth_to_space_n(got, p_out)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


@pytest.fixture(scope="module")
def encoder():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    m = FPNEncoder(feat_chs=(8, 16, 32, 64), dtype=jnp.float32)
    vars_ = m.init(jax.random.PRNGKey(0), x)
    # non-trivial running stats so the eval path is meaningfully tested
    vars_ = {
        "params": vars_["params"],
        "batch_stats": jax.tree_util.tree_map(
            lambda v: jnp.asarray(
                np.random.default_rng(3).uniform(0.5, 1.5, v.shape).astype(np.float32)
            ),
            vars_["batch_stats"],
        ),
    }
    return m, vars_, x


def _unpack_outputs(outs):
    """s2d encoder keeps conv01 4x4-packed (its only consumer runs packed)."""
    return [depth_to_space_n(outs[0], 4)] + list(outs[1:])


def test_fpn_encoder_s2d_matches_plain_eval(encoder):
    m, vars_, x = encoder
    want = m.apply(vars_, x)
    got = _unpack_outputs(m.apply(vars_, x, s2d=True))
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_fpn_encoder_s2d_matches_plain_train(encoder):
    m, vars_, x = encoder
    want, mut_p = m.apply(vars_, x, True, mutable=["batch_stats"])
    got, mut_s = m.apply(vars_, x, True, s2d=True, mutable=["batch_stats"])
    got = _unpack_outputs(got)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4
        ),
        mut_p, mut_s,
    )


def test_fpn_encoder_s2d_grads_match(encoder):
    m, vars_, x = encoder

    def loss(params, s2d):
        outs, _ = m.apply(
            {"params": params, "batch_stats": vars_["batch_stats"]},
            x, True, s2d=s2d, mutable=["batch_stats"],
        )
        return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in outs)

    g_p = jax.grad(lambda p: loss(p, False))(vars_["params"])
    g_s = jax.grad(lambda p: loss(p, True))(vars_["params"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3, rtol=1e-3
        ),
        g_p, g_s,
    )


def test_fpn_decoder_s2d_matches_plain(encoder):
    """Packed decoder full-res stage (4x4 conv01 input, packed upsample/
    concat/inner3/residual/out3) == plain decoder."""
    from gfnet_tpu.models.fpn import FPNDecoder
    from gfnet_tpu.ops.s2d import space_to_depth_n

    m, vars_, x = encoder
    conv01, conv11, conv21, conv31 = m.apply(vars_, x)
    dec = FPNDecoder(feat_chs=(8, 16, 32, 64), dtype=jnp.float32)
    dvars = dec.init(jax.random.PRNGKey(5), conv01, conv11, conv21, conv31)
    want = dec.apply(dvars, conv01, conv11, conv21, conv31)
    got = dec.apply(dvars, space_to_depth_n(conv01, 4), conv11, conv21, conv31,
                    s2d=True)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_full_model_fpn_s2d_gate(monkeypatch):
    """GFNET_FPN_S2D=1 through the whole tiny matcher == default path."""
    from gfnet_tpu.config import tiny_test_config
    from gfnet_tpu.matcher.api import GFNetMatcher

    cfg = tiny_test_config()
    rng = np.random.default_rng(4)
    im_a = rng.uniform(0, 1, (112, 112, 3)).astype(np.float32)
    im_b = rng.uniform(0, 1, (112, 112, 3)).astype(np.float32)

    monkeypatch.setenv("GFNET_FPN_S2D", "0")
    matcher = GFNetMatcher(cfg, dtype=jnp.float32)
    warp0, cert0 = matcher.match(im_a, im_b)

    monkeypatch.setenv("GFNET_FPN_S2D", "1")
    matcher2 = GFNetMatcher(
        cfg, vit_params=matcher.vit_params, head_vars=matcher.head_vars,
        dtype=jnp.float32,
    )
    warp1, cert1 = matcher2.match(im_a, im_b)
    np.testing.assert_allclose(np.asarray(warp1), np.asarray(warp0), atol=1e-4)
    np.testing.assert_allclose(np.asarray(cert1), np.asarray(cert0), atol=1e-3)
