"""Space-to-depth refiner stack == plain stack (exact math, different order).

Covers the expanded-weight construction (depthwise 5x5 -> dense 3x3 on s2d
phases), phase-block-diagonal pointwise, PhaseBN phase-folded statistics, and
the full ConvRefiner forward + gradient in both modes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gfnet_tpu.models.refiner import (
    ConvRefiner,
    DepthwiseConv,
    PhaseBN,
    RefineBlock,
    depth_to_space,
    space_to_depth,
)


def test_s2d_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (2, 8, 12, 5)).astype(np.float32))
    y = space_to_depth(x)
    assert y.shape == (2, 4, 6, 20)
    np.testing.assert_array_equal(np.asarray(depth_to_space(y)), np.asarray(x))


@pytest.mark.parametrize("k", [5, 3])
def test_depthwise_s2d_matches_plain(k):
    rng = np.random.default_rng(1)
    c = 7
    x = jnp.asarray(rng.normal(0, 1, (2, 16, 16, c)).astype(np.float32))
    m = DepthwiseConv(c, k, dtype=jnp.float32)
    vars_ = m.init(jax.random.PRNGKey(0), x)
    want = m.apply(vars_, x)
    got = depth_to_space(m.apply(vars_, space_to_depth(x), s2d=True))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_refine_block_s2d_matches_plain_inference():
    rng = np.random.default_rng(2)
    c = 6
    x = jnp.asarray(rng.normal(0, 1, (2, 12, 12, c)).astype(np.float32))
    m = RefineBlock(c, 5, dtype=jnp.float32)
    vars_ = m.init(jax.random.PRNGKey(1), x)
    # non-trivial BN stats
    vars_ = {
        "params": vars_["params"],
        "batch_stats": {
            "bn": {
                "mean": jnp.asarray(rng.normal(0, 1, (c,)).astype(np.float32)),
                "var": jnp.asarray(rng.uniform(0.5, 2, (c,)).astype(np.float32)),
            }
        },
    }
    want = m.apply(vars_, x)
    got = depth_to_space(m.apply(vars_, space_to_depth(x), s2d=True))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_refine_block_s2d_matches_plain_training():
    """Train mode: batch stats computed on phase-folded channels must equal
    the plain per-channel stats, and updated running averages must agree."""
    rng = np.random.default_rng(3)
    c = 6
    x = jnp.asarray(rng.normal(0, 1, (2, 12, 12, c)).astype(np.float32))
    m = RefineBlock(c, 5, dtype=jnp.float32)
    vars_ = m.init(jax.random.PRNGKey(2), x)
    want, mut_p = m.apply(vars_, x, True, mutable=["batch_stats"])
    got, mut_s = m.apply(
        vars_, space_to_depth(x), True, s2d=True, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(
        np.asarray(depth_to_space(got)), np.asarray(want), atol=1e-5
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5),
        mut_p, mut_s,
    )


def test_phasebn_matches_flax_batchnorm():
    from flax import linen as nn

    rng = np.random.default_rng(4)
    c = 5
    x = jnp.asarray(rng.normal(0, 3, (3, 7, 7, c)).astype(np.float32))
    ref = nn.BatchNorm(use_running_average=False, momentum=0.99, epsilon=1e-5,
                       dtype=jnp.float32)
    mine = PhaseBN(c, momentum=0.99)
    vr = ref.init(jax.random.PRNGKey(0), x)
    y_ref, m_ref = ref.apply(vr, x, mutable=["batch_stats"])
    y_me, m_me = mine.apply(vr, x, True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_me), np.asarray(y_ref), atol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5),
        m_ref, m_me,
    )
    # eval mode
    ref_e = nn.BatchNorm(use_running_average=True, momentum=0.99, epsilon=1e-5,
                         dtype=jnp.float32)
    y_ref = ref_e.apply(vr, x)
    y_me = mine.apply(vr, x, False)
    np.testing.assert_allclose(np.asarray(y_me), np.asarray(y_ref), atol=1e-5)


def test_conv_refiner_s2d_matches_plain_forward_and_grad(monkeypatch):
    rng = np.random.default_rng(5)
    b, hw, g, c = 2, 32, 16, 8
    query = jnp.asarray(rng.normal(0, 1, (b, hw, hw, c)).astype(np.float32))
    target = jnp.asarray(rng.normal(0, 1, (b, hw, hw, c)).astype(np.float32))
    flow = jnp.asarray(rng.uniform(-0.9, 0.9, (b, g, g, 2)).astype(np.float32))
    m = ConvRefiner(hidden_dim=2 * c + 8 + 25, displacement_dim=8, radius=2,
                    dtype=jnp.float32)

    monkeypatch.setenv("GFNET_S2D", "0")
    vars_ = m.init(jax.random.PRNGKey(3), query, target, flow)
    df_p, dc_p = m.apply(vars_, query, target, flow)

    monkeypatch.setenv("GFNET_S2D", "1")
    df_s, dc_s = m.apply(vars_, query, target, flow)
    np.testing.assert_allclose(np.asarray(df_s), np.asarray(df_p), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dc_s), np.asarray(dc_p), atol=2e-4)

    def loss(params, s2d):
        monkeypatch.setenv("GFNET_S2D", "1" if s2d else "0")
        out, _ = m.apply(
            {"params": params, "batch_stats": vars_["batch_stats"]},
            query, target, flow, train=True, mutable=["batch_stats"],
        )
        return jnp.sum(out[0] ** 2) + jnp.sum(out[1] ** 2)

    g_p = jax.grad(loss)(vars_["params"], False)
    g_s = jax.grad(loss)(vars_["params"], True)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3, rtol=1e-3
        ),
        g_p, g_s,
    )


def test_conv_refiner_s2d_frontend_radius0_matches_plain(monkeypatch):
    """Radius-0 fine scales take the fully phase-packed front-end (warp /
    grid-resize / disp-emb built directly in s2d layout, models/refiner.py):
    forward and grads must match the unpacked path."""
    rng = np.random.default_rng(6)
    b, hw, g, c = 2, 36, 16, 8
    query = jnp.asarray(rng.normal(0, 1, (b, hw, hw, c)).astype(np.float32))
    target = jnp.asarray(rng.normal(0, 1, (b, hw, hw, c)).astype(np.float32))
    flow = jnp.asarray(rng.uniform(-0.9, 0.9, (b, g, g, 2)).astype(np.float32))
    m = ConvRefiner(hidden_dim=2 * c + 8, displacement_dim=8, radius=0,
                    dtype=jnp.float32)

    monkeypatch.setenv("GFNET_S2D", "0")
    vars_ = m.init(jax.random.PRNGKey(4), query, target, flow)
    df_p, dc_p = m.apply(vars_, query, target, flow)

    monkeypatch.setenv("GFNET_S2D", "1")
    df_s, dc_s = m.apply(vars_, query, target, flow)
    np.testing.assert_allclose(np.asarray(df_s), np.asarray(df_p), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dc_s), np.asarray(dc_p), atol=2e-4)

    def loss(params, s2d):
        monkeypatch.setenv("GFNET_S2D", "1" if s2d else "0")
        out, _ = m.apply(
            {"params": params, "batch_stats": vars_["batch_stats"]},
            query, target, flow, train=True, mutable=["batch_stats"],
        )
        return jnp.sum(out[0] ** 2) + jnp.sum(out[1] ** 2)

    g_p = jax.grad(loss)(vars_["params"], False)
    g_s = jax.grad(loss)(vars_["params"], True)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3, rtol=1e-3
        ),
        g_p, g_s,
    )
