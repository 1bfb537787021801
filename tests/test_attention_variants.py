"""Attention/FFN variant tests (the reference's config-selectable zoo)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gfnet_tpu.config import DecoderConfig
from gfnet_tpu.models.crossview import CrossBlock
from gfnet_tpu.ops.attention import (
    entropy_invariant_scale,
    linear_attention,
    scaled_dot_product_attention,
)


def test_entropy_invariant_scale_at_train_length_is_default():
    s = entropy_invariant_scale(64, 1024, 1024)
    assert s == pytest.approx(64**-0.5)
    s2 = entropy_invariant_scale(64, 1600, 1024)
    assert s2 == pytest.approx(64**-0.5 * np.log(1600) / np.log(1024))


def test_sdpa_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    q = rng.standard_normal((2, 10, 4, 8)).astype(np.float32)
    k = rng.standard_normal((2, 12, 4, 8)).astype(np.float32)
    v = rng.standard_normal((2, 12, 4, 8)).astype(np.float32)
    ours = scaled_dot_product_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), 0.3)
    ref = F.scaled_dot_product_attention(
        torch.from_numpy(q).permute(0, 2, 1, 3),
        torch.from_numpy(k).permute(0, 2, 1, 3),
        torch.from_numpy(v).permute(0, 2, 1, 3),
        scale=0.3,
    ).permute(0, 2, 1, 3).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)


def test_linear_attention_matches_reference_math():
    """Independent check of the elu+1 kernelized attention
    (ref `attention.py:261-291`)."""
    rng = np.random.default_rng(1)
    q = rng.standard_normal((1, 6, 2, 4)).astype(np.float32)
    k = rng.standard_normal((1, 6, 2, 4)).astype(np.float32)
    v = rng.standard_normal((1, 6, 2, 4)).astype(np.float32)
    out = np.asarray(linear_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))

    def phi(x):
        return np.where(x > 0, x + 1, np.exp(x))

    qp, kp = phi(q), phi(k)
    exp = np.zeros_like(v)
    for h in range(2):
        num = qp[0, :, h] @ (kp[0, :, h].T @ v[0, :, h])  # (N, D)
        den = qp[0, :, h] @ kp[0, :, h].sum(0) + 1e-6  # (N,)
        exp[0, :, h] = num / den[:, None]
    np.testing.assert_allclose(out, exp, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("attention_type,ffn_type", [("Linear", "ffn"), ("FLASH2", "glu")])
def test_crossblock_variants_run(attention_type, ffn_type):
    cfg = DecoderConfig(attention_type=attention_type, ffn_type=ffn_type, train_avg_length=64)
    blk = CrossBlock(dim=16, num_heads=2, cfg=cfg, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 16))
    y = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 16))
    params = blk.init(jax.random.PRNGKey(2), x, y, y)
    out = blk.apply(params, x, y, y)
    assert out.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(out)))
    if ffn_type == "glu":
        assert "mlp_w12" in params["params"]
