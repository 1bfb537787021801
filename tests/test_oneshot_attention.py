"""Golden tests for the one-shot Pallas attention kernel (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gfnet_tpu.ops.attention import scaled_dot_product_attention
from gfnet_tpu.ops.pallas.oneshot_attention import oneshot_attention


@pytest.mark.parametrize("n,blk", [(1025, 512), (256, 512), (130, 64)])
def test_oneshot_matches_sdpa_f32(n, blk):
    rng = np.random.default_rng(0)
    b, h, d = 2, 3, 64
    q = jnp.asarray(rng.normal(0, 1, (b, n, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 1, (b, n, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 1, (b, n, h, d)).astype(np.float32))
    want = scaled_dot_product_attention(q, k, v)
    got = oneshot_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_oneshot_bf16_close():
    rng = np.random.default_rng(1)
    b, n, h, d = 1, 257, 2, 64
    mk = lambda: jnp.asarray(
        rng.normal(0, 1, (b, n, h, d)).astype(np.float32)
    ).astype(jnp.bfloat16)
    q, k, v = mk(), mk(), mk()
    want = scaled_dot_product_attention(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
    )
    got = oneshot_attention(q, k, v, interpret=True).astype(jnp.float32)
    assert got.dtype == jnp.float32
    err = float(jnp.max(jnp.abs(got - want)))
    assert err < 2e-2, err  # bf16 operand rounding only


def test_oneshot_custom_scale():
    rng = np.random.default_rng(2)
    b, n, h, d = 1, 64, 1, 64
    q = jnp.asarray(rng.normal(0, 1, (b, n, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 1, (b, n, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 1, (b, n, h, d)).astype(np.float32))
    want = scaled_dot_product_attention(q, k, v, scale=0.3)
    got = oneshot_attention(q, k, v, scale=0.3, block_q=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
