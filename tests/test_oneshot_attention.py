"""Golden tests for the one-shot Pallas attention kernel (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gfnet_tpu.ops.attention import scaled_dot_product_attention
from gfnet_tpu.ops.pallas.oneshot_attention import oneshot_attention


# blk=None exercises the whole-row default; explicit blk covers the q-tiling
# path, including partial final blocks (130 % 64 != 0 → pad rows sliced off).
@pytest.mark.parametrize("n,blk", [(1025, None), (1025, 512), (256, 512),
                                   (130, 64), (130, None)])
def test_oneshot_matches_sdpa_f32(n, blk):
    rng = np.random.default_rng(0)
    b, h, d = 2, 3, 64
    q = jnp.asarray(rng.normal(0, 1, (b, n, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 1, (b, n, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 1, (b, n, h, d)).astype(np.float32))
    want = scaled_dot_product_attention(q, k, v)
    got = oneshot_attention(q, k, v, block_q=blk, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_oneshot_custom_vjp_grad_matches_sdpa(monkeypatch):
    """The cross-view decoder trains through _oneshot_sdpa_grad's custom VJP
    (Pallas forward, einsum backward); CPU CI can't reach it via
    fused_attention (einsum fallback off-TPU), so check the wiring here with
    the kernel in interpret mode."""
    import functools

    from gfnet_tpu.ops import attention as attn_mod
    from gfnet_tpu.ops.pallas import oneshot_attention as oneshot_mod

    monkeypatch.setattr(
        oneshot_mod, "oneshot_attention",
        functools.partial(oneshot_attention, interpret=True),
    )
    rng = np.random.default_rng(3)
    b, n, h, d = 1, 96, 2, 64
    q = jnp.asarray(rng.normal(0, 1, (b, n, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 1, (b, n, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 1, (b, n, h, d)).astype(np.float32))
    scale = 0.17

    loss_fused = lambda q_, k_, v_: jnp.sum(
        jnp.sin(attn_mod._oneshot_sdpa_grad(q_, k_, v_, scale))
    )
    loss_ref = lambda q_, k_, v_: jnp.sum(
        jnp.sin(scaled_dot_product_attention(q_, k_, v_, scale))
    )
    got = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-4, atol=2e-5)


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


def test_layouts_agree():
    """bnhd (grid-indexed heads, no relayout) == fold (explicit moveaxis)."""
    import numpy as np

    from gfnet_tpu.ops.pallas.oneshot_attention import oneshot_attention

    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.normal(size=(2, 70, 3, 64)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 50, 3, 64)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 50, 3, 64)).astype(np.float32))
    a = oneshot_attention(q, k, v, interpret=True, layout="bnhd")
    b = oneshot_attention(q, k, v, interpret=True, layout="fold")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
