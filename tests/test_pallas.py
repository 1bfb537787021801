"""Pallas kernel golden tests (interpreter mode on the CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gfnet_tpu.ops.local_correlation import _local_correlation_gather
from gfnet_tpu.ops.pallas.local_corr import local_correlation_pallas


@pytest.mark.parametrize("radius,g,h,c", [(2, 8, 8, 8), (3, 8, 14, 16), (1, 4, 6, 8)])
def test_local_corr_pallas_matches_gather(radius, g, h, c):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((2, g, g, c)).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((2, h, h, c)).astype(np.float32))
    fl = jnp.asarray(rng.uniform(-1.3, 1.3, (2, g, g, 2)).astype(np.float32))
    ref = _local_correlation_gather(q, t, fl, radius)
    ours = local_correlation_pallas(q, t, fl, radius, True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_local_corr_pallas_far_out_of_range_is_zero():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((1, 4, 4, 8)).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((1, 8, 8, 8)).astype(np.float32))
    fl = jnp.full((1, 4, 4, 2), 5.0)  # everything far outside
    out = local_correlation_pallas(q, t, fl, 2, True)
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_local_corr_pallas_nonfinite_flow_is_zero():
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((1, 4, 4, 8)).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((1, 8, 8, 8)).astype(np.float32))
    fl = jnp.full((1, 4, 4, 2), jnp.nan)
    out = local_correlation_pallas(q, t, fl, 1, True)
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_local_corr_pallas_bf16_storage_lossless_on_bf16_inputs():
    """bf16 compute_dtype is exact when the features are bf16-representable
    (the flagship inference path: features are produced in bf16 upstream)."""
    rng = np.random.default_rng(4)
    radius, g, h, c = 2, 8, 12, 8
    q = jnp.asarray(rng.standard_normal((2, g, g, c)).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((2, h, h, c)).astype(np.float32))
    q = q.astype(jnp.bfloat16).astype(jnp.float32)
    t = t.astype(jnp.bfloat16).astype(jnp.float32)
    fl = jnp.asarray(rng.uniform(-1.2, 1.2, (2, g, g, 2)).astype(np.float32))
    ref = _local_correlation_gather(q, t, fl, radius)
    ours = local_correlation_pallas(q, t, fl, radius, True, jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_local_corr_pallas_grad_matches_gather_grad():
    rng = np.random.default_rng(3)
    radius, g, h, c = 2, 6, 10, 8
    q = jnp.asarray(rng.standard_normal((1, g, g, c)).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((1, h, h, c)).astype(np.float32))
    fl = jnp.asarray(rng.uniform(-1, 1, (1, g, g, 2)).astype(np.float32))

    def loss_pallas(qq):
        return jnp.sum(jnp.sin(local_correlation_pallas(qq, t, fl, radius, True)))

    def loss_gather(qq):
        # gather path lets grads flow through target too; isolate query grad
        return jnp.sum(jnp.sin(_local_correlation_gather(qq, jax.lax.stop_gradient(t),
                                                         jax.lax.stop_gradient(fl), radius)))

    gp = jax.grad(loss_pallas)(q)
    gg = jax.grad(loss_gather)(q)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gg), rtol=1e-4, atol=1e-4)
