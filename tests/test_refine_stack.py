"""Parity tests for the fused Pallas refine-block stack (interpret mode).

Pins ops/pallas/refine_stack.py against the flax RefineBlock chain it
replaces at inference (`models/refiner.py`), at f32 (tight) and with the
bf16 inter-block storage the flagship config uses (tolerance-level).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from gfnet_tpu.models.refiner import ConvRefiner, RefineBlock, _HiddenScanBody
from gfnet_tpu.ops.pallas.refine_stack import fused_refine_stack


class _Tail(nn.Module):
    """The exact block1 + scanned-hidden + out_conv chain ConvRefiner builds,
    minus the feature/correlation front end (same submodule names)."""

    features: int
    blocks: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, d, train: bool = False):
        from gfnet_tpu.models.common import torch_uniform_init

        d = RefineBlock(self.features, 5, dtype=self.dtype, name="block1")(d, train)
        Scanned = nn.scan(
            _HiddenScanBody,
            variable_axes={"params": 0, "batch_stats": 0},
            split_rngs={"params": True},
            length=self.blocks,
            metadata_params={nn.meta.PARTITION_NAME: None},
        )
        d, _ = Scanned(self.features, 5, train, self.dtype, name="hidden")(d, None)
        out = nn.Conv(
            3, (1, 1), use_bias=True, kernel_init=torch_uniform_init(),
            dtype=jnp.float32, name="out_conv",
        )(d.astype(jnp.float32))
        return out[..., :2], out[..., 2:3]


def _make_vars(c, blocks, seed=0):
    m = _Tail(features=c, blocks=blocks)
    rng = np.random.default_rng(seed)
    x0 = jnp.asarray(rng.normal(0, 1, (1, 8, 8, c)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(seed), x0)
    # randomize BN stats so the folding is actually exercised
    stats = jax.tree.map(
        lambda a: jnp.asarray(
            rng.uniform(0.5, 1.5, a.shape).astype(np.float32)
        ),
        v["batch_stats"],
    )
    return m, {"params": v["params"], "batch_stats": stats}


@pytest.mark.parametrize("c,h,w", [(12, 16, 24), (24, 8, 40)])
def test_fused_stack_matches_flax_f32(c, h, w):
    blocks = 2
    m, v = _make_vars(c, blocks)
    rng = np.random.default_rng(1)
    d = jnp.asarray(rng.normal(0, 1, (2, h, w, c)).astype(np.float32))
    want_f, want_c = m.apply(v, d, train=False)
    got_f, got_c = fused_refine_stack(
        d, v["params"], v["batch_stats"], hidden_blocks=blocks,
        store_dtype=jnp.float32, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got_f), np.asarray(want_f),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c),
                               rtol=1e-4, atol=1e-5)


def test_fused_stack_bf16_close_to_f32():
    c, blocks = 16, 2
    m, v = _make_vars(c, blocks, seed=2)
    rng = np.random.default_rng(3)
    d = jnp.asarray(rng.normal(0, 1, (1, 16, 16, c)).astype(np.float32))
    want_f, want_c = m.apply(v, d, train=False)
    got_f, got_c = fused_refine_stack(
        d, v["params"], v["batch_stats"], hidden_blocks=blocks,
        store_dtype=jnp.bfloat16, interpret=True,
    )
    scale = float(jnp.max(jnp.abs(want_f)))
    assert float(jnp.max(jnp.abs(got_f - want_f))) < 0.05 * scale + 1e-3
    cscale = float(jnp.max(jnp.abs(want_c)))
    assert float(jnp.max(jnp.abs(got_c - want_c))) < 0.05 * cscale + 1e-3


def test_fused_stack_hidden_only_matches_flax():
    """include_block1=False: input is block1's output; the kernel runs only
    the hidden blocks + out_conv (the in-context default dispatch)."""
    c, blocks = 12, 2
    m, v = _make_vars(c, blocks, seed=4)
    rng = np.random.default_rng(5)
    d = jnp.asarray(rng.normal(0, 1, (2, 16, 24, c)).astype(np.float32))
    want_f, want_c = m.apply(v, d, train=False)
    # run block1 via flax, then the fused hidden tail
    b1 = RefineBlock(c, 5, dtype=jnp.float32)
    d1 = b1.apply(
        {"params": v["params"]["block1"], "batch_stats": v["batch_stats"]["block1"]},
        d, False,
    )
    got_f, got_c = fused_refine_stack(
        d1, v["params"], v["batch_stats"], hidden_blocks=blocks,
        store_dtype=jnp.float32, include_block1=False, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got_f), np.asarray(want_f),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c),
                               rtol=1e-4, atol=1e-5)


def test_refiner_dispatch_off_on_cpu():
    r = ConvRefiner(hidden_dim=16, displacement_dim=8, radius=0)
    assert r._fused_mode((1, 16, 16, 16), train=False) == "off"
    assert r._fused_mode((1, 16, 16, 16), train=True) == "off"
