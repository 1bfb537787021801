"""Pin the documented flagship training recipe against silent regressions.

The flagship cross-view decoder feeds un-normalized k/v into attention (ref
`block.py:322-328`); at too-hot settings its gradients intermittently explode
(1e3-1e10 spikes, diagnosed commit 2903bb5). The stable recipe is
lr 1.25e-4/sample + clip 0.1 in bf16 (BASELINE.md). This proxy runs the SAME
code paths (bf16 compute, remat'd scan stacks, s2d refiners where grids
allow, cross-view attention custom-VJP fallback) on the tiny architecture and
asserts training stays in the healthy regime — a remat/scan/kernel reordering
that reintroduces the explosions fails here instead of silently on TPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gfnet_tpu.config import TrainConfig, tiny_test_config
from gfnet_tpu.eval.synthetic import train_batch
from gfnet_tpu.matcher.api import GFNetMatcher
from gfnet_tpu.train.loss import RobustLoss
from gfnet_tpu.train.state import create_train_state
from gfnet_tpu.train.step import make_train_step


@pytest.mark.slow
def test_flagship_recipe_proxy_stays_stable_bf16():
    cfg = tiny_test_config()
    res = cfg.initial_res[0]
    # bf16 like the flagship run; the tiny architecture shares the cross-view
    # decoder structure whose grads were the failure mode
    matcher = GFNetMatcher(cfg, seed=0, dtype=jnp.bfloat16)
    tcfg = TrainConfig(grad_clip_norm=0.1, lr_per_sample=1.25e-4)
    loss = RobustLoss(im_size=res)
    step = make_train_step(matcher, loss, mesh=None)
    head_vars = jax.tree_util.tree_map(jnp.array, matcher.head_vars)
    state = create_train_state(head_vars, tcfg, global_batch=8)
    rng = np.random.default_rng(2)

    norms, losses = [], []
    for i in range(40):
        batch = train_batch(rng, 8, res, deformation_ratio=0.3,
                            cross_modal_frac=0.25)
        state, metrics = step(state, matcher.vit_params, batch)
        assert int(metrics["nonfinite_grad_leaves"]) == 0, i
        norms.append(float(metrics["grad_norm"]))
        losses.append(float(metrics["total_loss"]))

    norms = np.asarray(norms)
    # healthy regime: no explosion spikes (diagnosed failures were 1e3-1e10)
    assert norms.max() < 200.0, norms.max()
    # and the step is actually learning, not just clipped into stasis
    assert np.mean(losses[-10:]) < np.mean(losses[:10]), (
        np.mean(losses[:10]), np.mean(losses[-10:])
    )


@pytest.mark.slow
def test_crossmodal_recipe_kv_norm_tames_crossview(monkeypatch):
    """Pin the r5 cross-modal recipe (workspace/eval_synth_r5.json): with
    GFNET_KV_NORM=1 the cross-view decoder trains UNFROZEN under appearance
    gaps — its raw grad norm stays in the same range as the other modules
    (without the flag it sat persistently above any sane clip, which is why
    r4 froze it and cross-modal matching never trained). Asserts the
    mechanism, not the 62→3 px benchmark number: crossview raw norms bounded
    and the step learning on a 50% cross-modal stream."""
    monkeypatch.setenv("GFNET_KV_NORM", "1")
    monkeypatch.setenv("GFNET_GRAD_BREAKDOWN", "1")
    cfg = tiny_test_config()
    res = cfg.initial_res[0]
    matcher = GFNetMatcher(cfg, seed=0, dtype=jnp.bfloat16)
    tcfg = TrainConfig(grad_clip_norm=0.1, lr_per_sample=1.25e-4)
    loss = RobustLoss(im_size=res)
    step = make_train_step(matcher, loss, mesh=None,
                           module_clip={"crossview": 0.5})
    head_vars = jax.tree_util.tree_map(jnp.array, matcher.head_vars)
    state = create_train_state(head_vars, tcfg, global_batch=8)
    rng = np.random.default_rng(5)

    raw, losses = [], []
    for i in range(30):
        batch = train_batch(rng, 8, res, deformation_ratio=0.3,
                            cross_modal_frac=0.5)
        state, metrics = step(state, matcher.vit_params, batch)
        assert int(metrics["nonfinite_grad_leaves"]) == 0, i
        raw.append(float(metrics["gnorm_raw/crossview"]))
        losses.append(float(metrics["total_loss"]))

    raw = np.asarray(raw)
    # no explosion regime: raw (pre-clip) crossview norms stay bounded
    assert raw.max() < 50.0, raw.max()
    # crossview actually receives gradient (not degenerate zeros)
    assert raw.max() > 1e-6
    assert np.mean(losses[-10:]) < np.mean(losses[:10]), (
        np.mean(losses[:10]), np.mean(losses[-10:])
    )
