"""End-to-end learnability: train on synthetic homographies → benchmark MACE.

The missing train→eval evidence from VERDICT r1 item 3: a short training run
on textured synthetic pairs (exact GT homographies) must move the full
match→sample→solve benchmark far off the random-weight ~70px-cap baseline
(oracle refs: pck telemetry `losses/robust_loss.py:72-75`, benchmark
`train.py:142` / `estimation.py:79-92`).

Uses a hotter LR than the reference's (which is tuned for a 250k-step
budget). scripts/learnability_e2e.py runs the longer version whose numbers
are recorded in BASELINE.md.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gfnet_tpu.config import TrainConfig, tiny_test_config
from gfnet_tpu.eval.synthetic import benchmark_mace, eval_pairs, train_batch
from gfnet_tpu.matcher.api import GFNetMatcher
from gfnet_tpu.train.loss import RobustLoss
from gfnet_tpu.train.state import create_train_state
from gfnet_tpu.train.step import make_train_step


@pytest.mark.slow
def test_short_training_run_beats_random_baseline():
    cfg = tiny_test_config()
    res = cfg.initial_res[0]
    matcher = GFNetMatcher(cfg, seed=0, dtype=jnp.float32)

    bench = eval_pairs(6, res, deformation_ratio=0.15)
    mace0, _ = benchmark_mace(matcher, bench, num_matches=1000)
    assert mace0 > 40.0, f"random weights should be near the cap, got {mace0}"

    tcfg = TrainConfig(grad_clip_norm=1.0, lr_per_sample=4e-4)
    loss = RobustLoss(im_size=res)
    step = make_train_step(matcher, loss, mesh=None)
    head_vars = jax.tree_util.tree_map(jnp.array, matcher.head_vars)
    state = create_train_state(head_vars, tcfg, global_batch=8)
    rng = np.random.default_rng(1)

    first_loss = last_loss = None
    pck16 = 0.0
    for i in range(70):
        batch = train_batch(rng, 8, res, deformation_ratio=0.15)
        state, metrics = step(state, matcher.vit_params, batch)
        if first_loss is None:
            first_loss = float(metrics["total_loss"])
        last_loss = float(metrics["total_loss"])
        pck16 = max(pck16, float(metrics["train_pck_05_scale_16"]))

    assert last_loss < 0.85 * first_loss, (first_loss, last_loss)
    assert pck16 > 0.2, pck16  # coarse flow is genuinely learning

    matcher.head_vars = {"params": state.params, "batch_stats": state.batch_stats}
    mace1, _ = benchmark_mace(matcher, bench, num_matches=1000)
    # 70 steps: expect a decisive drop off the cap (150 steps measure ~31px,
    # 500 steps lower still — scripts/learnability_e2e.py)
    assert mace1 < mace0 - 10.0, (mace0, mace1)
