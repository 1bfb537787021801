"""Time the flagship train step on the real chip, isolating round-4 suspects.

Round 3 measured 0.93 s/step (batch 8, bf16); the round-4 proxy run sees
~3.5 s/step marginal. Candidates that changed the TRAINING graph this round:
the space-to-depth refiner stack (aeef1ec, on in training too) and the
patch-slice grid_sample default (9356c28 — its lax.gather VJP is a
slice-scatter where the old packed form transposed to a take_along_axis
scatter). A/B via env:

    GFNET_S2D=0                 disable s2d stack
    GFNET_TRAIN_WARP=packed     pin the refiner warp lowering for training

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/ab_trainstep_r4.py
"""

from __future__ import annotations

import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gfnet_tpu.config import ModelConfig, TrainConfig
    from gfnet_tpu.matcher.api import GFNetMatcher
    from gfnet_tpu.eval.synthetic import train_batch
    from gfnet_tpu.train.loss import RobustLoss
    from gfnet_tpu.train.state import create_train_state
    from gfnet_tpu.train.step import make_train_step

    batch_n = int(os.environ.get("AB_BATCH", "8"))
    iters = int(os.environ.get("AB_ITERS", "8"))
    cfg = ModelConfig()
    m = GFNetMatcher(cfg, seed=0, dtype=jnp.bfloat16)
    step = make_train_step(m, RobustLoss(im_size=cfg.initial_res[0]), mesh=None,
                           freeze=("crossview",))
    state = create_train_state(m.head_vars, TrainConfig(), global_batch=batch_n)
    rng = np.random.default_rng(0)
    batches = [train_batch(rng, batch_n, cfg.initial_res[0], 0.3, 0.25,
                           uint8=os.environ.get("AB_UINT8") == "1")
               for _ in range(3)]

    t0 = time.perf_counter()
    state, metrics = step(state, m.vit_params, batches[0])
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s", flush=True)
    np.asarray(metrics["total_loss"])

    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step(state, m.vit_params, batches[i % len(batches)])
        np.asarray(metrics["total_loss"])  # force completion each step
    dt = (time.perf_counter() - t0) / iters
    print(
        {
            "s_per_step": round(dt, 3),
            "batch": batch_n,
            "pairs_per_s": round(batch_n / dt, 2),
            "s2d": os.environ.get("GFNET_S2D", "auto"),
            "train_warp": os.environ.get("GFNET_TRAIN_WARP", "auto"),
        },
        flush=True,
    )


if __name__ == "__main__":
    main()
