"""Headline benchmark: end-to-end matched pairs per second on one TPU chip.

Protocol mirrors the reference's runtime measurement (`estimation.py:56,78`):
wall-clock of match (448 pass + 560 upsample-refinement pass, symmetric) +
threshold-balanced sampling + robust homography solve, per image pair — but
fully on-device (no OpenCV host round trip).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "pairs/s", "vs_baseline": N}

vs_baseline compares against the first recorded run on this hardware
(bench_baseline.json, committed once measured) so the driver can track
speedups across rounds.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_baseline.json")


def main():
    import jax
    import jax.numpy as jnp

    from gfnet_tpu.config import ModelConfig
    from gfnet_tpu.matcher.api import GFNetMatcher

    cfg = ModelConfig()  # flagship basic config: 448 -> 560 two-pass, symmetric
    matcher = GFNetMatcher(cfg)

    rng = np.random.default_rng(0)
    im_a = jnp.asarray(rng.uniform(0, 1, (448, 448, 3)).astype(np.float32))
    im_b = jnp.asarray(rng.uniform(0, 1, (448, 448, 3)).astype(np.float32))

    def one_pair(key):
        H = matcher.estimate_homography(im_a, im_b, num_matches=5000, key=key)
        return H

    # Warmup / compile
    one_pair(jax.random.PRNGKey(0)).block_until_ready()

    iters = int(os.environ.get("BENCH_ITERS", "10"))
    t0 = time.perf_counter()
    for i in range(iters):
        H = one_pair(jax.random.PRNGKey(i))
    H.block_until_ready()
    dt = time.perf_counter() - t0
    pairs_per_s = iters / dt

    vs_baseline = 1.0
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            base = json.load(f).get("pairs_per_s")
        if base:
            vs_baseline = pairs_per_s / base

    print(
        json.dumps(
            {
                "metric": "e2e_match_sample_solve_448to560_sym",
                "value": round(pairs_per_s, 3),
                "unit": "pairs/s",
                "vs_baseline": round(vs_baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
