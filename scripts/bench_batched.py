"""Throughput experiment: B pairs per jit call vs 1.

If the per-pair wall time drops ~linearly with B, the e2e path is dominated
by per-call dispatch overhead (remote tunnel RTT), not device compute, and
the serving-shaped fix is batched matching.

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_batched.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from gfnet_tpu.config import ModelConfig
    from gfnet_tpu.matcher.api import GFNetMatcher

    cfg = ModelConfig()
    matcher = GFNetMatcher(cfg)
    rng = np.random.default_rng(0)

    for B in (1, 8):
        im_a = jnp.asarray(rng.uniform(0, 1, (B, 448, 448, 3)).astype(np.float32))
        im_b = jnp.asarray(rng.uniform(0, 1, (B, 448, 448, 3)).astype(np.float32))

        Hs = matcher.estimate_homography_batched(im_a, im_b, key=jax.random.PRNGKey(0))
        jax.block_until_ready(Hs)
        iters = max(40 // B, 4)
        t0 = time.perf_counter()
        for i in range(iters):
            Hs = matcher.estimate_homography_batched(im_a, im_b, key=jax.random.PRNGKey(i))
        jax.block_until_ready(Hs)
        np.asarray(Hs)  # force full host sync through the tunnel
        dt = time.perf_counter() - t0
        print(f"B={B}: {iters * B / dt:8.2f} pairs/s  ({1e3 * dt / (iters * B):7.2f} ms/pair)")


if __name__ == "__main__":
    main()
