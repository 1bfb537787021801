"""A/B: old 4-dispatch single-pair path vs batched 3-dispatch path, both with
forced host fetch of the final H so the timing cannot be fooled by a lazy
block_until_ready through the remote tunnel."""

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
    ia1 = jnp.asarray(rng.uniform(0, 1, (448, 448, 3)).astype(np.float32))
    ib1 = jnp.asarray(rng.uniform(0, 1, (448, 448, 3)).astype(np.float32))

    # old path (4 dispatches/pair)
    H = matcher.estimate_homography(ia1, ib1, key=jax.random.PRNGKey(0))
    np.asarray(H)
    iters = 20
    t0 = time.perf_counter()
    for i in range(iters):
        H = matcher.estimate_homography(ia1, ib1, key=jax.random.PRNGKey(i))
    np.asarray(H)
    dt = time.perf_counter() - t0
    print(f"single 4-dispatch: {iters / dt:6.2f} pairs/s ({1e3 * dt / iters:7.1f} ms/pair)")

    # batched path at B=1 (3 dispatches/pair)
    Hs = matcher.estimate_homography_batched(ia1, ib1, key=jax.random.PRNGKey(0))
    np.asarray(Hs)
    t0 = time.perf_counter()
    for i in range(iters):
        Hs = matcher.estimate_homography_batched(ia1, ib1, key=jax.random.PRNGKey(i))
    np.asarray(Hs)
    dt = time.perf_counter() - t0
    print(f"batched B=1      : {iters / dt:6.2f} pairs/s ({1e3 * dt / iters:7.1f} ms/pair)")


if __name__ == "__main__":
    main()
