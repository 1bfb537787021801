"""pallas vs patch local-correlation across every flagship refiner shape.

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_lc_all.py
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def fetch(out):
    return np.asarray(jnp.sum(jax.tree_util.tree_leaves(out)[0]))


def timed(fn, iters=20, warmup=2):
    for _ in range(warmup):
        out = fn()
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    fetch(out)
    return (time.perf_counter() - t0) / iters


# (scale, grid, target_hw, C, r) for 448-pass and 560-pass of the flagship
SHAPES = [
    ("16@448", 32, 32, 64, 7),
    ("8@448", 32, 56, 64, 6),
    ("4@448", 64, 112, 32, 4),
    ("2@448", 128, 224, 16, 2),
    ("8@560", 40, 70, 64, 6),
    ("4@560", 80, 140, 32, 4),
    ("2@560", 160, 280, 16, 2),
]


def main():
    from gfnet_tpu.ops.local_correlation import local_correlation

    rng = np.random.default_rng(0)
    print(f"{'shape':<10} {'patch ms':>9} {'pallas ms':>10}")
    for tag, g, hw, c, r in SHAPES:
        q = jnp.asarray(rng.normal(0, 1, (2, g, g, c)).astype(np.float32))
        t = jnp.asarray(rng.normal(0, 1, (2, hw, hw, c)).astype(np.float32))
        f = jnp.asarray(rng.uniform(-1, 1, (2, g, g, 2)).astype(np.float32))
        fp = jax.jit(partial(local_correlation, radius=r, impl="patch"))
        fl = jax.jit(partial(local_correlation, radius=r, impl="pallas"))
        tp = timed(lambda: fp(q, t, f))
        try:
            tl = timed(lambda: fl(q, t, f))
            print(f"{tag:<10} {tp * 1e3:>9.2f} {tl * 1e3:>10.2f}", flush=True)
        except Exception as e:
            print(f"{tag:<10} {tp * 1e3:>9.2f} {'FAIL: ' + type(e).__name__:>10}", flush=True)


if __name__ == "__main__":
    main()
