"""Micro-bench the pieces of the refiner4_560@80 outlier (48ms isolated).

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_refiner4.py
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


def main():
    from gfnet_tpu.ops.local_correlation import local_correlation
    from gfnet_tpu.ops.sampler import grid_sample
    from gfnet_tpu.ops.resize import interpolate

    rng = np.random.default_rng(0)
    res = {}

    for tag, g, hw in (("448@64", 64, 112), ("560@80", 80, 140)):
        q = jnp.asarray(rng.normal(0, 1, (2, g, g, 32)).astype(np.float32))
        t = jnp.asarray(rng.normal(0, 1, (2, hw, hw, 32)).astype(np.float32))
        f = jnp.asarray(rng.uniform(-1, 1, (2, g, g, 2)).astype(np.float32))

        lc_patch = jax.jit(partial(local_correlation, radius=4, impl="patch"))
        res[f"lc_patch_{tag}"] = timed(lambda: lc_patch(q, t, f))
        lc_pallas = jax.jit(partial(local_correlation, radius=4, impl="pallas"))
        try:
            res[f"lc_pallas_{tag}"] = timed(lambda: lc_pallas(q, t, f))
        except Exception as e:  # VMEM limits on some shapes
            print(f"pallas {tag} failed: {type(e).__name__}")
        gs = jax.jit(grid_sample)
        res[f"grid_sample_{tag}"] = timed(lambda: gs(t.astype(jnp.bfloat16), f))
        it = jax.jit(lambda x, g=g: interpolate(x, (g, g), "bilinear", False))
        res[f"interp_{tag}"] = timed(lambda: it(t.astype(jnp.bfloat16)))

        # 9-block depthwise+pointwise stack at hidden 177
        x0 = jnp.asarray(rng.normal(0, 1, (2, g, g, 177)).astype(np.float32)).astype(jnp.bfloat16)
        wdw = jnp.asarray(rng.normal(0, 0.05, (5, 5, 1, 177)).astype(np.float32)).astype(jnp.bfloat16)
        wpw = jnp.asarray(rng.normal(0, 0.05, (177, 177)).astype(np.float32)).astype(jnp.bfloat16)

        @jax.jit
        def stack(x):
            for _ in range(9):
                y = jax.lax.conv_general_dilated(
                    x, wdw, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    feature_group_count=177,
                )
                x = jax.nn.relu(y) @ wpw
            return x

        res[f"convstack_{tag}"] = timed(lambda: stack(x0))

    print(f"{'piece':<20} {'ms':>8}")
    for k, v in res.items():
        print(f"{k:<20} {v * 1e3:>8.2f}")


if __name__ == "__main__":
    main()
