"""Depthwise 5x5 conv lowering variants at the refiner's fine-scale shapes.

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_dwconv.py
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


def dw_conv(x, w, k):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
    )


def dw_shift(x, w, k):
    """Depthwise conv as K^2 pad-slice multiply-accumulates (pure VPU)."""
    p = k // 2
    b, h, ww, c = x.shape
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    out = jnp.zeros_like(x)
    for dy in range(k):
        for dx in range(k):
            out = out + xp[:, dy : dy + h, dx : dx + ww, :] * w[dy, dx, 0, :]
    return out


def main():
    rng = np.random.default_rng(0)
    for tag, hw, c in (("ref1@320", 320, 24), ("ref2@160", 160, 73), ("ref4@80", 80, 177)):
        x = jnp.asarray(rng.normal(0, 1, (2, hw, hw, c)).astype(np.float32)).astype(jnp.bfloat16)
        w = jnp.asarray(rng.normal(0, 0.05, (5, 5, 1, c)).astype(np.float32)).astype(jnp.bfloat16)
        fa = jax.jit(partial(dw_conv, k=5))
        fb = jax.jit(partial(dw_shift, k=5))
        ta = timed(lambda: fa(x, w))
        tb = timed(lambda: fb(x, w))
        d = float(jnp.max(jnp.abs(fa(x, w).astype(jnp.float32) - fb(x, w).astype(jnp.float32))))
        print(f"{tag:<10} conv {ta*1e3:7.2f} ms   shift {tb*1e3:7.2f} ms   maxdiff {d:.4f}", flush=True)

        # 9-block stack comparison (dw+relu+pw), both lowerings
        wpw = jnp.asarray(rng.normal(0, 0.05, (c, c)).astype(np.float32)).astype(jnp.bfloat16)

        def stack(dw_impl, x0):
            y = x0
            for _ in range(9):
                y = jax.nn.relu(dw_impl(y, w, 5)) @ wpw
            return y

        sa = jax.jit(partial(stack, dw_conv))
        sb = jax.jit(partial(stack, dw_shift))
        print(
            f"{tag:<10} stack9 conv {timed(lambda: sa(x))*1e3:7.2f} ms   "
            f"stack9 shift {timed(lambda: sb(x))*1e3:7.2f} ms", flush=True,
        )


if __name__ == "__main__":
    main()
