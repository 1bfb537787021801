"""Sub-op ablation of the fine-scale refiners (scale "1"/"2") and lowering
variants for their lane-starved conv stacks (C=24/73 << 128 lanes).

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_refiner1.py
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def fetch(out):
    return np.asarray(jnp.sum(jax.tree_util.tree_leaves(out)[0]))


def timed(fn, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn()
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    fetch(out)
    return (time.perf_counter() - t0) / iters


def stack_nhwc_shift(x, wdw, wpw, k=5):
    p = k // 2
    b, h, ww, c = x.shape
    y = x
    for i in range(wdw.shape[0]):
        xp = jnp.pad(y, ((0, 0), (p, p), (p, p), (0, 0)))
        acc = jnp.zeros_like(y)
        for dy in range(k):
            for dx in range(k):
                acc = acc + xp[:, dy : dy + h, dx : dx + ww, :] * wdw[i, dy, dx, :]
        y = jax.nn.relu(acc) @ wpw[i]
    return y


def stack_nhwc_conv(x, wdw, wpw, k=5):
    y = x
    c = x.shape[-1]
    for i in range(wdw.shape[0]):
        z = jax.lax.conv_general_dilated(
            y, wdw[i][..., None, :], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )
        y = jax.nn.relu(z) @ wpw[i]
    return y


def stack_nchw_shift(x, wdw, wpw, k=5):
    """Transpose to (B, C, H, W) so W rides the 128 lanes; dw = pad-slice MAC,
    pw = einsum over the now-major channel dim."""
    p = k // 2
    y = jnp.transpose(x, (0, 3, 1, 2))
    b, c, h, ww = y.shape
    for i in range(wdw.shape[0]):
        yp = jnp.pad(y, ((0, 0), (0, 0), (p, p), (p, p)))
        acc = jnp.zeros_like(y)
        for dy in range(k):
            for dx in range(k):
                acc = acc + yp[:, :, dy : dy + h, dx : dx + ww] * wdw[i, dy, dx, :, None, None]
        y = jnp.einsum("oc,bchw->bohw", wpw[i].T, jax.nn.relu(acc))
    return jnp.transpose(y, (0, 2, 3, 1))


def main():
    rng = np.random.default_rng(0)

    # ---- stack lowering shootout at fine-scale shapes ----
    for tag, hw, c in (("ref1@320", 320, 24), ("ref2@160", 160, 73), ("ref1@256", 256, 24), ("ref2@128", 128, 73)):
        x = jnp.asarray(rng.normal(0, 1, (2, hw, hw, c)).astype(np.float32)).astype(jnp.bfloat16)
        wdw = jnp.asarray(rng.normal(0, 0.05, (9, 5, 5, c)).astype(np.float32)).astype(jnp.bfloat16)
        wpw = jnp.asarray(rng.normal(0, 0.05, (9, c, c)).astype(np.float32)).astype(jnp.bfloat16)
        fns = {
            "conv": jax.jit(stack_nhwc_conv),
            "shift": jax.jit(stack_nhwc_shift),
            "nchw": jax.jit(stack_nchw_shift),
        }
        o = {k: f(x, wdw, wpw) for k, f in fns.items()}
        d1 = float(jnp.max(jnp.abs(o["conv"].astype(jnp.float32) - o["shift"].astype(jnp.float32))))
        d2 = float(jnp.max(jnp.abs(o["conv"].astype(jnp.float32) - o["nchw"].astype(jnp.float32))))
        row = "  ".join(f"{k} {timed(partial(f, x, wdw, wpw)) * 1e3:7.2f}ms" for k, f in fns.items())
        print(f"{tag:<10} {row}   maxdiff shift {d1:.4f} nchw {d2:.4f}", flush=True)

    # ---- in-situ refiner1/2 sub-op ablation (560-pass shapes) ----
    from gfnet_tpu.config import ModelConfig
    from gfnet_tpu.matcher.api import GFNetMatcher
    from gfnet_tpu.ops.resize import interpolate
    from gfnet_tpu.ops.sampler import grid_sample

    cfg = ModelConfig()
    matcher = GFNetMatcher(cfg)
    head, hv = matcher.head, matcher.head_vars

    for scale, cfeat, g, hw in (("1", 8, 320, 560), ("2", 16, 160, 560), ("1", 8, 256, 448), ("2", 16, 128, 448)):
        f0 = jnp.asarray(rng.normal(0, 1, (2, hw, hw, cfeat)).astype(np.float32)).astype(jnp.bfloat16)
        f1 = jnp.asarray(rng.normal(0, 1, (2, hw, hw, cfeat)).astype(np.float32)).astype(jnp.bfloat16)
        flow = jnp.asarray(rng.uniform(-1, 1, (2, g, g, 2)).astype(np.float32))

        def full(v, a, b_, fl, s=scale):
            return head.apply(v, a, b_, fl, method=lambda m, aa, bb, ff: m.refiners[s](aa, bb, ff))

        gs = jax.jit(lambda t, fl: grid_sample(t, fl))
        it = jax.jit(lambda q: interpolate(q, (g, g), "bilinear", False))
        print(
            f"refiner{scale}@{g} ({hw}): full {timed(partial(jax.jit(full), hv, f0, f1, flow))*1e3:7.2f}ms  "
            f"warp(grid_sample) {timed(partial(gs, f1, flow))*1e3:6.2f}ms  "
            f"resize {timed(partial(it, f0))*1e3:6.2f}ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
