"""Per-stage timing of the e2e match+sample+solve path on device.

block_until_ready through the axon tunnel does not reliably wait, so each
timing loop dispatches K iterations and then FETCHES a tiny reduction of the
last output to the host — total wall / K is an upper bound of per-iteration
device time (dispatches pipeline; the fetch adds one RTT amortized over K).

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_e2e.py
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def fetch(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(jnp.sum(leaf))


def timed(fn, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn()
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    fetch(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", type=str, default=None)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    from gfnet_tpu.config import ModelConfig
    from gfnet_tpu.matcher.api import GFNetMatcher
    from gfnet_tpu.core.geometry import denormalize_corner_aligned
    from gfnet_tpu.core.homography import ransac_homography

    cfg = ModelConfig()
    matcher = GFNetMatcher(cfg)
    rng = np.random.default_rng(0)
    im_a = jnp.asarray(rng.uniform(0, 1, (1, 448, 448, 3)).astype(np.float32))
    im_b = jnp.asarray(rng.uniform(0, 1, (1, 448, 448, 3)).astype(np.float32))

    hv, vp = matcher.head_vars, matcher.vit_params

    # sub-stage: frozen ViT alone at both resolutions (2 stacked views)
    x448 = jnp.concatenate([im_a, im_b], axis=0)
    from gfnet_tpu.ops.resize import interpolate

    x560 = interpolate(x448, (560, 560), "bicubic", False)
    vit_fn = jax.jit(lambda p, x: matcher.vit.apply(p, x))
    vit448 = lambda: vit_fn(vp, x448)
    vit560 = lambda: vit_fn(vp, x560)

    p1 = lambda: matcher._pass1_jit(hv, vp, im_a, im_b)
    pre_flow, pre_cert, low = p1()
    p2 = lambda: matcher._pass2_jit(hv, vp, im_a, im_b, pre_flow, pre_cert, low)
    warp, certainty = p2()
    m = warp.reshape(-1, 4)
    c = certainty.reshape(-1)
    key = jax.random.PRNGKey(0)
    samp = lambda: matcher._sample_jit(m, c, 5000, key)
    matches, _ = samp()
    pa = denormalize_corner_aligned(matches[:, :2], 448, 448)
    pb = denormalize_corner_aligned(matches[:, 2:], 448, 448)
    solve = lambda: ransac_homography(pa, pb, key=key)
    solve()

    stages = {
        "vit_448x2": vit448,
        "vit_560x2": vit560,
        "pass1_448": p1,
        "pass2_560": p2,
        "sample": samp,
        "solve": solve,
    }
    times = {k: timed(f, iters=args.iters) for k, f in stages.items()}
    e2e = times["pass1_448"] + times["pass2_560"] + times["sample"] + times["solve"]
    print(f"{'stage':<12} {'ms':>8}")
    for k, v in times.items():
        print(f"{k:<12} {v * 1e3:>8.2f}")
    print(f"{'E2E':<12} {e2e * 1e3:>8.2f}  -> {1 / e2e:.2f} pairs/s")
    print(f"head448 ~= {1e3 * (times['pass1_448'] - times['vit_448x2']):.2f} ms, "
          f"head560 ~= {1e3 * (times['pass2_560'] - times['vit_560x2']):.2f} ms")

    if args.trace:
        with jax.profiler.trace(args.trace):
            f, ce = matcher._pass2_jit(hv, vp, im_a, im_b, *matcher._pass1_jit(hv, vp, im_a, im_b))
            fetch(matcher._sample_jit(f.reshape(-1, 4), ce.reshape(-1), 5000, key))
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
