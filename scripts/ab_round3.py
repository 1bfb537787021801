"""Interleaved same-process A/B of round-3 perf knobs.

Tunnel timing drifts by +-1-2 ms between runs, so config variants are
compiled side by side in one process and their timing loops alternate
(A,B,A,B,...); medians over reps cancel the drift.

Axes:
  - GFNET_ATTN_IMPL: oneshot | flash   (ViT + crossview attention kernel)
  - GFNET_REFINE_STACK: off | hidden   (fused Pallas hidden-block tail)

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/ab_round3.py
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def fetch_time(fn, pick, iters, rt):
    np.asarray(pick(fn(0)))
    t0 = time.perf_counter()
    for i in range(iters):
        np.asarray(pick(fn(i)))
    return max((time.perf_counter() - t0) / iters - rt, 0.0)


def roundtrip(iters=20):
    triv = jax.jit(lambda x, i: x.sum() + i)
    x = jnp.ones((8, 128))
    np.asarray(triv(x, 0))
    t0 = time.perf_counter()
    for i in range(iters):
        np.asarray(triv(x, i))
    return (time.perf_counter() - t0) / iters


def main():
    from gfnet_tpu.config import ModelConfig
    from gfnet_tpu.matcher.api import GFNetMatcher

    cfg = ModelConfig()
    rng = np.random.default_rng(0)
    iters = int(os.environ.get("AB_ITERS", "10"))
    reps = int(os.environ.get("AB_REPS", "5"))
    im_a = [
        jnp.asarray(rng.uniform(0, 1, (1, 448, 448, 3)).astype(np.float32))
        for _ in range(iters)
    ]
    im_b = jnp.asarray(rng.uniform(0, 1, (1, 448, 448, 3)).astype(np.float32))

    variants = [
        ("oneshot", "off"),
        ("oneshot", "hidden"),
        ("flash", "off"),
    ]
    base = None
    fns = {}
    for attn, refine in variants:
        os.environ["GFNET_ATTN_IMPL"] = attn
        os.environ["GFNET_REFINE_STACK"] = refine
        if base is None:
            m = GFNetMatcher(cfg)
            base = m
        else:
            m = GFNetMatcher(cfg, vit_params=base.vit_params, head_vars=base.head_vars)
        hv, vp = m.head_vars, m.vit_params
        print(f"compiling {attn}/{refine} ...", flush=True)
        p1 = m._pass1_jit(hv, vp, im_a[0], im_b)
        jax.block_until_ready(p1)
        out2 = m._pass2_jit(hv, vp, im_a[0], im_b, *p1)
        jax.block_until_ready(out2)
        fns[(attn, refine)] = (
            m,
            lambda i, m=m, hv=hv, vp=vp: m._pass1_jit(hv, vp, im_a[i], im_b),
            lambda i, m=m, hv=hv, vp=vp, p1=p1: m._pass2_jit(hv, vp, im_a[i], im_b, *p1),
        )

    rt = roundtrip()
    acc: dict = {k: {"p1": [], "p2": []} for k in variants}
    for rep in range(reps):
        for k in variants:
            _, f1, f2 = fns[k]
            acc[k]["p1"].append(fetch_time(f1, lambda o: o[0][0, 0, 0], iters, rt))
            acc[k]["p2"].append(fetch_time(f2, lambda o: o[0][0, 0, 0], iters, rt))
        print(f"rep {rep}: " + " | ".join(
            f"{a}/{r} p1={acc[(a, r)]['p1'][-1]*1e3:.2f} p2={acc[(a, r)]['p2'][-1]*1e3:.2f}"
            for a, r in variants
        ), flush=True)

    print(f"\n{'variant':<20} {'pass1 med ms':>12} {'pass2 med ms':>12}")
    for k in variants:
        p1m = float(np.median(acc[k]["p1"]) * 1e3)
        p2m = float(np.median(acc[k]["p2"]) * 1e3)
        print(f"{k[0] + '/' + k[1]:<20} {p1m:>12.2f} {p2m:>12.2f}")


if __name__ == "__main__":
    main()
