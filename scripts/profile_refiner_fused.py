"""A/B the fused Pallas refine stack vs the flax path on the real TPU.

Times each per-scale refiner at the flagship e2e shapes (fetch-forced like
profile_head.py), with GFNET_FUSED_REFINER toggled per trace.

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_refiner_fused.py
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def fetch(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(jnp.sum(leaf))


_ROUNDTRIP = None


def measure_roundtrip(iters: int = 20) -> float:
    global _ROUNDTRIP
    if _ROUNDTRIP is None:
        triv = jax.jit(lambda x, i: x.sum() + i)
        x = jnp.ones((8, 128))
        np.asarray(triv(x, 0))
        t0 = time.perf_counter()
        for i in range(iters):
            np.asarray(triv(x, i))
        _ROUNDTRIP = (time.perf_counter() - t0) / iters
    return _ROUNDTRIP


def timed(fn, variants, iters=10):
    """Tunnel-safe: distinct input per iteration (defeats the remote result
    cache) + per-iteration fetch (completion proof) minus fetch roundtrip."""
    rt = measure_roundtrip()
    fetch(fn(variants[0]))  # warm/compile
    t0 = time.perf_counter()
    for i in range(iters):
        fetch(fn(variants[i % len(variants)]))
    return max((time.perf_counter() - t0) / iters - rt, 0.0)


def main():
    from gfnet_tpu.config import ModelConfig
    from gfnet_tpu.matcher.api import GFNetMatcher

    cfg = ModelConfig()
    matcher = GFNetMatcher(cfg)
    head, hv = matcher.head, matcher.head_vars
    rng = np.random.default_rng(0)

    results = {}
    for name, (h, w), grids in (
        ("448", (448, 448), (32, 32, 64, 128, 256)),
        ("560", (560, 560), (40, 40, 80, 160, 320)),
    ):
        x = jnp.asarray(rng.uniform(0, 1, (2, h, w, 3)).astype(np.float32))
        gh = gw = h // 14
        tokens = jnp.asarray(
            rng.normal(0, 1, (2, gh * gw, cfg.dino.d_model)).astype(np.float32)
        )
        feats = jax.jit(
            lambda v, xx, t: head.apply(
                v, xx, t, (gh, gw), False, False,
                method=lambda m, a, b_, g, u, tr: m.extract_features(a, b_, g, u, tr),
            )
        )
        f0d, f1d = feats(hv, x, tokens)
        fd = dict(zip(("16", "8", "4", "2", "1"), grids))
        for scale, g in fd.items():
            f0 = jnp.concatenate([f0d[scale], f1d[scale]], 0)
            f1 = jnp.concatenate([f1d[scale], f0d[scale]], 0)
            flows = [
                jnp.asarray(rng.uniform(-0.9, 0.9, (2, g, g, 2)).astype(np.float32))
                for _ in range(4)
            ]
            for mode in ("0", "1"):
                os.environ["GFNET_FUSED_REFINER"] = mode

                def ref_fn(v, a, b_, fl, s=scale):
                    return head.apply(
                        v, a, b_, fl,
                        method=lambda m, aa, bb, ff: m.refiners[s](aa, bb, ff),
                    )

                rj = jax.jit(ref_fn)
                try:
                    results[f"ref{scale}_{name}@{g}_fused{mode}"] = timed(
                        lambda fl: rj(hv, f0, f1, fl), flows
                    )
                except Exception as e:  # noqa: BLE001
                    results[f"ref{scale}_{name}@{g}_fused{mode}"] = float("nan")
                    print(f"  ref{scale}_{name} fused={mode} FAILED: {type(e).__name__}: {e}")

    os.environ.pop("GFNET_FUSED_REFINER", None)
    print(f"{'component':<28} {'ms':>8}")
    for k, v in results.items():
        print(f"{k:<28} {v * 1e3:>8.2f}")


if __name__ == "__main__":
    main()
