"""Component-level device timing for the GFNet head + ViT variants.

Times (fetch-forced, see profile_e2e.py) each head sub-module at the shapes
the flagship e2e path actually uses, to locate the non-ViT device time.

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_head.py
"""

from __future__ import annotations

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

        enc = jax.jit(
            lambda v, xx: head.apply(v, xx, False, method=lambda m, a, t: m.encoder(a, t))
        )
        results[f"fpn_encoder_{name}"] = timed(lambda: enc(hv, x))

        convs = enc(hv, x)

        def dec_fn(v, c0, c1, c2, c3):
            return head.apply(
                v, c0, c1, c2, c3, False,
                method=lambda m, a, b_, c_, d_, t: m.fpn_decoder(a, b_, c_, d_, t),
            )

        dec = jax.jit(dec_fn)
        results[f"fpn_decoder_{name}"] = timed(lambda: dec(hv, *convs))

        cvw = jax.jit(
            lambda v, t: head.apply(
                v, t, (gh, gw),
                method=lambda m, tt, g: m.crossview(tt[:1], tt[1:], g),
            )
        )
        results[f"crossview_{name}"] = timed(lambda: cvw(hv, tokens))

        feats = jax.jit(
            lambda v, xx, t: head.apply(
                v, xx, t, (gh, gw), False, False,
                method=lambda m, a, b_, g, u, tr: m.extract_features(a, b_, g, u, tr),
            )
        )
        f0d, f1d = feats(hv, x, tokens)

        # per-scale refiners at the e2e grids (B'=2 symmetric)
        fd = dict(zip(("16", "8", "4", "2", "1"), grids))
        for scale, g in fd.items():
            f0 = jnp.concatenate([f0d[scale], f1d[scale]], 0)
            f1 = jnp.concatenate([f1d[scale], f0d[scale]], 0)
            flow = jnp.asarray(rng.uniform(-1, 1, (2, g, g, 2)).astype(np.float32))

            def ref_fn(v, a, b_, fl, s=scale):
                return head.apply(
                    v, a, b_, fl,
                    method=lambda m, aa, bb, ff: m.refiners[s](aa, bb, ff),
                )

            rj = jax.jit(ref_fn)
            results[f"refiner{scale}_{name}@{g}"] = timed(lambda: rj(hv, f0, f1, flow))

        if name == "448":
            cvol = jax.jit(
                lambda a, b_: __import__(
                    "gfnet_tpu.ops.correlation", fromlist=["corr_volume_flow"]
                ).corr_volume_flow(a, b_)
            )
            f0 = jnp.concatenate([f0d["16"], f1d["16"]], 0)
            f1 = jnp.concatenate([f1d["16"], f0d["16"]], 0)
            results["corr_volume_flow_448"] = timed(lambda: cvol(f0, f1))

    print(f"{'component':<24} {'ms':>8}")
    for k, v in results.items():
        print(f"{k:<24} {v * 1e3:>8.2f}")


if __name__ == "__main__":
    main()
