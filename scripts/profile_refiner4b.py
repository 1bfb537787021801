"""Re-measure refiner4_560@80 (48ms outlier) and ablate its composition.

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_refiner4b.py
"""

from __future__ import annotations

import time

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


def main():
    from gfnet_tpu.config import ModelConfig
    from gfnet_tpu.matcher.api import GFNetMatcher
    from gfnet_tpu.models.refiner import ConvRefiner

    cfg = ModelConfig()
    matcher = GFNetMatcher(cfg)
    head, hv = matcher.head, matcher.head_vars
    rng = np.random.default_rng(0)
    res = {}

    for tag, g, hw in (("448@64", 64, 112), ("560@80", 80, 140), ("560@80pad144", 80, 144)):
        f0 = jnp.asarray(rng.normal(0, 1, (2, hw, hw, 32)).astype(np.float32)).astype(jnp.bfloat16)
        f1 = jnp.asarray(rng.normal(0, 1, (2, hw, hw, 32)).astype(np.float32)).astype(jnp.bfloat16)
        flow = jnp.asarray(rng.uniform(-1, 1, (2, g, g, 2)).astype(np.float32))

        def ref_fn(v, a, b_, fl):
            return head.apply(
                v, a, b_, fl, method=lambda m, aa, bb, ff: m.refiners["4"](aa, bb, ff)
            )

        rj = jax.jit(ref_fn)
        res[f"refiner4_{tag}"] = timed(lambda: rj(hv, f0, f1, flow))

    # standalone ConvRefiner module with its own params (no head plumbing)
    ref = ConvRefiner(hidden_dim=2 * 32 + 32 + 81, displacement_dim=32, radius=4)
    f0 = jnp.asarray(rng.normal(0, 1, (2, 140, 140, 32)).astype(np.float32)).astype(jnp.bfloat16)
    f1 = jnp.asarray(rng.normal(0, 1, (2, 140, 140, 32)).astype(np.float32)).astype(jnp.bfloat16)
    flow = jnp.asarray(rng.uniform(-1, 1, (2, 80, 80, 2)).astype(np.float32))
    rv = jax.jit(ref.init)(jax.random.PRNGKey(0), f0, f1, flow)
    app = jax.jit(lambda v, a, b_, fl: ref.apply(v, a, b_, fl))
    res["standalone_560@80"] = timed(lambda: app(rv, f0, f1, flow))

    print(f"{'case':<24} {'ms':>8}")
    for k, v in res.items():
        print(f"{k:<24} {v * 1e3:>8.2f}")


if __name__ == "__main__":
    main()
