"""A/B: approx_max_k (recall 0.95) vs exact top-k in match sampling.

The matcher's Gumbel top-k sampling (`matcher/api.py:_sample_core`) uses
`jax.lax.approx_max_k` for speed; this measures its accuracy effect on the
synthetic benchmark with a TRAINED head (VERDICT r1 weak item 5 asked for
exactly this A/B once accuracy numbers exist).

  PYTHONPATH=/root/repo:$PYTHONPATH JAX_PLATFORMS=cpu \
      python scripts/ab_sampling.py --head /tmp/trained_head.npz
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--head", type=str, required=True, help="trained head .npz")
    p.add_argument("--eval_pairs", type=int, default=16)
    p.add_argument("--seeds", type=int, default=3)
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args(argv)

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    from gfnet_tpu.config import tiny_test_config
    from gfnet_tpu.eval.synthetic import benchmark_mace, eval_pairs
    from gfnet_tpu.matcher.api import GFNetMatcher
    from gfnet_tpu.utils.convert import load_head_checkpoint

    cfg = tiny_test_config()
    matcher = GFNetMatcher(cfg, dtype=jnp.float32)
    matcher.head_vars = load_head_checkpoint(args.head, matcher.head_vars)
    bench = eval_pairs(args.eval_pairs, cfg.initial_res[0], 0.15)

    results = {}
    for mode, env in (("approx", "0"), ("exact", "1")):
        os.environ["GFNET_EXACT_TOPK"] = env
        # new matcher instance: the env var is baked in at trace time
        m = GFNetMatcher(
            cfg, vit_params=matcher.vit_params, head_vars=matcher.head_vars,
            dtype=jnp.float32,
        )
        maces = []
        for s in range(args.seeds):
            mace, _ = benchmark_mace(m, bench, num_matches=2000, seed=s)
            maces.append(mace)
        results[mode] = {"mace_mean": float(np.mean(maces)), "maces": maces}
        print(f"{mode}: MACE {np.mean(maces):.3f} (seeds: {[round(x,3) for x in maces]})")
    os.environ.pop("GFNET_EXACT_TOPK", None)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    return results


if __name__ == "__main__":
    main()
