"""Scaling-efficiency harness: pairs/s vs mesh size (VERDICT r1 item 3).

Measures, at mesh sizes {1, 2, 4, ...} up to the available device count, the
sharded TRAIN step and sharded BATCHED INFERENCE
(`GFNetMatcher.estimate_homography_batched` after `shard_for_mesh`).

Two modes:
  - weak (per-device batch fixed, the DDP regime of ref `train.py:57,62`):
    the real pod-scaling measurement. Only meaningful when every mesh device
    owns its own silicon — i.e. on actual TPU chips.
  - fixed_compute (global batch fixed while the mesh grows): the honest
    metric on a HOST-VIRTUAL mesh (XLA_FLAGS=--xla_force_host_platform_
    device_count=N), where all "devices" share one CPU's cores and weak
    scaling is physically impossible. t(mesh=N)/t(mesh=1) ~ 1.0 shows GSPMD
    partitioning + collectives add no overhead at fixed total work — the
    CPU-checkable part of the >= 80%% pod-efficiency target (BASELINE.json).

Default mode is fixed_compute on CPU, weak on TPU.

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_scaling.py \
      --sizes 1 2 4 8 --tiny
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def _measure(fn, sync, warmup=2, iters=5):
    for _ in range(warmup):
        sync(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--per_device_batch", type=int, default=2)
    p.add_argument("--tiny", action="store_true",
                   help="tiny config (CPU-mesh validation); default flagship")
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--mode", choices=["weak", "fixed_compute"], default=None,
                   help="default: fixed_compute on cpu, weak on tpu")
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args(argv)

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    from gfnet_tpu.config import ModelConfig, TrainConfig, tiny_test_config
    from gfnet_tpu.matcher.api import GFNetMatcher
    from gfnet_tpu.parallel.mesh import create_mesh, shard_batch
    from gfnet_tpu.train.loss import RobustLoss
    from gfnet_tpu.train.state import create_train_state
    from gfnet_tpu.train.step import make_train_step

    n_avail = len(jax.devices())
    sizes = [s for s in args.sizes if s <= n_avail]
    mode = args.mode or (
        "weak" if jax.default_backend() in ("tpu", "axon") else "fixed_compute"
    )
    cfg = tiny_test_config() if args.tiny else ModelConfig()
    dtype = jnp.float32 if args.tiny else jnp.bfloat16
    h, w = cfg.initial_res
    rng = np.random.default_rng(0)
    rows = []

    for n in sizes:
        matcher = GFNetMatcher(cfg, dtype=dtype)
        mesh = create_mesh(n)
        b = (args.per_device_batch * n if mode == "weak"
             else args.per_device_batch * max(sizes))

        # --- train step ---
        loss = RobustLoss(im_size=h)
        step = make_train_step(matcher, loss, mesh)
        # copy: the step donates state buffers, which alias matcher.head_vars
        head_vars = jax.tree_util.tree_map(jnp.array, matcher.head_vars)
        state = create_train_state(head_vars, TrainConfig(), global_batch=b)
        H = np.broadcast_to(np.eye(3, dtype=np.float32), (b, 3, 3)).copy()
        H[:, 0, 2] = rng.uniform(-5, 5, b)
        batch = shard_batch(mesh, {
            "im_A": rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32),
            "im_B": rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32),
            "H_s2t": H,
        })

        # the step donates state; keep a generator so each call has one
        def train_once(state=state):
            nonlocal_state = train_once.state
            new_state, metrics = step(nonlocal_state, matcher.vit_params, batch)
            train_once.state = new_state
            return metrics["total_loss"]
        train_once.state = state

        dt_train = _measure(train_once, lambda x: jax.block_until_ready(x),
                            warmup=2, iters=args.iters)
        train_pps = b / dt_train

        # --- batched inference (match + sample + solve) ---
        matcher.shard_for_mesh(mesh)
        ims = rng.uniform(0, 1, (b, h, w, 3)).astype(np.float32)
        imt = rng.uniform(0, 1, (b, h, w, 3)).astype(np.float32)

        def infer_once():
            return matcher.estimate_homography_batched(ims, imt, num_matches=512)

        dt_inf = _measure(infer_once, lambda x: jax.block_until_ready(x),
                          warmup=2, iters=args.iters)
        inf_pps = b / dt_inf

        rows.append({
            "devices": n, "global_batch": b,
            "train_pairs_per_s": train_pps, "infer_pairs_per_s": inf_pps,
        })
        print(f"n={n}: train {train_pps:.2f} pairs/s, infer {inf_pps:.2f} pairs/s")

    if mode == "weak":
        base_t = rows[0]["train_pairs_per_s"] / rows[0]["devices"]
        base_i = rows[0]["infer_pairs_per_s"] / rows[0]["devices"]
        for r in rows:
            r["train_scaling_eff"] = r["train_pairs_per_s"] / (base_t * r["devices"])
            r["infer_scaling_eff"] = r["infer_pairs_per_s"] / (base_i * r["devices"])
            print(f"n={r['devices']}: efficiency train {r['train_scaling_eff']:.2f} "
                  f"infer {r['infer_scaling_eff']:.2f}")
    else:
        # fixed total work: sharding overhead = t(mesh=N) / t(mesh=1)
        for r in rows:
            r["train_overhead_vs_1dev"] = (
                rows[0]["train_pairs_per_s"] / r["train_pairs_per_s"]
            )
            r["infer_overhead_vs_1dev"] = (
                rows[0]["infer_pairs_per_s"] / r["infer_pairs_per_s"]
            )
            print(f"n={r['devices']}: sharding overhead (fixed global batch) "
                  f"train {r['train_overhead_vs_1dev']:.2f}x "
                  f"infer {r['infer_overhead_vs_1dev']:.2f}x")
    result = {"config": "tiny" if args.tiny else "flagship", "mode": mode,
              "rows": rows}
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
    return result


if __name__ == "__main__":
    main()
