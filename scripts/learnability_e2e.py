"""End-to-end learnability: synthetic homography stream → train → benchmark.

Demonstrates train→eval works (VERDICT r1 item 2): trains the tiny config for
N steps on textured synthetic pairs with exact GT homographies, then runs the
full match→sample→solve benchmark before/after, expecting MACE to collapse
from the random-weight ~70px-cap baseline.

  PYTHONPATH=/root/repo:$PYTHONPATH JAX_PLATFORMS=cpu \
      python scripts/learnability_e2e.py --steps 400

Oracle refs: training telemetry `losses/robust_loss.py:72-75` (pck),
end-of-training benchmark `train.py:142` / `estimation.py:79-92` (MACE).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--eval_pairs", type=int, default=24)
    p.add_argument("--deformation", type=float, default=0.15)
    p.add_argument("--cross_modal_frac", type=float, default=0.0,
                   help="fraction of training pairs with a modality-shifted "
                   "second view (reference-style multimodal stream)")
    p.add_argument("--eval_matches", type=int, default=2000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log_every", type=int, default=20)
    # The reference hyperparams (lr=1e-4, clip=0.01) are tuned for a 250k-step
    # budget; a short learnability demo needs a hotter schedule. Defaults are
    # per-config: tiny takes lr 4e-4 / clip 1.0; flagship needs a cooler
    # lr 1.25e-4 / clip 0.1 — at the hot settings its cross-view decoder
    # (whose k/v enter attention un-normalized, ref `block.py:322-328`)
    # intermittently explodes (grad norms 1e3-1e10, per-module telemetry via
    # GFNET_GRAD_BREAKDOWN=1) and the clipped garbage directions undo
    # learning. Diagnosed 2026-08-20; both dtypes explode identically, so it
    # is an optimization-scale issue, not bf16.
    p.add_argument("--lr_per_sample", type=float, default=None)
    p.add_argument("--grad_clip", type=float, default=None)
    p.add_argument("--out", type=str, default=None, help="write JSON results here")
    p.add_argument("--save_head", type=str, default=None,
                   help="save the trained head variables to this .npz")
    p.add_argument("--init_head", type=str, default=None,
                   help="initialize the head from a previously saved .npz "
                   "(continue a training run)")
    p.add_argument("--config", choices=["tiny", "flagship"], default="tiny",
                   help="tiny (112->168, CPU-friendly) or flagship (448->560, "
                   "basic.json architecture; run on TPU)")
    p.add_argument("--dtype", choices=["f32", "bf16"], default=None,
                   help="compute dtype (default: f32 tiny, bf16 flagship)")
    p.add_argument("--freeze", type=str, default="",
                   help="comma-separated top-level head modules whose grads "
                   "are zeroed (e.g. 'crossview': with a random backbone its "
                   "un-normalized k/v explode, drowning the global clip)")
    p.add_argument("--uint8", type=int, default=None,
                   help="ship training batches as raw uint8 with device-side "
                   "normalization (4x less tunnel upload; matches real "
                   "datasets' 8-bit content). Default: 1 for flagship, 0 tiny")
    p.add_argument("--module_spike_zero", type=str, default="",
                   help="per-module spike thresholds 'name=thresh,...': zero "
                   "a module's grads on steps where its norm exceeds thresh "
                   "(outlier rejection; see train/step.py)")
    p.add_argument("--module_clip", type=str, default="",
                   help="per-module grad-norm caps applied before the global "
                   "clip, 'name=cap,name=cap' (e.g. 'crossview=0.02'): lets "
                   "an explosion-prone module keep learning without its "
                   "spikes dominating the global clip direction)")
    args = p.parse_args(argv)

    import os

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        # the axon TPU plugin bootstraps regardless of the env var; the
        # config knob actually wins (same trick as tests/conftest.py)
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    from gfnet_tpu.config import ModelConfig, TrainConfig, tiny_test_config
    from gfnet_tpu.eval.synthetic import benchmark_mace, eval_pairs, train_batch
    from gfnet_tpu.matcher.api import GFNetMatcher
    from gfnet_tpu.train.loss import RobustLoss
    from gfnet_tpu.train.state import create_train_state
    from gfnet_tpu.train.step import make_train_step

    cfg = tiny_test_config() if args.config == "tiny" else ModelConfig()
    dtype = jnp.float32 if (args.dtype or
                            ("f32" if args.config == "tiny" else "bf16")) == "f32" \
        else jnp.bfloat16
    res = cfg.initial_res[0]
    matcher = GFNetMatcher(cfg, seed=args.seed, dtype=dtype)
    if args.init_head:
        raw = np.load(args.init_head)
        tree: dict = {}
        for name in raw.files:
            if name == "__protocol_kv_norm__":
                if raw[name]:
                    os.environ["GFNET_KV_NORM"] = "1"
                    print("init head carries kv-norm protocol; GFNET_KV_NORM=1")
                continue
            d = tree
            ks = name.split("/")
            for k in ks[:-1]:
                d = d.setdefault(k, {})
            d[ks[-1]] = jnp.asarray(raw[name])
        matcher.head_vars = tree
        print(f"initialized head from {args.init_head}")

    bench = eval_pairs(args.eval_pairs, res, args.deformation)
    bench_cm = eval_pairs(args.eval_pairs, res, args.deformation,
                          seed=4321, cross_modal=True)
    mace0, _ = benchmark_mace(matcher, bench, num_matches=args.eval_matches)
    print(f"random-weight baseline MACE = {mace0:.2f} px over {len(bench)} pairs")

    if args.lr_per_sample is None:
        args.lr_per_sample = 4e-4 if args.config == "tiny" else 1.25e-4
    if args.grad_clip is None:
        args.grad_clip = 1.0 if args.config == "tiny" else 0.1
    tcfg = TrainConfig(
        grad_clip_norm=args.grad_clip, lr_per_sample=args.lr_per_sample
    )
    loss = RobustLoss(im_size=res)
    freeze = tuple(m for m in args.freeze.split(",") if m)
    module_clip = {
        kv.split("=")[0]: float(kv.split("=")[1])
        for kv in args.module_clip.split(",") if kv
    }
    spike_zero = {
        kv.split("=")[0]: float(kv.split("=")[1])
        for kv in args.module_spike_zero.split(",") if kv
    }
    step = make_train_step(matcher, loss, mesh=None, freeze=freeze,
                           module_clip=module_clip or None,
                           module_spike_zero=spike_zero or None)
    state = create_train_state(matcher.head_vars, tcfg, global_batch=args.batch)
    rng = np.random.default_rng(args.seed + 1)

    # Multi-worker host prefetch: flagship batch synthesis (textures + warps,
    # cv2/numpy so the GIL is mostly released) costs ~1s/batch on a quiet
    # host and dominates the 0.9s device step when single-threaded; a 4-deep
    # pipeline keeps the TPU step the critical path. Each submission gets its
    # own child generator so the sample stream stays deterministic regardless
    # of worker completion order.
    from concurrent.futures import ThreadPoolExecutor

    depth = int(os.environ.get("GFNET_SYNTH_WORKERS", "4"))
    pool = ThreadPoolExecutor(max_workers=depth)
    uint8 = bool(args.uint8 if args.uint8 is not None
                 else (args.config == "flagship"))
    submit = lambda: pool.submit(
        train_batch, np.random.default_rng(rng.integers(2**63)),
        args.batch, res, args.deformation, args.cross_modal_frac, uint8,
    )
    from collections import deque

    queue = deque(submit() for _ in range(depth))
    t0 = time.time()
    for i in range(args.steps):
        batch = queue.popleft().result()
        queue.append(submit())
        state, metrics = step(state, matcher.vit_params, batch)
        if (i + 1) % args.log_every == 0:
            pck = {k: float(v) for k, v in metrics.items() if "pck" in k}
            gb = {k.split("/")[1]: f"{float(v):.2e}" for k, v in metrics.items()
                  if k.startswith("gnorm/")}
            gbr = {k.split("/")[1]: f"{float(v):.2e}" for k, v in metrics.items()
                   if k.startswith("gnorm_raw/")}
            if gb:
                print(f"  gnorm breakdown: {gb}")
            if gbr:
                print(f"  gnorm RAW:       {gbr}")
            print(
                f"step {i+1}/{args.steps} loss={float(metrics['total_loss']):.4f} "
                f"grad={float(metrics['grad_norm']):.3f} "
                f"nonfinite={int(metrics['nonfinite_grad_leaves'])} {pck} "
                f"({(time.time()-t0)/(i+1):.2f}s/step)"
            )

    matcher.head_vars = {"params": state.params, "batch_stats": state.batch_stats}
    if args.save_head:
        flat = {
            "/".join(str(k.key) for k in path): np.asarray(v)
            for path, v in jax.tree_util.tree_flatten_with_path(matcher.head_vars)[0]
        }
        if os.environ.get("GFNET_KV_NORM") == "1":
            # embed the forward-semantics flag so evaluation auto-applies it
            # (utils/convert.py load_head_checkpoint)
            flat["__protocol_kv_norm__"] = np.asarray(1)
        np.savez(args.save_head, **flat)
        print(f"saved trained head to {args.save_head}")
    from gfnet_tpu.eval.benchmark import auc

    mace1, errors = benchmark_mace(matcher, bench, num_matches=args.eval_matches)
    mace_cm, errors_cm = benchmark_mace(matcher, bench_cm,
                                        num_matches=args.eval_matches)
    ths = (3, 5, 10, 20)
    aucs = dict(zip((f"auc@{t}" for t in ths), auc(errors, ths)))
    aucs_cm = dict(zip((f"auc@{t}" for t in ths), auc(errors_cm, ths)))
    print(f"trained MACE = {mace1:.2f} px (baseline {mace0:.2f}); "
          f"cross-modal MACE = {mace_cm:.2f}")
    print(f"AUC same-modal {aucs}  cross-modal {aucs_cm}")
    result = {
        "steps": args.steps,
        "batch": args.batch,
        "deformation": args.deformation,
        "cross_modal_frac": args.cross_modal_frac,
        "eval_pairs": args.eval_pairs,
        "eval_matches": args.eval_matches,
        "mace_random": mace0,
        "mace_trained": mace1,
        "mace_trained_crossmodal": mace_cm,
        "auc": aucs,
        "auc_crossmodal": aucs_cm,
        "errors": errors,
        "errors_crossmodal": errors_cm,
        "seconds": time.time() - t0,
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
    return result


if __name__ == "__main__":
    main()
