"""Training entry point: `python -m gfnet_tpu.cli.train --conf_path ... --dataset ...`

Flag surface mirrors the reference (`train.py:154-163`):
  --conf_path, --dataset, --gpu_batch_size (per-host batch), --ft, --ft_ckpt,
  plus TPU-native additions (--data_path, --workspace, --steps override).

Replaces torchrun+DDP with `jax.distributed.initialize` (when multi-process)
+ a data-axis Mesh. The loop structure follows the reference: k-step chunks
of 25000 samples with a cosine-LR step and a checkpoint per chunk
(`train.py:65-67,122-138`), checkpoint-on-interrupt (`train.py:143-146`).
"""

from __future__ import annotations

import json
import os
import sys
import time
from argparse import ArgumentParser

import jax
import numpy as np


def main(argv=None):
    parser = ArgumentParser()
    parser.add_argument("--conf_path", type=str, default=None)
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--gpu_batch_size", "--per_host_batch_size", dest="batch_size",
                        default=8, type=int)
    parser.add_argument("--ft", action="store_true", default=False)
    parser.add_argument("--ft_ckpt", type=str, default=None)
    parser.add_argument("--data_path", type=str, default=os.environ.get("DATA_PATH", "data"))
    parser.add_argument("--workspace", type=str, default="workspace")
    parser.add_argument("--total_pairs", type=int, default=2_000_000)
    parser.add_argument("--ckpt_every", type=int, default=25_000)
    parser.add_argument("--num_workers", type=int, default=8)
    parser.add_argument("--multihost", action="store_true",
                        help="call jax.distributed.initialize()")
    parser.add_argument("--dinov2_weights", type=str,
                        default=os.environ.get("DINOV2_NPZ", "weights/dinov2_vitl14.npz"))
    parser.add_argument("--log_every", type=int, default=50)
    parser.add_argument("--tiny", action="store_true",
                        help="debug: tiny architecture + CPU-friendly sizes")
    parser.add_argument("--eval_after", action="store_true",
                        help="run the homography benchmark on the val split after training "
                             "(the reference wires this too but its call crashes, "
                             "SURVEY.md appendix)")
    parser.add_argument("--eval_max_pairs", type=int, default=None)
    args, _ = parser.parse_known_args(argv)

    # the axon TPU plugin force-sets jax_platforms at import, clobbering the
    # JAX_PLATFORMS env var — honor the env explicitly (CPU smoke/dev runs)
    want = os.environ.get("JAX_PLATFORMS")
    if want and jax.config.jax_platforms != want:
        jax.config.update("jax_platforms", want)

    if args.multihost:
        # On TPU pods initialize() autodetects from the cloud metadata; for
        # manual/localhost clusters (incl. the CPU multi-process smoke,
        # scripts/multihost_smoke.py) pass explicit coordinates via env.
        kw = {}
        if os.environ.get("GFNET_COORDINATOR"):
            kw = dict(
                coordinator_address=os.environ["GFNET_COORDINATOR"],
                num_processes=int(os.environ["GFNET_NUM_PROCESSES"]),
                process_id=int(os.environ["GFNET_PROCESS_ID"]),
            )
        jax.distributed.initialize(**kw)

    import jax.numpy as jnp

    from gfnet_tpu.config import ModelConfig, TrainConfig
    from gfnet_tpu.data.dataset import BatchLoader, HomographyDataset
    from gfnet_tpu.matcher.api import GFNetMatcher
    from gfnet_tpu.models.vit import load_dinov2_params
    from gfnet_tpu.parallel.mesh import create_mesh, shard_batch
    from gfnet_tpu.train.checkpoint import Checkpointer
    from gfnet_tpu.train.loss import RobustLoss
    from gfnet_tpu.train.state import create_train_state
    from gfnet_tpu.train.step import make_train_step
    from gfnet_tpu.utils.logging import MetricLogger

    proc, nproc = jax.process_index(), jax.process_count()
    if args.tiny:
        from gfnet_tpu.config import tiny_test_config

        cfg = tiny_test_config()
    else:
        cfg = (
            ModelConfig.from_json(args.conf_path) if args.conf_path else ModelConfig()
        )
    matcher = GFNetMatcher(cfg)
    if os.path.exists(args.dinov2_weights):
        matcher.vit_params = matcher._cast_vit_params(
            {"params": load_dinov2_params(args.dinov2_weights)}
        )
        print(f"loaded DINOv2 weights from {args.dinov2_weights}")
    else:
        print(
            f"WARNING: no DINOv2 weights at {args.dinov2_weights}; "
            "training with a random frozen backbone"
        )

    global_batch = args.batch_size * nproc
    tcfg = TrainConfig(
        total_pairs=args.total_pairs,
        ckpt_every_pairs=args.ckpt_every,
        per_host_batch_size=args.batch_size,
    )
    mesh = create_mesh()
    loss = RobustLoss(
        ce_weight=tcfg.ce_weight,
        alpha=tcfg.alpha,
        c=tcfg.c,
        iteration_base=tcfg.iteration_base,
        local_largest_scale=tcfg.local_largest_scale,
        local_dist=tcfg.local_dist,
        im_size=cfg.initial_res[0],
    )

    if args.ft and args.ft_ckpt:  # fine-tune bootstrap (ref `train.py:53-56`)
        from gfnet_tpu.utils.convert import load_head_checkpoint

        matcher.head_vars = load_head_checkpoint(args.ft_ckpt, matcher.head_vars)
        print(f"loaded fine-tune init from {args.ft_ckpt}")

    state = create_train_state(matcher.head_vars, tcfg, global_batch)
    ckpt = Checkpointer(args.workspace, args.dataset)
    restored = ckpt.restore(state)
    if restored is not None:
        state = restored
        print(f"auto-resumed from step {int(state.step)}")

    step_fn = make_train_step(matcher, loss, mesh)
    dataset = HomographyDataset(
        dataset=args.dataset,
        mode="train",
        data_path=args.data_path,
        input_resolution=cfg.initial_res,
        process_index=proc,
        process_count=nproc,
    )
    loader = BatchLoader(dataset, args.batch_size, num_workers=args.num_workers, seed=proc)
    logger = MetricLogger(enabled=(proc == 0))

    k = max(args.ckpt_every // global_batch, 1)
    total_steps = args.total_pairs // global_batch
    start_step = int(state.step)
    print(f"training {total_steps} steps (global batch {global_batch}), k={k}")

    try:
        t_last = time.perf_counter()
        step_i = start_step
        while step_i < total_steps:
            chunk = min(k, total_steps - step_i)
            for batch in loader.batches(chunk):
                batch = shard_batch(mesh, batch)
                state, metrics = step_fn(state, matcher.vit_params, batch)
                step_i += 1
                if step_i % args.log_every == 0:
                    m = {kk: float(v) for kk, v in metrics.items()}
                    dt = time.perf_counter() - t_last
                    m["samples_per_s"] = args.log_every * global_batch / dt
                    t_last = time.perf_counter()
                    logger.log(m, step=step_i * global_batch)
            ckpt.save(state)
            print(f"checkpointed at step {step_i} ({step_i*global_batch} pairs)")
    except KeyboardInterrupt:  # ref `train.py:143-146`
        ckpt.save(state)
        print("interrupted: checkpoint saved")
        sys.exit(0)
    ckpt.save(state)
    print("training complete")

    if args.eval_after and proc == 0:
        from gfnet_tpu.eval.benchmark import HomographyBenchmark

        matcher.head_vars = {"params": state.params, "batch_stats": state.batch_stats}
        val_name = {"glunet_448x448_occlusion": "mscoco"}.get(args.dataset, args.dataset)
        try:
            val_ds = HomographyDataset(
                dataset=val_name, mode="val", data_path=args.data_path,
                input_resolution=cfg.initial_res,
            )
            results = HomographyBenchmark(val_ds).run(
                matcher, max_pairs=args.eval_max_pairs
            )
            logger.log(results, step=step_i * global_batch)
            print(json.dumps(results, indent=2))
        except (KeyError, FileNotFoundError) as e:
            print(f"eval_after skipped: val data unavailable ({e})")


if __name__ == "__main__":
    main()
