"""Evaluation entry point: `python -m gfnet_tpu.cli.test --dataset mscoco ...`

Flag surface mirrors the reference (`test.py:14-18`): --conf_path,
--ckpt_path, --dataset; reports auc@{3,5,10,20}, mean ACE, median runtime
(ref `test.py:70-75`).
"""

from __future__ import annotations

import json
import os
from argparse import ArgumentParser

import numpy as np


def main(argv=None):
    parser = ArgumentParser()
    parser.add_argument("--conf_path", type=str, default=None)
    parser.add_argument("--ckpt_path", type=str, default=None)
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--data_path", type=str, default=os.environ.get("DATA_PATH", "data"))
    parser.add_argument("--max_pairs", type=int, default=None)
    parser.add_argument("--dinov2_weights", type=str,
                        default=os.environ.get("DINOV2_NPZ", "weights/dinov2_vitl14.npz"))
    parser.add_argument("--tiny", action="store_true",
                        help="debug: tiny architecture + CPU-friendly sizes")
    parser.add_argument("--batch", type=int, default=None,
                        help="evaluate pairs in batches of B through the "
                             "3-dispatch batched path (default: the "
                             "reference's serial per-pair protocol)")
    args, _ = parser.parse_known_args(argv)

    from gfnet_tpu.config import ModelConfig
    from gfnet_tpu.data.dataset import HomographyDataset
    from gfnet_tpu.eval.benchmark import HomographyBenchmark
    from gfnet_tpu.matcher.api import GFNetMatcher
    from gfnet_tpu.models.vit import load_dinov2_params

    if args.tiny:
        from gfnet_tpu.config import tiny_test_config

        cfg = tiny_test_config()
        res = cfg.initial_res[0]
    else:
        cfg = ModelConfig.from_json(args.conf_path) if args.conf_path else ModelConfig()
        res = {"googlemap_224x224": 224, "googlemap_672x672": 672}.get(
            args.dataset, cfg.initial_res[0]
        )
    # eval always runs symmetric + two-pass upsampling (ref `test.py:25-30`)
    cfg = cfg.replace(symmetric=True, upsample_preds=True, attenuate_cert=True)

    matcher = GFNetMatcher(cfg)
    if os.path.exists(args.dinov2_weights):
        matcher.vit_params = matcher._cast_vit_params(
            {"params": load_dinov2_params(args.dinov2_weights)}
        )
    else:
        print(f"WARNING: no DINOv2 weights at {args.dinov2_weights}; random backbone")
    if args.ckpt_path:
        from gfnet_tpu.utils.convert import load_head_checkpoint

        matcher.head_vars = load_head_checkpoint(args.ckpt_path, matcher.head_vars)
        print(f"loaded checkpoint {args.ckpt_path}")

    ds_name = {"googlemap_448x448": "googlemap"}.get(args.dataset, args.dataset)
    dataset = HomographyDataset(
        dataset=ds_name, mode="val", data_path=args.data_path, input_resolution=(res, res)
    )
    bench = HomographyBenchmark(dataset)
    results = bench.run(
        matcher, max_pairs=args.max_pairs, verbose=True, batch_size=args.batch
    )
    print(json.dumps(results, indent=2))
    return results


if __name__ == "__main__":
    main()
