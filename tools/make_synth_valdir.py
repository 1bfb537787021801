"""Generate a synthetic homography test set in the reference's val layout.

Writes  <data_path>/test/<name>/{source,target,H_s2t}/  exactly as the
reference test sets are laid out (`test.py:41-55`, dataset `:92-119`):
source/NNNN.png + target/NNNN.png + H_s2t/NNNN.json ({"H": 3x3}) with H
mapping source pixels -> target pixels at the stored resolution. Evaluating
through `python -m gfnet_tpu.cli.test --dataset synthetic[_crossmodal]`
then exercises the real eval entry + checkpoint-loading path (VERDICT r3 #2).

    PYTHONPATH=/root/repo:$PYTHONPATH python tools/make_synth_valdir.py \
        --n 100 --res 448 --deformation 0.3 --out data [--cross_modal]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=100)
    p.add_argument("--res", type=int, default=448)
    p.add_argument("--deformation", type=float, default=0.3,
                   help="reference training deformation (`train.py:82`)")
    p.add_argument("--cross_modal", action="store_true")
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--out", type=str, default="data")
    p.add_argument("--name", type=str, default=None)
    args = p.parse_args(argv)

    from PIL import Image

    from gfnet_tpu.eval.synthetic import eval_pairs

    name = args.name or (
        f"synth_1k_{args.res}x{args.res}" + ("_cm" if args.cross_modal else "")
    )
    root = os.path.join(args.out, "test", name)
    for sub in ("source", "target", "H_s2t"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)

    pairs = eval_pairs(args.n, args.res, args.deformation, seed=args.seed,
                       cross_modal=args.cross_modal)
    for i, s in enumerate(pairs):
        stem = f"{i:05d}"
        to_u8 = lambda x: (np.clip(x, 0, 1) * 255).round().astype(np.uint8)
        # dataset val mode: imgs1 = source dir -> im_A (source); imgs0 =
        # target dir -> im_B; H json maps source->target (H_s2t)
        Image.fromarray(to_u8(s["im_A"])).save(
            os.path.join(root, "source", stem + ".png")
        )
        Image.fromarray(to_u8(s["im_B"])).save(
            os.path.join(root, "target", stem + ".png")
        )
        with open(os.path.join(root, "H_s2t", stem + ".json"), "w") as f:
            json.dump({"H": np.asarray(s["H_s2t"], np.float64).tolist()}, f)
    print(f"wrote {len(pairs)} pairs to {root}")


if __name__ == "__main__":
    main()
