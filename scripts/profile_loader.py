"""Host input-pipeline throughput at flagship shapes (VERDICT r1 item 6).

Measures BatchLoader batches/s (PIL decode + augment + cv2 random-homography
warp at 448x448, the reference's online synthesis) across worker counts, to
be compared against the TPU train-step rate: the loader must sustain >= 2x
the step rate or the chip starves (ref analogue: 8 DataLoader worker
processes, `train.py:123-133`).

  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_loader.py
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--batches", type=int, default=8)
    p.add_argument("--workers", type=int, nargs="+", default=[0, 2, 4, 8])
    p.add_argument("--res", type=int, default=448)
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args(argv)

    from multihost_smoke import make_train_tree

    from gfnet_tpu.data.dataset import BatchLoader, HomographyDataset

    tmp = tempfile.mkdtemp(prefix="gfnet_loader_")
    # flagship-sized source images: synthesis crops 448/(1-0.3)=640 from them
    make_train_tree(tmp, n_images=24)
    import cv2
    from PIL import Image

    for sub in ("map", "satellite"):
        d = os.path.join(tmp, "train", "GoogleMap", sub)
        for f in os.listdir(d):
            img = np.asarray(Image.open(os.path.join(d, f)))
            big = cv2.resize(img, (700, 700), interpolation=cv2.INTER_CUBIC)
            Image.fromarray(big).save(os.path.join(d, f))

    ds = HomographyDataset(
        dataset="googlemap", mode="train", data_path=tmp,
        input_resolution=(args.res, args.res),
    )
    rows = []
    for nw in args.workers:
        loader = BatchLoader(ds, args.batch, num_workers=nw, seed=0)
        it = loader.batches(args.batches + 2)
        next(it)  # warm the pool / fill prefetch
        t0 = time.perf_counter()
        n = 0
        for batch in it:
            n += 1
        dt = (time.perf_counter() - t0) / n
        loader.close()
        rows.append({
            "workers": nw,
            "batches_per_s": 1.0 / dt,
            "pairs_per_s": args.batch / dt,
        })
        print(f"workers={nw}: {1.0/dt:.2f} batches/s = {args.batch/dt:.1f} pairs/s")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)
    return rows


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
