#!/usr/bin/env python
"""Convert the public DINOv2 torch checkpoint to the flax .npz used here.

Usage:
  python tools/convert_dinov2.py /path/to/dinov2_vitl14_pretrain.pth \
      weights/dinov2_vitl14.npz

The .pth is the file the reference downloads at model construction
(ref `model/network.py:46`). We store it once, content-addressed by shape,
instead of re-downloading per run (SURVEY.md §5 checkpoint notes).
"""

import sys

import numpy as np


def main():
    src, dst = sys.argv[1], sys.argv[2]
    import torch

    from gfnet_tpu.utils.convert import convert_dinov2_state_dict

    sd = torch.load(src, map_location="cpu", weights_only=True)
    params = convert_dinov2_state_dict({k: v.numpy() for k, v in sd.items()})

    flat = {}

    def walk(d, prefix=""):
        for k, v in d.items():
            path = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, path)
            else:
                flat[path] = np.asarray(v)

    walk(params)
    np.savez(dst, **flat)
    print(f"wrote {len(flat)} arrays to {dst}")


if __name__ == "__main__":
    main()
