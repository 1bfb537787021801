"""Single-pair demo: match → sample → solve → metrics → visualization.

The user-facing equivalent of `demo_estimation` (ref `estimation.py:46-118`):
takes two image paths (or arrays) + optional GT homography json, reports the
corner error + runtime, and optionally renders a `match.png`.
"""

from __future__ import annotations

import json
import time

import jax
import numpy as np

from gfnet_tpu.core.geometry import denormalize_corner_aligned
from gfnet_tpu.core.homography import ransac_homography
from gfnet_tpu.eval.benchmark import corner_error_np


def _load_image(img) -> np.ndarray:
    if isinstance(img, str):
        from PIL import Image

        arr = np.asarray(Image.open(img).convert("RGB"), np.float32) / 255.0
        return arr
    return np.asarray(img, np.float32)


def demo_estimation(
    matcher,
    img1,
    img2,
    H_s2t_path: str | np.ndarray | None = None,
    num_matches: int = 5000,
    visualize: bool = False,
    out_path: str = "match.png",
    seed: int = 0,
):
    """Returns (corner_error_or_None, runtime_seconds, H_pred)."""
    im1 = _load_image(img1)
    im2 = _load_image(img2)
    h1, w1 = im1.shape[:2]
    h2, w2 = im2.shape[:2]

    H_gt = None
    if H_s2t_path is not None:
        if isinstance(H_s2t_path, str):
            with open(H_s2t_path) as f:
                H_gt = np.asarray(json.load(f)["H"], np.float64)
        else:
            H_gt = np.asarray(H_s2t_path, np.float64)

    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    start = time.perf_counter()
    warp, certainty = matcher.match(im1, im2)
    matches, _ = matcher.sample(warp, certainty, num_matches, k1)
    pos_a = denormalize_corner_aligned(matches[:, :2], h1, w1)
    pos_b = denormalize_corner_aligned(matches[:, 2:], h2, w2)
    H_pred, _ = ransac_homography(pos_a, pos_b, key=k2)
    H_pred = np.asarray(jax.block_until_ready(H_pred), np.float64)
    runtime = time.perf_counter() - start

    err = None
    if H_gt is not None:
        err = corner_error_np(H_pred, H_gt, w1, h1)
        print(f"ACE is {err}.")

    if visualize:
        from gfnet_tpu.eval.visualize import draw_matches

        path = draw_matches(
            im1, im2, np.asarray(pos_a), np.asarray(pos_b), H_gt, out_path=out_path
        )
        print(f"The matching result is saved to {path}.")
    return err, runtime, H_pred
