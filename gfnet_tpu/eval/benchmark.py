"""ACE/AUC homography benchmark harness.

Re-implements the reference eval protocol end to end:
  - `auc` recall-vs-error trapezoid curve (ref `estimation.py:12-24`);
  - per-pair estimation: match → sample 5k → solve → 4-corner transfer error
    capped at 70px (ref `estimation.py:46-92`), with wall-clock runtime of
    match+sample+solve;
  - dir-driven benchmark over 1k-pair test sets reporting auc@{3,5,10,20} +
    mean ACE + mean runtime (ref `test.py:57-75`,
    `benchmark/multimodal_homog_benchmark_multiscale.py:22-78` — minus its
    tensor-as-path crash bug, SURVEY.md appendix).

The solve runs on device; only the final scalar comes back to host.
"""

from __future__ import annotations

import time
from typing import Sequence

import jax
import numpy as np


def auc(errors: Sequence[float], thresholds: Sequence[float]) -> list[float]:
    """Trapezoid AUC of the recall-vs-error curve at each threshold."""
    errors = np.sort(np.asarray(errors, np.float64))
    recall = (np.arange(len(errors)) + 1) / len(errors)
    errors = np.r_[0.0, errors]
    recall = np.r_[0.0, recall]
    out = []
    for t in thresholds:
        last = np.searchsorted(errors, t)
        r = np.r_[recall[:last], recall[last - 1]]
        e = np.r_[errors[:last], t]
        out.append(float(np.trapezoid(r, x=e) / t))
    return out


def corner_error_np(H_pred: np.ndarray, H_gt: np.ndarray, w: int, h: int, cap=70.0) -> float:
    corners = np.array(
        [[0, 0, 1], [0, h - 1, 1], [w - 1, 0, 1], [w - 1, h - 1, 1]], np.float64
    )
    real = corners @ H_gt.T
    real = real[:, :2] / real[:, 2:]
    pred = corners @ H_pred.T
    pred = pred[:, :2] / pred[:, 2:]
    return float(min(np.mean(np.linalg.norm(real - pred, axis=1)), cap))


def evaluate_pair(
    matcher, im_src, im_tgt, H_gt: np.ndarray, key=None, num_matches: int = 5000
) -> tuple[float, float]:
    """One pair → (ACE, runtime_seconds). Timing covers match+sample+solve
    like the reference (`estimation.py:56,78`)."""
    h, w = np.shape(im_src)[-3:-1]  # metadata only — no device fetch
    start = time.perf_counter()
    H_pred = matcher.estimate_homography(im_src, im_tgt, num_matches=num_matches, key=key)
    H_pred = np.asarray(jax.block_until_ready(H_pred), np.float64)
    runtime = time.perf_counter() - start
    if not np.all(np.isfinite(H_pred)):
        H_pred = np.diag([0.0, 0.0, 1.0])
    return corner_error_np(H_pred, np.asarray(H_gt, np.float64), w, h), runtime


class HomographyBenchmark:
    """Loop a val HomographyDataset through the matcher (ref
    `MultimodalHomogBenchmark.benchmark`)."""

    def __init__(self, dataset, thresholds=(3, 5, 10, 20)):
        self.dataset = dataset
        self.thresholds = thresholds

    def run(self, matcher, max_pairs: int | None = None, seed: int = 0, verbose=False,
            batch_size: int | None = None):
        """batch_size=None: the reference's strictly serial per-pair protocol
        (its runtime number is per-pair latency, `estimation.py:56,78`).
        batch_size=B: pairs go through `estimate_homography_batched` B at a
        time (3 dispatches per B pairs) — identical per-pair errors, with
        `runtime_*` reporting amortized wall-clock per pair. Use for large
        evals where the serial host↔device round trips dominate."""
        n = len(self.dataset)
        if max_pairs:
            n = min(n, max_pairs)
        if batch_size:
            return self._run_batched(matcher, n, batch_size, seed, verbose)
        errors, runtimes = [], []
        key = jax.random.PRNGKey(seed)
        for i in range(n):
            sample = self.dataset[i]
            key, k = jax.random.split(key)
            ace, rt = evaluate_pair(
                matcher, sample["im_A"], sample["im_B"], sample["H_s2t"], key=k
            )
            errors.append(ace)
            runtimes.append(rt)
            if verbose and (i + 1) % 50 == 0:
                print(f"[{i+1}/{n}] running MACE={np.mean(errors):.3f}")
        aucs = auc(errors, self.thresholds)
        name = self.dataset.dataset
        results = {f"auc@{t}_{name}": v for t, v in zip(self.thresholds, aucs)}
        results[f"mace_{name}"] = float(np.mean(errors))
        # first pair includes compile; median is the honest steady-state number
        results[f"runtime_{name}"] = float(np.median(runtimes))
        return results

    def _run_batched(self, matcher, n: int, bsz: int, seed: int, verbose: bool):
        errors, batch_times = [], []
        key = jax.random.PRNGKey(seed)
        for start in range(0, n, bsz):
            idx = list(range(start, min(start + bsz, n)))
            samples = [self.dataset[i] for i in idx]
            pad = bsz - len(idx)  # repeat-pad the ragged tail so every chunk
            if pad:                # reuses the one compiled B-shaped program
                samples += [samples[-1]] * pad
            im_a = np.stack([np.asarray(s["im_A"]) for s in samples])
            im_b = np.stack([np.asarray(s["im_B"]) for s in samples])
            key, k = jax.random.split(key)
            t0 = time.perf_counter()
            Hs = matcher.estimate_homography_batched(im_a, im_b, key=k)
            Hs = np.asarray(jax.block_until_ready(Hs), np.float64)
            batch_times.append(time.perf_counter() - t0)
            h, w = im_a.shape[1:3]
            for j, i in enumerate(idx):
                H_pred = Hs[j]
                if not np.all(np.isfinite(H_pred)):
                    H_pred = np.diag([0.0, 0.0, 1.0])
                errors.append(
                    corner_error_np(H_pred, np.asarray(samples[j]["H_s2t"], np.float64), w, h)
                )
            if verbose:
                print(f"[{len(errors)}/{n}] running MACE={np.mean(errors):.3f}")
        aucs = auc(errors, self.thresholds)
        name = self.dataset.dataset
        results = {f"auc@{t}_{name}": v for t, v in zip(self.thresholds, aucs)}
        results[f"mace_{name}"] = float(np.mean(errors))
        # amortized per-pair wall-clock; first chunk carries the compile, so
        # drop it from the steady-state figure when there is more than one
        steady = batch_times[1:] or batch_times
        results[f"runtime_{name}"] = float(np.sum(steady) / (len(steady) * bsz))
        results[f"batch_size_{name}"] = bsz
        return results
