"""Profiling + roofline accounting (fills SURVEY.md §5's tracing gap).

The reference's only timing is wall-clock around match+RANSAC
(`estimation.py:56,78`). Here:
  - `trace(...)`: context manager around `jax.profiler` writing a TensorBoard
    trace directory;
  - `timed(...)`: dispatch-aware wall-clock timer (block_until_ready);
  - `roofline_report(...)`: static FLOP/byte accounting for the engine's hot
    ops at a given config, against TPU peak numbers, so kernel efficiency is
    inspectable without hardware counters.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass

import jax

# v5e (TPU v5 lite) peaks; override for other generations.
PEAK_BF16_FLOPS = 394e12 / 2  # per-chip bf16 matmul peak ~197 TFLOP/s
PEAK_HBM_BYTES = 819e9  # ~819 GB/s


@contextlib.contextmanager
def trace(logdir: str = "/tmp/gfnet_trace"):
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def timed(fn, *args, iters: int = 10, warmup: int = 2):
    """Median wall-clock seconds per call (jit-dispatch + device time)."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


@dataclass
class OpCost:
    name: str
    flops: float
    bytes: float

    @property
    def compute_s(self) -> float:
        return self.flops / PEAK_BF16_FLOPS

    @property
    def memory_s(self) -> float:
        return self.bytes / PEAK_HBM_BYTES

    @property
    def bound(self) -> str:
        return "compute" if self.compute_s > self.memory_s else "memory"


def model_op_costs(cfg, batch: int = 1, symmetric: bool = True) -> list[OpCost]:
    """Static cost model for the engine's dominant ops at `cfg.initial_res`."""
    h, w = cfg.initial_res
    p = cfg.dino.patch_size
    n_tok = (h // p) * (w // p) + 1
    d = cfg.dino.d_model
    views = 2 * batch
    costs = []

    # ViT-L blocks: qkv+proj (4 d^2) + mlp (8 d^2) per token, x2 MAC
    vit_flops = views * cfg.dino.depth * n_tok * (12 * d * d * 2 + 2 * 2 * n_tok * d * 2)
    vit_bytes = cfg.dino.depth * 12 * d * d * 2  # weights in bf16, re-read per step
    costs.append(OpCost("dinov2_backbone", vit_flops, vit_bytes + views * n_tok * d * 4))

    # global correlation + softmax expectation at the ViT grid
    g = cfg.matcher.num_grid[0]
    b_eff = views if symmetric else batch
    corr_flops = b_eff * (g * g) * (g * g) * cfg.encoder.feat_chs[0] * 2
    costs.append(
        OpCost("global_correlation", corr_flops, b_eff * g * g * g * g * 4)
    )

    # local correlation windows per scale
    feat_ch = {16: cfg.encoder.feat_chs[0], 8: cfg.encoder.feat_chs[0],
               4: cfg.encoder.feat_chs[1], 2: cfg.encoder.feat_chs[2]}
    for i, scale in enumerate((16, 8, 4, 2)):
        r = cfg.matcher.radius[i]
        if r <= 0:
            continue
        gi = cfg.matcher.num_grid[i]
        k = (2 * r + 1) ** 2
        c = feat_ch[scale]
        fl = b_eff * gi * gi * k * c * 2 * 4  # 4 bilinear corners
        by = b_eff * gi * gi * k * c * 4 * 4
        costs.append(OpCost(f"local_corr_s{scale}", fl, by))

    # FPN encoder full-res convs (dominant first convs)
    enc = cfg.encoder.feat_chs[::-1]
    conv_flops = views * h * w * (3 * enc[0] * 49 + enc[0] * enc[0] * 25) * 2
    costs.append(OpCost("fpn_encoder_fullres", conv_flops, views * h * w * enc[0] * 4))
    return costs


def roofline_report(cfg, batch: int = 1) -> str:
    lines = [f"{'op':24s} {'GFLOP':>9s} {'MB':>9s} {'t_comp':>9s} {'t_mem':>9s}  bound"]
    for c in model_op_costs(cfg, batch):
        lines.append(
            f"{c.name:24s} {c.flops/1e9:9.2f} {c.bytes/1e6:9.2f} "
            f"{c.compute_s*1e3:8.3f}m {c.memory_s*1e3:8.3f}m  {c.bound}"
        )
    return "\n".join(lines)
