"""Robust multi-scale matching loss.

Re-implementation of `losses/robust_loss.py` in static-shape jnp:
  - GT warp from the pair homography with in-bounds mask
    (`robust_loss.py:9-42`, the (n-1) corner-aligned pixel convention);
  - BCE on certainty logits vs the in-bounds mask (`:78`);
  - generalized Charbonnier regression `cs^a * ((epe/cs)^2 + 1)^(a/2)` on
    pixels with gt prob > 0.99 (`:81-82`), α and c from config;
  - per-iteration decay `iteration_base^(n_itr - itr)` (`:78,82`);
  - fine-scale gating: zero supervision where the previous scale's EPE
    (nearest-exact upsampled) exceeds `2/im_size * local_dist[scale] * scale`
    (`:117-120`);
  - PCK@0.5 telemetry per scale (`:72-75`).

The reference's data-dependent boolean indexing (`epe[prob > 0.99]`) becomes
masked means: sum(mask * v) / max(sum(mask), 1) — identical value, static
shape, and the mean-of-accumulated-vectors over iterations equals the sum of
per-iteration masked means because the mask is iteration-invariant.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from gfnet_tpu.core.geometry import normalized_grid, transform_points
from gfnet_tpu.ops.resize import interpolate

Array = jax.Array


def gt_warp_from_homography(
    H_s2t: Array, src_hw: tuple[int, int], tgt_hw: tuple[int, int], grid_hw: tuple[int, int]
) -> tuple[Array, Array]:
    """GT normalized warp + in-bounds probability (ref `robust_loss.py:9-42`).

    H_s2t: (B, 3, 3) mapping source pixels → target pixels in the
    corner-aligned (n-1) convention the reference uses.
    Returns x2_n (B, gh, gw, 2) and prob (B, gh, gw).
    """
    b = H_s2t.shape[0]
    gh, gw = grid_hw
    x1_n = normalized_grid(gh, gw).reshape(1, gh * gw, 2)
    x1_n = jnp.broadcast_to(x1_n, (b, gh * gw, 2))
    # ref uses img_src.shape[2]-1 (= h-1) as the scale for both axes (`:25`)
    s_src = src_hw[0] - 1
    x1 = (x1_n + 1) * s_src * 0.5
    x2 = transform_points(H_s2t, x1)
    s_tgt = tgt_hw[0] - 1
    x2_n = (x2 / s_tgt) * 2 - 1
    x2_n = x2_n.reshape(b, gh, gw, 2)
    inb = jnp.logical_and(x2_n < 1, x2_n > -1)
    prob = (jnp.sum(inb, axis=-1) == 2).astype(jnp.float32)
    return x2_n, prob


def _masked_mean(v: Array, mask: Array) -> Array:
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(v * mask) / denom


@dataclasses.dataclass(frozen=True)
class RobustLoss:
    """Callable loss over corresps pyramids (ref `RobustLosses`, train-time
    hyperparameters from `train.py:98-106`)."""

    ce_weight: float = 0.01
    alpha: float = 0.5
    c: float = 1e-4
    iteration_base: float = 1.0
    local_largest_scale: int = 8
    local_dist: Any = None  # {1:4, 2:4, 4:8, 8:8}
    im_size: int = 448

    def __call__(
        self, corresps: dict, H_s2t: Array, src_hw: tuple[int, int], tgt_hw: tuple[int, int]
    ) -> tuple[Array, dict[str, Array]]:
        local_dist = self.local_dist or {1: 4, 2: 4, 4: 8, 8: 8}
        tot = 0.0
        metrics: dict[str, Array] = {}
        prev_epe = None
        for scale_str in corresps.keys():
            scale = int(scale_str)
            itrs = sorted(corresps[scale_str].keys())
            flow0 = corresps[scale_str][itrs[0]]["flow"]
            b, gh, gw, _ = flow0.shape
            x2, prob = gt_warp_from_homography(H_s2t, src_hw, tgt_hw, (gh, gw))

            if self.local_largest_scale >= scale and prev_epe is not None:
                gate = interpolate(prev_epe[..., None], (gh, gw), "nearest-exact")[..., 0]
                prob = prob * (
                    gate < (2 / self.im_size) * (local_dist[scale] * scale)
                ).astype(prob.dtype)

            ce_loss = 0.0
            reg_loss = 0.0
            n_itr = len(itrs)
            sup_mask = (prob > 0.99).astype(jnp.float32)
            cs = self.c * scale
            a = self.alpha
            for itr in itrs:
                flow = corresps[scale_str][itr]["flow"].astype(jnp.float32)
                cert = corresps[scale_str][itr]["certainty"].astype(jnp.float32)
                epe = jnp.linalg.norm(flow - x2, axis=-1)  # (B, gh, gw)
                decay = self.iteration_base ** (n_itr - itr)
                bce = optax_sigmoid_bce(cert[..., 0], prob)
                ce_loss = ce_loss + decay * jnp.mean(bce)
                charb = cs**a * ((epe / cs) ** 2 + 1.0) ** (a / 2)
                reg_loss = reg_loss + decay * _masked_mean(charb, sup_mask)
                if itr == n_itr:
                    num_px = self.im_size / scale
                    pck = _masked_mean((epe < 0.5 * (2 / num_px)).astype(jnp.float32), sup_mask)
                    metrics[f"train_pck_05_scale_{scale}"] = pck
                    prev_epe = jax.lax.stop_gradient(epe)

            metrics[f"certainty_loss_{scale}"] = ce_loss
            metrics[f"regression_loss_{scale}"] = reg_loss
            tot = tot + self.ce_weight * ce_loss + reg_loss
        metrics["total_loss"] = tot
        return tot, metrics


def optax_sigmoid_bce(logits: Array, labels: Array) -> Array:
    """binary_cross_entropy_with_logits, numerically stable."""
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
