"""GFNet head: cross-view decoding, FPN fusion, coarse-to-fine refinement.

Re-design of `model/network.py:17-283` (GFNet.__init__ / extract_features /
forward). The frozen DINOv2 backbone is *not* a submodule — it lives in its
own param tree (see matcher/api.py), mirroring the reference's list-hiding
trick that keeps it out of checkpoints/DDP (`model/network.py:58`); this head
receives its patch tokens.

Key behaviors preserved:
  - 2B stacking of the two views through shared extractors
    (`network.py:210`), symmetric duplication with swapped roles
    (`network.py:213-222`);
  - coarse grid init: global correlation + softmax expectation at the ViT
    grid (`network.py:251-253`);
  - per-scale ConvRefiner iterations with displacement scaling
    `int(scale)/(4*W0)` (`network.py:257-268`);
  - inference early-zero of converged displacements (`network.py:264-265`);
  - stop-gradient between scales via detached bilinear upsampling
    (`network.py:271-281`);
  - upsample-refinement pass re-entering at scale "8" from pre-computed
    finest corresps (`network.py:223-249`).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from gfnet_tpu.config import ModelConfig
from gfnet_tpu.models.crossview import CrossViewDecoder
from gfnet_tpu.models.fpn import ConvBNAct, FPNDecoder, FPNEncoder
from gfnet_tpu.models.refiner import ConvRefiner
from gfnet_tpu.ops.correlation import corr_volume_flow, corr_volume_flow_sharded
from gfnet_tpu.ops.resize import interpolate

Array = jax.Array

SCALES = ("16", "8", "4", "2", "1")


class GFNet(nn.Module):
    """Trainable matching head (everything except the frozen ViT).

    corr_mesh: optional `jax.sharding.Mesh` enabling the grid-block-sharded
    correlation init (SURVEY §5's long-sequence analogue) — used when the
    forward batch can NOT occupy the mesh's data axis (latency-scaling
    serving of small batches; see `_use_sharded_corr`). Set via
    `GFNetMatcher.shard_for_mesh`.
    """

    cfg: ModelConfig
    dtype: jnp.dtype = jnp.bfloat16
    corr_mesh: Any = None

    def setup(self):
        cfg = self.cfg
        fd = tuple(cfg.encoder.feat_chs)  # coarse→fine (64, 32, 16, 8)
        self.crossview = CrossViewDecoder(
            d_vit=cfg.dino.d_model,
            out_dim=fd[0],
            cfg=cfg.dino.decoder_cfg,
            dtype=self.dtype,
        )
        self.encoder = FPNEncoder(feat_chs=fd[::-1], dtype=self.dtype)
        self.fpn_decoder = FPNDecoder(feat_chs=fd[::-1], dtype=self.dtype)
        self.merge_layer = ConvBNAct(fd[0], 3, act="swish", conv_bias=True, dtype=self.dtype)

        # Refiner channel bookkeeping (ref `model/network.py:77-155`).
        feat_at_scale = {"16": fd[0], "8": fd[0], "4": fd[1], "2": fd[2], "1": fd[3]}
        refiners = {}
        for i, scale in enumerate(SCALES):
            r = cfg.matcher.radius[i]
            k = (2 * r + 1) ** 2 if r > 0 else 0
            hidden = 2 * feat_at_scale[scale] + cfg.matcher.displacement_dim[i] + k
            refiners[scale] = ConvRefiner(
                hidden_dim=hidden,
                displacement_dim=cfg.matcher.displacement_dim[i],
                radius=r,
                dtype=self.dtype,
            )
        self.refiners = refiners

    def _fpn_s2d(self, h: int, w: int, n_images: int, train: bool) -> bool:
        """Phase-packed FPN front-end gate (ops/s2d.py). Default: batched
        inference on TPU — measured on v5e the packed path saves ~3 ms/pair
        at B=8 but loses ~2 ms/pair at B=1 (the H/4-grid convs underutilize
        at 2 images), so it engages from 8 stacked images up. GFNET_FPN_S2D=1
        forces it for any divisible shape (CPU equivalence tests + A/Bs),
        =0 hard-disables. Training keeps the plain path until the packed
        backward is measured (r4 lesson: s2d-in-training regressed)."""
        flag = os.environ.get("GFNET_FPN_S2D")
        if flag == "0":
            return False
        ok = h % 4 == 0 and w % 4 == 0
        if flag == "1":
            return ok
        return (
            ok and not train and n_images >= 8
            and jax.default_backend() in ("tpu", "axon")
        )

    def _use_sharded_corr(self, f_shape) -> bool:
        """Route the coarse init through the sharded kernel when the batch
        axis leaves the mesh idle (B' not mesh-divisible): batch sharding is
        the better parallelism whenever it applies, grid sharding is the
        latency-mode fallback that still cuts the score memory d-fold."""
        if self.corr_mesh is None:
            return False
        d = self.corr_mesh.size
        b_prime, gh, gw = f_shape[0], f_shape[1], f_shape[2]
        return b_prime % d != 0 and (gh * gw) % d == 0

    def extract_features(
        self, x: Array, vit_tokens: Array, grid_hw: tuple[int, int],
        upsample: bool = False, train: bool = False,
    ) -> tuple[dict, dict]:
        """Build the two per-view 5-level pyramids (ref `network.py:156-201`).

        x: (2B, H, W, 3) stacked [view-A; view-B] images.
        vit_tokens: (2B, gh*gw, d_vit) frozen backbone patch tokens.
        """
        twob, h, w, _ = x.shape
        b = twob // 2
        vit0, vit1 = self.crossview(vit_tokens[:b], vit_tokens[b:], grid_hw)
        vit_feat = jnp.concatenate([vit0, vit1], axis=0).astype(jnp.float32)

        c8 = (h // 8, w // 8)
        vit_up = interpolate(vit_feat, c8, "bilinear", False)
        fpn_s2d = self._fpn_s2d(h, w, twob, train)
        conv01, conv11, conv21, conv31 = self.encoder(x, train, s2d=fpn_s2d)
        merged = self.merge_layer(
            jnp.concatenate([conv31, vit_up.astype(conv31.dtype)], axis=-1), train
        )
        conv31 = conv31 + merged
        feat1, feat2, feat3, feat4 = self.fpn_decoder(
            conv01, conv11, conv21, conv31, train, s2d=fpn_s2d
        )

        pyr = {"16": vit_feat, "8": feat1, "4": feat2, "2": feat3, "1": feat4}
        f_q = {s: t[:b] for s, t in pyr.items()}
        f_s = {s: t[b:] for s, t in pyr.items()}
        if upsample:
            del f_q["16"], f_s["16"]
        return f_q, f_s

    def __call__(
        self,
        im_A: Array,
        im_B: Array,
        vit_tokens: Array,
        symmetric: bool = False,
        upsample: bool = False,
        scale_factor: float = 1.0,
        pre_flow: Array | None = None,
        pre_certainty: Array | None = None,
        train: bool = False,
        num_grid_override: tuple[int, ...] | None = None,
    ) -> dict[str, dict[int, dict[str, Array]]]:
        """Coarse-to-fine forward (ref `network.py:203-283`).

        Returns corresps[scale][itr] = {"flow": (B', G, G, 2),
        "certainty": (B', G, G, 1)} with B' = 2B when symmetric.
        """
        cfg = self.cfg
        b, h0, w0, _ = im_A.shape
        x = jnp.concatenate([im_A, im_B], axis=0)
        gh, gw = h0 // cfg.dino.patch_size, w0 // cfg.dino.patch_size
        if train:
            # Rematerialize the whole feature extraction for backward: the
            # FPN runs at full resolution with 8-16 channel f32/bf16 maps
            # that XLA lane-pads up to 16x — saving every conv input for the
            # backward pass OOMs a 16 GB chip at flagship shapes. Recompute
            # costs one extra extractor forward; only the 5-level pyramid
            # (needed downstream anyway) is kept live.
            features0, features1 = nn.remat(
                lambda mod, xx, tt: mod.extract_features(
                    xx, tt, (gh, gw), upsample=upsample, train=True
                )
            )(self, x, vit_tokens)
        else:
            features0, features1 = self.extract_features(
                x, vit_tokens, (gh, gw), upsample=upsample, train=train
            )
        # canonical coarse->fine order — dict order is NOT stable here
        # (nn.remat round-trips returns through pytrees, which sort keys)
        scales = [s for s in SCALES if s in features0]
        if symmetric:
            features0, features1 = (
                {s: jnp.concatenate([features0[s], features1[s]], 0) for s in scales},
                {s: jnp.concatenate([features1[s], features0[s]], 0) for s in scales},
            )

        if upsample:
            num_grid = num_grid_override
            num_itr = cfg.matcher.num_itr[-len(scales):]
        else:
            num_grid = cfg.matcher.num_grid
            num_itr = cfg.matcher.num_itr
        assert num_grid is not None and len(num_grid) == len(scales)

        corresps: dict[str, Any] = {}
        flow = certainty = None
        for idx, scale in enumerate(scales):
            f0, f1 = features0[scale], features1[scale]
            g = num_grid[idx]
            if idx == 0:
                if upsample:
                    assert pre_flow is not None and pre_certainty is not None
                    flow = interpolate(pre_flow, (g, g), "bilinear", False)
                    certainty = interpolate(pre_certainty, (g, g), "bilinear", False)
                elif self._use_sharded_corr(f0.shape):
                    # grid-block-sharded init: each device holds an N1/d slice
                    # of target cells + scores, combined by a flash-style
                    # distributed softmax expectation over ICI.
                    flow = corr_volume_flow_sharded(f0, f1, self.corr_mesh)
                    certainty = jnp.zeros(flow.shape[:-1] + (1,), flow.dtype)
                else:
                    flow = corr_volume_flow(f0, f1)  # (B', g, g, 2)
                    certainty = jnp.zeros(flow.shape[:-1] + (1,), flow.dtype)

            corresps[scale] = {}
            displacement_pre = jnp.zeros_like(flow) + 1e-7
            for itr in range(num_itr[idx]):
                if train:
                    # Per-scale remat: drop each refiner's internals (local-
                    # correlation patch gathers, block activations) from the
                    # saved residuals; backward recomputes one refiner at a
                    # time, bounding peak HBM by a single scale.
                    delta_flow, delta_cert = nn.remat(
                        lambda mod, a, b_, fl: mod(
                            a, b_, fl, scale_factor=scale_factor, train=True
                        )
                    )(self.refiners[scale], f0, f1, flow)
                else:
                    delta_flow, delta_cert = self.refiners[scale](
                        f0, f1, flow, scale_factor=scale_factor, train=train
                    )
                displacement = float(int(scale)) * jnp.stack(
                    [delta_flow[..., 0] / (4 * w0), delta_flow[..., 1] / (4 * h0)],
                    axis=-1,
                )
                if not train:
                    rel = jnp.abs(displacement - displacement_pre) / jnp.abs(
                        displacement_pre
                    )
                    displacement = jnp.where(rel < 1e-6, 0.0, displacement)
                flow = flow + displacement
                certainty = certainty + delta_cert
                corresps[scale][itr + 1] = {"flow": flow, "certainty": certainty}
                displacement_pre = displacement

            if scale != "1":
                g_next = num_grid[idx + 1]
                flow = jax.lax.stop_gradient(
                    interpolate(flow, (g_next, g_next), "bilinear", False)
                )
                certainty = jax.lax.stop_gradient(
                    interpolate(certainty, (g_next, g_next), "bilinear", False)
                )
        return corresps
