"""GFNetMatcher — the user-facing dense matching + homography API.

Covers `GFNet.match` (ref `model/network.py:285-384`), `GFNet.sample`
(`:385-414`) and the estimation pipeline (`estimation.py:46-92`), composed
TPU-first:

  - one jit-compiled graph per (resolution, pass) — the 448 initial pass and
    the 560 upsample-refinement pass are two cached XLA executables
    (multi-resolution under jit, SURVEY.md §7 hard part #4);
  - the frozen DINOv2 runs under stop_gradient in bf16;
  - sampling uses Gumbel top-k (device-side multinomial-without-replacement)
    + blockwise KDE rebalancing;
  - the homography solve is the on-device batched RANSAC+IRLS from
    core/homography (no OpenCV host round-trip).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from gfnet_tpu.config import ModelConfig
from gfnet_tpu.core.geometry import denormalize_corner_aligned, normalized_grid
from gfnet_tpu.core.homography import ransac_homography
from gfnet_tpu.models.gfnet import GFNet
from gfnet_tpu.models.vit import VisionTransformer
from gfnet_tpu.ops.kde import kde
from gfnet_tpu.ops.resize import interpolate

Array = jax.Array

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def imagenet_normalize(x: Array) -> Array:
    """(..., 3) in [0,1] → imagenet-normalized (ref `utils/utils.py:25-26`)."""
    return (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)


def upsample_grid_schedule(upsample_res: tuple[int, int], patch: int = 14) -> tuple[int, ...]:
    """num_grid for the refinement pass (ref `model/network.py:329`)."""
    hs = upsample_res[0]
    g0 = int(hs / patch)
    return (g0, 2 * g0, 4 * g0, 8 * g0)


class GFNetMatcher:
    """Inference/eval driver around the frozen ViT + GFNet head."""

    def __init__(
        self,
        cfg: ModelConfig,
        vit_params: Any | None = None,
        head_vars: Any | None = None,
        seed: int = 0,
        dtype=jnp.bfloat16,
    ):
        self.cfg = cfg
        self.dtype = dtype
        self.mesh = None  # set by shard_for_mesh for multi-chip serving
        self.vit = VisionTransformer(cfg.dino, dtype=dtype)
        self.head = GFNet(cfg, dtype=dtype)
        if vit_params is None or head_vars is None:
            vit_params, head_vars = self.init_params(jax.random.PRNGKey(seed))
        self.vit_params = self._cast_vit_params(vit_params)
        self.head_vars = head_vars  # {"params": ..., "batch_stats": ...}

    def _cast_vit_params(self, params):
        """Store the frozen backbone weights in the compute dtype (bf16):
        halves their HBM traffic per pass. The reference likewise runs the
        frozen DINOv2 in reduced precision at inference (fp16 autocast,
        `model/network.py:165-170`)."""
        cast = lambda x: (
            x.astype(self.dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x
        )
        return jax.tree.map(cast, params)

    def shard_for_mesh(self, mesh, fsdp_vit: bool = False) -> None:
        """Distribute serving over a device mesh (data-parallel inference).

        Params are committed replicated (or FSDP-sharded for the frozen ViT)
        and every raw image batch entering `match`/`estimate_homography*` is
        sharded over the mesh's `data` axis; GSPMD then partitions the whole
        match+sample+solve pipeline, inserting collectives over ICI. This is
        the serving-side analogue of the reference's DDP scaling
        (`train.py:57,62`) — same jitted code runs on 1 chip or a pod.
        """
        from gfnet_tpu.parallel.mesh import (
            batch_sharding,
            fsdp_param_sharding,
            replicated_sharding,
        )

        self.mesh = mesh
        self._batch_sharding = batch_sharding(mesh)
        repl = replicated_sharding(mesh)
        # rebuild the head with the mesh so sub-mesh batches route the coarse
        # init through the grid-block-sharded correlation (GFNet.corr_mesh)
        self.head = GFNet(self.cfg, dtype=self.dtype, corr_mesh=mesh)
        self.head_vars = jax.device_put(self.head_vars, repl)
        if fsdp_vit:
            self.vit_params = jax.tree_util.tree_map(
                jax.device_put,
                self.vit_params,
                fsdp_param_sharding(mesh, self.vit_params),
            )
        else:
            self.vit_params = jax.device_put(self.vit_params, repl)

    def _pad_to_mesh(self, b: int) -> int:
        """Rows to append so a batch of `b` shards evenly over the mesh.

        DDP sidesteps ragged batches with drop_last (`train.py:123-133`);
        serving can't drop requests, so `match` pads the batch by repeating
        the final pair and slices the outputs back to `b` — every B >= mesh
        size runs genuinely batch-sharded instead of silently replicated.
        Batches SMALLER than the mesh aren't padded (padding buys nothing:
        wall time stays one pair's time); they run in latency mode —
        replicated, with the coarse correlation init grid-sharded over the
        mesh instead (GFNet._use_sharded_corr)."""
        if getattr(self, "mesh", None) is None or b < self.mesh.size:
            return 0
        return (-b) % self.mesh.size

    def _place_batch(self, x: Array) -> Array:
        if getattr(self, "mesh", None) is not None and x.shape[0] % self.mesh.size == 0:
            return jax.device_put(x, self._batch_sharding)
        return x

    @classmethod
    def from_pretrained(
        cls,
        conf_path: str | None = None,
        ckpt_path: str | None = None,
        dinov2_npz: str | None = None,
        **kw,
    ) -> "GFNetMatcher":
        """Build a matcher from a reference-format config JSON + checkpoint.

        ckpt_path accepts a reference torch `.pth` (auto-converted), an orbax
        directory, or an .npz; dinov2_npz is the converted backbone (see
        tools/convert_dinov2.py).
        """
        import os

        cfg = ModelConfig.from_json(conf_path) if conf_path else ModelConfig()
        matcher = cls(cfg, **kw)
        if dinov2_npz and os.path.exists(dinov2_npz):
            from gfnet_tpu.models.vit import load_dinov2_params

            matcher.vit_params = matcher._cast_vit_params(
                {"params": load_dinov2_params(dinov2_npz)}
            )
        if ckpt_path:
            from gfnet_tpu.utils.convert import load_head_checkpoint

            matcher.head_vars = load_head_checkpoint(ckpt_path, matcher.head_vars)
        return matcher

    # ------------------------------------------------------------------ init
    def init_params(self, key: Array):
        kv, kh = jax.random.split(key)
        h, w = self.cfg.initial_res
        p = self.cfg.dino.patch_size
        gh, gw = h // p, w // p
        dummy = jnp.zeros((2, h, w, 3), jnp.float32)
        tokens = jnp.zeros((2, gh * gw, self.cfg.dino.d_model), jnp.float32)
        # jit the inits: eager flax init dispatches thousands of tiny ops,
        # which is pathological through the remote-TPU tunnel.
        vit_params = jax.jit(self.vit.init)(kv, dummy)
        head_init = jax.jit(
            lambda k, a, b, t: self.head.init(k, a, b, t, symmetric=False, train=False)
        )
        head_vars = head_init(kh, dummy[:1], dummy[1:], tokens)
        return vit_params, head_vars

    # --------------------------------------------------------------- forward
    def _vit_tokens(self, vit_params: Any, x: Array) -> Array:
        """Frozen backbone tokens for stacked views (2B, H, W, 3).

        vit_params must be threaded as a traced argument — closing over it
        would bake the 1.2 GB ViT-L weights into the serialized XLA program
        (which overflows the remote compiler's upload limit)."""
        p = self.cfg.dino.patch_size
        h, w = x.shape[1], x.shape[2]
        vh, vw = (h // p) * p, (w // p) * p
        if (vh, vw) != (h, w):  # ref `network.py:158-164`
            x = interpolate(x, (vh, vw), "bilinear", False)
        return jax.lax.stop_gradient(self.vit.apply(vit_params, x))

    def forward(
        self,
        head_vars: Any,
        im_A: Array,
        im_B: Array,
        symmetric: bool = False,
        upsample: bool = False,
        scale_factor: float = 1.0,
        pre_flow: Array | None = None,
        pre_certainty: Array | None = None,
        train: bool = False,
        mutable: bool = False,
        vit_params: Any = None,
    ):
        """Full forward: frozen ViT + head. Differentiable through the head."""
        x = jnp.concatenate([im_A, im_B], axis=0)
        tokens = self._vit_tokens(
            self.vit_params if vit_params is None else vit_params, x
        )
        num_grid_override = (
            upsample_grid_schedule(self.cfg.upsample_res, self.cfg.dino.patch_size)
            if upsample
            else None
        )
        kwargs = dict(
            symmetric=symmetric,
            upsample=upsample,
            scale_factor=scale_factor,
            pre_flow=pre_flow,
            pre_certainty=pre_certainty,
            train=train,
            num_grid_override=num_grid_override,
        )
        if mutable:
            return self.head.apply(head_vars, im_A, im_B, tokens, mutable=["batch_stats"], **kwargs)
        return self.head.apply(head_vars, im_A, im_B, tokens, **kwargs)

    # ----------------------------------------------------------------- match
    def _prep_image(self, img, size, mode="bicubic"):
        """Resize + imagenet-normalize, matching the reference eval transform
        exactly: pass 1 uses torchvision Resize BICUBIC, pass 2 BILINEAR
        (`get_tuple_transform_ops` defaults vs the mode=2 call,
        `network.py:293,342`), both antialiased (`utils/utils.py:90`,
        antialias=None ≡ True on tensors in torchvision >= 0.17), and no
        clipping of bicubic overshoot."""
        img = interpolate(img, size, mode, False, antialias=True)
        return imagenet_normalize(img)

    @partial(jax.jit, static_argnums=(0,))
    def _pass1_jit(self, head_vars, vit_params, im_A_raw, im_B_raw):
        """Initial-resolution pass (ref `network.py:285-338`): resize+normalize,
        symmetric forward at `initial_res`, certainty-attenuation prep.

        Compiled separately from the upsample pass so each XLA program stays
        a manageable size (the fused two-pass graph overwhelmed the remote
        compiler for the flagship config)."""
        cfg = self.cfg
        sym = cfg.symmetric
        h_r, w_r = cfg.initial_res
        im0 = self._prep_image(im_A_raw, (h_r, w_r))
        im1 = self._prep_image(im_B_raw, (h_r, w_r))
        corresps = self.forward(head_vars, im0, im1, symmetric=sym, vit_params=vit_params)

        num_itr = cfg.matcher.num_itr
        if cfg.upsample_preds:
            grids_up = upsample_grid_schedule(cfg.upsample_res, cfg.dino.patch_size)
            g_final = grids_up[-1]
        else:
            g_final = cfg.matcher.num_grid[-1]

        low_res_certainty = jnp.zeros_like(
            interpolate(
                corresps["16"][num_itr[0]]["certainty"], (g_final, g_final), "bilinear", False
            )
        )
        if cfg.attenuate_cert:  # ref `network.py:332-338,360`
            low = interpolate(
                corresps["16"][num_itr[0]]["certainty"], (g_final, g_final), "bilinear", False
            )
            low_res_certainty = 0.5 * low * (low < 0)
        finest = corresps["1"][num_itr[-1]]
        return finest["flow"], finest["certainty"], low_res_certainty

    @partial(jax.jit, static_argnums=(0,))
    def _pass2_jit(self, head_vars, vit_params, im_A_raw, im_B_raw, pre_flow, pre_cert,
                   low_res_certainty):
        """Upsample-refinement pass + final warp stitch (ref `network.py:339-384`)."""
        cfg = self.cfg
        sym = cfg.symmetric
        h_r, w_r = cfg.initial_res
        num_itr = cfg.matcher.num_itr
        if cfg.upsample_preds:
            hs, ws = cfg.upsample_res
            grids_up = upsample_grid_schedule(cfg.upsample_res, cfg.dino.patch_size)
            im0u = self._prep_image(im_A_raw, (hs, ws), mode="bilinear")
            im1u = self._prep_image(im_B_raw, (hs, ws), mode="bilinear")
            scale_factor = math.sqrt(hs * ws / (h_r * w_r))
            corresps = self.forward(
                head_vars,
                im0u,
                im1u,
                symmetric=sym,
                upsample=True,
                scale_factor=scale_factor,
                pre_flow=pre_flow,
                pre_certainty=pre_cert,
                vit_params=vit_params,
            )
            g_final = grids_up[-1]
            last_itr = num_itr[-len(grids_up):][-1]
            flow = corresps["1"][last_itr]["flow"]
            certainty = corresps["1"][last_itr]["certainty"]
        else:
            g_final = cfg.matcher.num_grid[-1]
            flow, certainty = pre_flow, pre_cert

        certainty = jax.nn.sigmoid(certainty - low_res_certainty)[..., 0]

        g = g_final
        bprime = flow.shape[0]
        grid = jnp.broadcast_to(normalized_grid(g, g)[None], (bprime, g, g, 2))
        wrong = jnp.any(jnp.abs(flow) > 1, axis=-1)
        certainty = jnp.where(wrong, 0.0, certainty)
        flow = jnp.clip(flow, -1, 1)

        if sym:
            b = bprime // 2
            a_to_b, b_to_a = flow[:b], flow[b:]
            q_warp = jnp.concatenate([grid[:b], a_to_b], axis=-1)
            s_warp = jnp.concatenate([b_to_a, grid[:b]], axis=-1)
            warp = jnp.concatenate([q_warp, s_warp], axis=2)  # along W
            certainty = jnp.concatenate([certainty[:b], certainty[b:]], axis=2)
        else:
            warp = jnp.concatenate([grid, flow], axis=-1)
        return warp, certainty

    def match(self, im_A_raw, im_B_raw):
        """im_*_raw: (H, W, 3) or (B, H, W, 3) float in [0,1]."""
        im_A_raw = jnp.asarray(im_A_raw, jnp.float32)
        im_B_raw = jnp.asarray(im_B_raw, jnp.float32)
        batched = im_A_raw.ndim == 4
        if not batched:
            im_A_raw, im_B_raw = im_A_raw[None], im_B_raw[None]
        b = im_A_raw.shape[0]
        pad = self._pad_to_mesh(b)
        if pad:
            rep = lambda x: jnp.concatenate(
                [x, jnp.broadcast_to(x[-1:], (pad,) + x.shape[1:])], axis=0
            )
            im_A_raw, im_B_raw = rep(im_A_raw), rep(im_B_raw)
        im_A_raw = self._place_batch(im_A_raw)
        im_B_raw = self._place_batch(im_B_raw)
        pre_flow, pre_cert, low = self._pass1_jit(
            self.head_vars, self.vit_params, im_A_raw, im_B_raw
        )
        warp, certainty = self._pass2_jit(
            self.head_vars, self.vit_params, im_A_raw, im_B_raw, pre_flow, pre_cert, low
        )
        if pad:
            warp, certainty = warp[:b], certainty[:b]
        if not batched:
            return warp[0], certainty[0]
        return warp, certainty

    # ---------------------------------------------------------------- sample
    def _sample_core(self, matches: Array, certainty: Array, num: int, key: Array):
        """threshold_balanced sampling (ref `network.py:385-414`).

        matches (N, 4) normalized warps, certainty (N,). Gumbel top-k is the
        device-side equivalent of torch.multinomial(replacement=False).
        Traceable core shared by the single-pair jit and the batched vmap.
        """
        cfg = self.cfg
        if "threshold" in cfg.sample_mode:
            certainty = jnp.where(certainty > cfg.sample_thresh, 1.0, certainty)
        n = certainty.shape[0]
        expansion = 4 if "balanced" in cfg.sample_mode else 1
        k1, k2 = jax.random.split(key)

        def gumbel_topk(weights, kk, kcount):
            import os

            logw = jnp.log(jnp.maximum(weights, 1e-30))
            logw = jnp.where(weights <= 0, -jnp.inf, logw)
            u = jax.random.uniform(kk, weights.shape, minval=1e-20, maxval=1.0)
            g = -jnp.log(-jnp.log(u))
            # approx_max_k: exact top-k with k~20k over ~200k lanes is slow
            # on TPU; the sampled set is random anyway, so 95% recall against
            # the exact Gumbel draw is statistically equivalent (A/B'd on the
            # synthetic benchmark: MACE identical within noise,
            # scripts/ab_sampling.py). GFNET_EXACT_TOPK=1 keeps an exact
            # escape hatch for such A/Bs.
            if os.environ.get("GFNET_EXACT_TOPK") == "1":
                _, idx = jax.lax.top_k(logw + g, kcount)
                return idx
            _, idx = jax.lax.approx_max_k(logw + g, kcount, recall_target=0.95)
            return idx

        n_good = min(expansion * num, n)
        good_idx = gumbel_topk(certainty, k1, n_good)
        good_matches = matches[good_idx]
        good_cert = certainty[good_idx]
        if "balanced" not in cfg.sample_mode:
            return good_matches, good_cert
        density = kde(good_matches, std=0.1)
        p = 1.0 / (density + 1.0)
        p = jnp.where(density < 10, 1e-7, p)
        bal_idx = gumbel_topk(p, k2, min(num, n_good))
        return good_matches[bal_idx], good_cert[bal_idx]

    @partial(jax.jit, static_argnums=(0, 3))
    def _sample_jit(self, matches: Array, certainty: Array, num: int, key: Array):
        return self._sample_core(matches, certainty, num, key)

    def sample(self, matches, certainty, num: int = 5000, key: Array | None = None):
        if key is None:
            key = jax.random.PRNGKey(0)
        m = jnp.asarray(matches).reshape(-1, 4)
        c = jnp.asarray(certainty).reshape(-1)
        return self._sample_jit(m, c, num, key)

    # ----------------------------------------------------------------- solve
    def estimate_homography(
        self,
        im_A_raw,
        im_B_raw,
        num_matches: int = 5000,
        key: Array | None = None,
    ) -> Array:
        """match → sample → on-device robust solve (ref `estimation.py:46-78`).

        Returns H mapping image-A pixel coords to image-B pixel coords at the
        ORIGINAL input resolutions (corner-aligned denormalization, ref
        `estimation.py:26-45`).

        RNG stream note: since the single-dispatch sample+solve unification
        (commit 0d817db) `key` is consumed as `split(key, 1)[0]` then split
        per pair inside the batched jit — the same seed yields different
        (equally valid) matches/H than pre-unification builds.
        """
        if key is None:
            key = jax.random.PRNGKey(0)
        # np.shape reads metadata only — np.asarray(...).shape would pull the
        # whole image device->host first when callers pass device arrays (the
        # bench/serving path), a pointless full-image fetch per call
        hA, wA = np.shape(im_A_raw)[-3:-1]
        hB, wB = np.shape(im_B_raw)[-3:-1]
        warp, certainty = self.match(im_A_raw, im_B_raw)
        # one dispatch for sample + denormalize + robust solve (B=1 of the
        # batched path) instead of separate sample / solve round-trips
        H = self._sample_solve_batched_jit(
            warp[None], certainty[None], num_matches, key,
            (int(hA), int(wA)), (int(hB), int(wB)),
        )
        return H[0]

    @partial(jax.jit, static_argnums=(0, 3, 5, 6))
    def _sample_solve_batched_jit(
        self, warp: Array, certainty: Array, num: int, key: Array,
        hw_a: tuple[int, int], hw_b: tuple[int, int],
    ) -> Array:
        """Per-pair sample+solve vmapped over the batch — one dispatch for B
        pairs instead of 2B (serving-shaped: the tunnel/dispatch overhead per
        jit call is amortized across the batch)."""
        b = warp.shape[0]
        keys = jax.random.split(key, b)

        def per_pair(w, c, k):
            k1, k2 = jax.random.split(k)
            matches, _ = self._sample_core(w.reshape(-1, 4), c.reshape(-1), num, k1)
            pos_a = denormalize_corner_aligned(matches[:, :2], *hw_a)
            pos_b = denormalize_corner_aligned(matches[:, 2:], *hw_b)
            H, _ = ransac_homography(pos_a, pos_b, key=k2)
            return H

        return jax.vmap(per_pair)(warp, certainty, keys)

    def estimate_homography_batched(
        self,
        im_A_raw,
        im_B_raw,
        num_matches: int = 5000,
        key: Array | None = None,
    ) -> Array:
        """Batched `estimate_homography`: (B, H, W, 3) pairs → (B, 3, 3).

        Three jit dispatches total (pass1, pass2, sample+solve) regardless of
        B — the throughput path for serving."""
        if key is None:
            key = jax.random.PRNGKey(0)
        im_A_raw = jnp.asarray(im_A_raw, jnp.float32)
        im_B_raw = jnp.asarray(im_B_raw, jnp.float32)
        if im_A_raw.ndim == 3:
            im_A_raw, im_B_raw = im_A_raw[None], im_B_raw[None]
        hA, wA = im_A_raw.shape[1:3]
        hB, wB = im_B_raw.shape[1:3]
        warp, certainty = self.match(im_A_raw, im_B_raw)
        return self._sample_solve_batched_jit(
            warp, certainty, num_matches, key, (int(hA), int(wA)), (int(hB), int(wB))
        )
