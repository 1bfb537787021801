"""Sharded, jit-compiled training step.

The TPU-native equivalent of `trainer/train.py:29-43` + DDP: one XLA
executable computes forward (frozen ViT in bf16 under stop_gradient),
multi-scale robust loss, backward, global-norm clip, AdamW update, and BN
batch-stat refresh. The batch is sharded over the mesh's `data` axis and
params are replicated, so XLA emits the psum gradient reduction over ICI
where DDP used NCCL allreduce. BatchNorm reductions run over the *global*
batch (cross-replica sync-BN, SURVEY.md §7 hard part #5).
"""

from __future__ import annotations

import os
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from gfnet_tpu.parallel.mesh import batch_sharding, replicated_sharding
from gfnet_tpu.train.loss import RobustLoss
from gfnet_tpu.train.state import TrainState

Array = jax.Array


def make_train_step(
    matcher,
    loss: RobustLoss,
    mesh=None,
    symmetric: bool = False,
    fsdp_vit: bool = False,
    fsdp_min_size: int = 2**16,
    freeze: tuple[str, ...] = (),
    module_clip: dict[str, float] | None = None,
    module_spike_zero: dict[str, float] | None = None,
) -> Callable[[TrainState, Any, dict], tuple[TrainState, dict]]:
    """Build the jitted train step.

    matcher: GFNetMatcher (provides the vit/head modules).
    Training forward runs symmetric=False like the reference's DDP forward
    (`trainer/train.py:31` calls model(batch) with the default).

    Returns step(state, vit_params, batch) -> (state, metrics); batch is a
    dict with im_A/im_B (B, H, W, 3) imagenet-normalized and H_s2t (B, 3, 3).
    """
    head = matcher.head
    vit = matcher.vit
    patch = matcher.cfg.dino.patch_size

    def step_fn(state: TrainState, vit_params, batch):
        # trace-time guard: a typo'd freeze/module_clip name would silently
        # do nothing and re-admit the exploding-gradient regime the flags
        # exist to prevent — fail at compile instead
        unknown = (
            set(freeze) | set(module_clip or ()) | set(module_spike_zero or ())
        ) - set(state.params.keys())
        assert not unknown, f"freeze/module_clip names not in params: {sorted(unknown)}"
        im_a, im_b, H_s2t = batch["im_A"], batch["im_B"], batch["H_s2t"]
        # uint8 transport: loaders may ship raw 8-bit HWC images (4x less
        # host->device traffic — the wall bottleneck through a remote-TPU
        # tunnel, and real datasets are 8-bit anyway, ref ToTensor) and the
        # imagenet normalization happens here on device.
        if im_a.dtype == jnp.uint8:
            mean = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
            std = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)
            norm = lambda t: (t.astype(jnp.float32) / 255.0 - mean) / std
            im_a, im_b = norm(im_a), norm(im_b)
        x = jnp.concatenate([im_a, im_b], axis=0)
        tokens = jax.lax.stop_gradient(vit.apply(vit_params, x))

        def loss_fn(params):
            corresps, mut = head.apply(
                {"params": params, "batch_stats": state.batch_stats},
                im_a,
                im_b,
                tokens,
                symmetric=symmetric,
                train=True,
                mutable=["batch_stats"],
            )
            src_hw = (im_a.shape[1], im_a.shape[2])
            tgt_hw = (im_b.shape[1], im_b.shape[2])
            l, metrics = loss(corresps, H_s2t, src_hw, tgt_hw)
            return l, (metrics, mut["batch_stats"])

        (l, (metrics, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        # NaN/Inf-gradient telemetry (ref `trainer/train.py:21-25`) — from the
        # PRE-freeze grads, so backbone-induced blowups inside a frozen module
        # (the documented crossview 1e10+ spikes) stay observable
        metrics["nonfinite_grad_leaves"] = sum(
            jnp.any(~jnp.isfinite(g)).astype(jnp.int32)
            for g in jax.tree_util.tree_leaves(grads)
        )
        if os.environ.get("GFNET_GRAD_BREAKDOWN") == "1":
            # RAW per-module norms (pre spike-zero/clip/freeze): the
            # stabilizers below overwrite what the post-processing breakdown
            # can show (a capped module always reads exactly its cap)
            for k, sub in grads.items():
                metrics[f"gnorm_raw/{k}"] = optax.global_norm(sub)
        if module_spike_zero:
            # Outlier-step rejection: when a module's grad norm exceeds its
            # threshold the step is a diagnosed garbage spike (crossview
            # 1e10+ under a random backbone) — clipping would still push an
            # lr-sized step in the garbage direction through Adam, so zero
            # the subtree for this step instead; normal steps pass through.
            def zero_spike(sub, thresh):
                norm = optax.global_norm(sub)
                keep = (norm <= thresh).astype(jnp.float32)
                return jax.tree_util.tree_map(lambda g: g * keep, sub)

            grads = {
                k: zero_spike(v, module_spike_zero[k]) if k in module_spike_zero else v
                for k, v in grads.items()
            }
        if module_clip:
            # Per-module gradient clipping, applied BEFORE the recipe's
            # global clip: with a random frozen backbone the cross-view
            # decoder's un-normalized k/v (ref `block.py:322-328`) spike to
            # 1e10+ grad norms, and a single global clip then renormalizes
            # the whole update onto the garbage direction. Capping the
            # offending module's subtree first keeps (a) the other modules'
            # directions intact under the global clip and (b) AdamW's second
            # moments for the module finite — so it can keep LEARNING under
            # appearance gaps instead of being frozen out (VERDICT r4 #3).
            def clip_subtree(sub, cap):
                norm = optax.global_norm(sub)
                scale = jnp.minimum(1.0, cap / (norm + 1e-16))
                return jax.tree_util.tree_map(lambda g: g * scale, sub)

            grads = {
                k: clip_subtree(v, module_clip[k]) if k in module_clip else v
                for k, v in grads.items()
            }
        if freeze:
            # Zero the grads of frozen top-level modules so the global-norm
            # clip reflects only the learners. Used by the synthetic-proxy
            # fine-tune: with a RANDOM frozen backbone the cross-view block's
            # un-normalized k/v (ref `block.py:322-328`) produce 1e10+ grad
            # spikes the reference never sees (it trains from pretrained
            # DINOv2, whose feature scale is benign) — freezing it keeps the
            # clip direction meaningful. AdamW's decoupled weight decay still
            # shrinks frozen params by lr*wd per step (~5e-7), negligible.
            grads = {
                k: jax.tree_util.tree_map(jnp.zeros_like, v) if k in freeze else v
                for k, v in grads.items()
            }
        metrics["grad_norm"] = optax.global_norm(grads)
        metrics["param_norm"] = optax.global_norm(state.params)
        if os.environ.get("GFNET_GRAD_BREAKDOWN") == "1":
            # per-submodule grad norms: locates which component a gradient
            # explosion comes from (diagnostic; a handful of extra reductions)
            for k, sub in grads.items():
                metrics[f"gnorm/{k}"] = optax.global_norm(sub)
        new_state = state.apply_gradients(grads, new_bs)
        return new_state, metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))

    repl = replicated_sharding(mesh)
    bsh = batch_sharding(mesh)
    if fsdp_vit:
        from gfnet_tpu.parallel.mesh import fsdp_param_sharding

        vit_sh = fsdp_param_sharding(mesh, matcher.vit_params, min_size=fsdp_min_size)
    else:
        vit_sh = repl
    return jax.jit(
        step_fn,
        in_shardings=(repl, vit_sh, bsh),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
