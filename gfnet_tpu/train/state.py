"""Train state + optimizer, replicating the reference's training dynamics.

Reference recipe (`train.py:107-119`, `trainer/train.py:29-64`):
  AdamW, weight decay 0.01, lr = global_batch * 1e-4 / 8, cosine annealing
  stepped once per k-step chunk (k = 25000 / global_batch), global grad-norm
  clip at 0.01 applied before the optimizer step.

The fp16 GradScaler (+ its floor-at-1 quirk, `trainer/train.py:40-41`) has no
TPU equivalent need: compute runs in bf16 whose exponent range matches f32,
so no loss scaling is used — this replicates the *semantics* (no skipped
steps at scale 1) rather than the fp16 workaround.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from gfnet_tpu.config import TrainConfig

Array = jax.Array


class TrainState(struct.PyTreeNode):
    step: Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=new_batch_stats,
            opt_state=new_opt,
        )


def make_lr_schedule(cfg: TrainConfig, global_batch: int) -> optax.Schedule:
    """Cosine annealing over chunk epochs (ref `train.py:111`,
    `trainer/train.py:63`: scheduler steps once per k-step chunk)."""
    base_lr = cfg.lr_per_sample * global_batch
    k = max(cfg.ckpt_every_pairs // global_batch, 1)
    total_epochs = max(cfg.total_pairs // (k * global_batch), 1)

    def schedule(step):
        epoch = jnp.minimum(step // k, total_epochs)
        return base_lr * 0.5 * (1 + jnp.cos(jnp.pi * epoch / total_epochs))

    return schedule


def make_optimizer(cfg: TrainConfig, global_batch: int) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip_norm),  # ref trainer/train.py:36
        optax.adamw(
            make_lr_schedule(cfg, global_batch),
            b1=0.9,
            b2=0.999,
            eps=1e-8,
            weight_decay=cfg.weight_decay,
        ),
    )


def create_train_state(head_vars: Any, cfg: TrainConfig, global_batch: int) -> TrainState:
    tx = make_optimizer(cfg, global_batch)
    params = head_vars["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=head_vars.get("batch_stats", {}),
        opt_state=tx.init(params),
        tx=tx,
    )
