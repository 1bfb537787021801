"""Orbax checkpoint/resume for the training loop.

Replaces `checkpointing/checkpoint.py:16-61` (rank-0 torch.save of
model/optimizer/scheduler/step to `workspace/<name>/latest.pth`) with Orbax:
atomic on-disk checkpoints, sharded-restore capable, process-0 coordination
handled by Orbax itself on multi-host. The frozen ViT stays out of the
checkpoint exactly like the reference's list-hiding trick
(`model/network.py:58`) — only head params/batch_stats/opt_state/step.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp

from gfnet_tpu.train.state import TrainState


class Checkpointer:
    def __init__(self, root: str, name: str):
        self.dir = os.path.abspath(os.path.join(root, name))
        os.makedirs(self.dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    @property
    def latest_path(self) -> str:
        return os.path.join(self.dir, "latest")

    def save(self, state: TrainState) -> None:
        payload = {
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        }
        path = self.latest_path
        tmp = path + ".tmp"
        self._ckptr.save(tmp, payload, force=True)
        self._ckptr.wait_until_finished()
        if os.path.exists(path):
            import shutil

            shutil.rmtree(path)
        os.rename(tmp, path)

    def restore(self, state: TrainState) -> TrainState | None:
        """Auto-resume if a checkpoint exists (ref `train.py:116`)."""
        if not os.path.exists(self.latest_path):
            return None
        template = {
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        }
        restored = self._ckptr.restore(
            self.latest_path, jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, template)
        )
        return state.replace(
            step=restored["step"],
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
        )
