"""Orbax checkpoint/resume for the training loop.

Replaces `checkpointing/checkpoint.py:16-61` (rank-0 torch.save of
model/optimizer/scheduler/step to `workspace/<name>/latest.pth`) with Orbax:
atomic on-disk checkpoints, sharded-restore capable, process-0 coordination
handled by Orbax itself on multi-host. The frozen ViT stays out of the
checkpoint exactly like the reference's list-hiding trick
(`model/network.py:58`) — only head params/batch_stats/opt_state/step.

Saves are crash-safe end to end: each save lands in a fresh versioned
`step_<N>` directory (Orbax itself writes to a tmp name and renames, so a
partially-written directory never carries a final name), and older versions
are pruned only AFTER the new one is fully committed. A kill at any instant
leaves the previous checkpoint restorable.
"""

from __future__ import annotations

import os
import re
import shutil
from typing import Any

import jax
import orbax.checkpoint as ocp

from gfnet_tpu.train.state import TrainState

_STEP_RE = re.compile(r"^step_(\d+)$")


class Checkpointer:
    def __init__(self, root: str, name: str, keep: int = 2):
        self.dir = os.path.abspath(os.path.join(root, name))
        self.keep = max(1, keep)
        os.makedirs(self.dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _step_dirs(self) -> list[tuple[int, str]]:
        out = []
        for entry in os.listdir(self.dir):
            m = _STEP_RE.match(entry)
            if m and os.path.isdir(os.path.join(self.dir, entry)):
                out.append((int(m.group(1)), os.path.join(self.dir, entry)))
        return sorted(out)

    @property
    def latest_path(self) -> str | None:
        """Newest committed checkpoint dir (legacy un-versioned `latest`
        accepted for back-compat), or None."""
        dirs = self._step_dirs()
        if dirs:
            return dirs[-1][1]
        legacy = os.path.join(self.dir, "latest")
        return legacy if os.path.exists(legacy) else None

    def save(self, state: TrainState) -> None:
        step = int(jax.device_get(state.step))
        payload = {
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        }
        path = os.path.join(self.dir, f"step_{step:09d}")
        # Orbax stages into `<path>.orbax-checkpoint-tmp-*` and renames on
        # finalize — the versioned dir appears atomically.
        self._ckptr.save(path, payload, force=True)
        self._ckptr.wait_until_finished()
        # prune only after the new version is committed
        for _, old in self._step_dirs()[: -self.keep]:
            shutil.rmtree(old, ignore_errors=True)
        legacy = os.path.join(self.dir, "latest")
        if os.path.exists(legacy):
            shutil.rmtree(legacy, ignore_errors=True)

    def restore(self, state: TrainState) -> TrainState | None:
        """Auto-resume from the newest checkpoint (ref `train.py:116`)."""
        path = self.latest_path
        if path is None:
            return None
        template = {
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        }
        restored = self._ckptr.restore(
            path, jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, template)
        )
        return state.replace(
            step=restored["step"],
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
        )
