"""Multi-process `--multihost` smoke on localhost CPU (VERDICT r1 item 8).

Launches 2 separate processes (2 virtual CPU devices each → a 4-device global
mesh) through the REAL training entry point (`gfnet_tpu.cli.train
--multihost`): `jax.distributed.initialize` bootstrap, per-process file-list
sharding, `make_array_from_process_local_data` batch assembly, psum gradient
reduction across processes, rank-coordinated orbax checkpointing. This is the
bootstrap the reference gets from torchrun + init_process_group
(`train.py:21-28`), exercised beyond a single process.

  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/multihost_smoke.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

import numpy as np


def make_train_tree(root: str, n_images: int = 4) -> None:
    """Mini googlemap-style train layout (ref dataset dir convention)."""
    import cv2
    from PIL import Image

    rng = np.random.default_rng(0)
    for sub in ("map", "satellite"):
        os.makedirs(os.path.join(root, "train", "GoogleMap", sub), exist_ok=True)
    n = 200
    for i in range(n_images):
        img = np.zeros((n, n, 3), np.float32)
        for octave, wgt in ((4, 0.5), (16, 0.5)):
            low = rng.uniform(0, 1, (octave, octave, 3)).astype(np.float32)
            img += wgt * cv2.resize(low, (n, n), interpolation=cv2.INTER_CUBIC)
        img = (255 * (img - img.min()) / (img.max() - img.min())).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(root, "train", "GoogleMap", "map", f"{i}.jpg"))
        Image.fromarray((img * 0.8).astype(np.uint8)).save(
            os.path.join(root, "train", "GoogleMap", "satellite", f"{i}.jpg")
        )


def main() -> int:
    nproc = 2
    port = int(os.environ.get("GFNET_SMOKE_PORT", "12765"))
    tmp = tempfile.mkdtemp(prefix="gfnet_multihost_")
    make_train_tree(tmp)
    ws = os.path.join(tmp, "workspace")

    procs = []
    for pid in range(nproc):
        env = dict(os.environ)
        env.update(
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            GFNET_COORDINATOR=f"localhost:{port}",
            GFNET_NUM_PROCESSES=str(nproc),
            GFNET_PROCESS_ID=str(pid),
            PYTHONPATH="/root/repo:" + env.get("PYTHONPATH", ""),
        )
        cmd = [
            sys.executable, "-m", "gfnet_tpu.cli.train",
            "--tiny", "--multihost", "--dataset", "googlemap",
            "--data_path", tmp, "--workspace", ws,
            "--gpu_batch_size", "2", "--num_workers", "0",
            # global batch 4 → 3 steps total, checkpoint every chunk
            "--total_pairs", "12", "--ckpt_every", "8", "--log_every", "1",
        ]
        procs.append(
            subprocess.Popen(
                cmd, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True, cwd="/root/repo",
            )
        )

    outs = []
    rc = 0
    for i, pr in enumerate(procs):
        out, _ = pr.communicate(timeout=900)
        outs.append(out)
        print(f"===== process {i} (exit {pr.returncode}) =====")
        print("\n".join(out.splitlines()[-12:]))
        rc |= pr.returncode

    ok = rc == 0 and "training complete" in outs[0]
    # rank-coordinated checkpoint must exist and be complete
    ckpt_dirs = []
    exp = os.path.join(ws, "googlemap")
    if os.path.isdir(exp):
        ckpt_dirs = [d for d in os.listdir(exp) if d.startswith("step_")]
    ok = ok and len(ckpt_dirs) >= 1
    print(json.dumps({"multihost_smoke_ok": ok, "ckpts": sorted(ckpt_dirs)}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
