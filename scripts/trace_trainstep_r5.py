"""Trace the flagship train step on the real chip and rank ops.

    PYTHONPATH=/root/repo:$PYTHONPATH [GFNET_S2D=0] \
        python scripts/trace_trainstep_r5.py

Writes /tmp/trace_train_r5 for scripts/trace_top_ops.py-style ranking (the
ranking is printed directly here).
"""

from __future__ import annotations

import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gfnet_tpu.config import ModelConfig, TrainConfig
    from gfnet_tpu.eval.synthetic import train_batch
    from gfnet_tpu.matcher.api import GFNetMatcher
    from gfnet_tpu.train.loss import RobustLoss
    from gfnet_tpu.train.state import create_train_state
    from gfnet_tpu.train.step import make_train_step

    b = int(os.environ.get("AB_BATCH", "8"))
    cfg = ModelConfig()
    m = GFNetMatcher(cfg, seed=0, dtype=jnp.bfloat16)
    step = make_train_step(m, RobustLoss(im_size=cfg.initial_res[0]), mesh=None,
                           freeze=("crossview",))
    state = create_train_state(m.head_vars, TrainConfig(), global_batch=b)
    rng = np.random.default_rng(0)
    batches = [train_batch(rng, b, cfg.initial_res[0], 0.3, 0.25) for _ in range(2)]

    t0 = time.perf_counter()
    state, metrics = step(state, m.vit_params, batches[0])
    np.asarray(metrics["total_loss"])
    print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)

    d = "/tmp/trace_train_r5"
    with jax.profiler.trace(d):
        for i in range(2):
            state, metrics = step(state, m.vit_params, batches[i % 2])
        np.asarray(metrics["total_loss"])
    print("traced", d, flush=True)

    # rank ops inline
    import glob
    import gzip
    import json

    from xprof.convert import raw_to_tool_data as r

    paths = sorted(glob.glob(f"{d}/**/*.xplane.pb", recursive=True))
    data, _ = r.xspace_to_tool_data(paths, "framework_op_stats", {})
    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except OSError:
            pass
        data = data.decode("utf-8", "replace")
    tables = json.loads(data)
    rows = next(t["rows"] for t in tables if isinstance(t, dict) and t.get("rows"))
    out, tot = [], 0.0
    for row in rows:
        c = [x.get("v") for x in row["c"]]
        if c[1] != "Device":
            continue
        tot += c[7]
        out.append((c[7], c[4], c[2], c[3][:90]))
    out.sort(reverse=True)
    print(f"device total self time (2 steps): {tot/1e3:.1f} ms")
    for st, occ, typ, op in out[:45]:
        print(f"{st/1e3:8.2f} ms x{occ:<5} {typ:26} {op}", flush=True)


if __name__ == "__main__":
    main()
