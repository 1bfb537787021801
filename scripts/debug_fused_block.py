"""Minimal hardware repro for the fused refine-stack kernel.

Runs the single-call stack kernel on device and checks it against interpret
mode at the same shape.

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/debug_fused_block.py [h] [c]
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np


def main():
    sys.path.insert(0, "tests")
    from test_refine_stack import _make_vars

    from gfnet_tpu.ops.pallas.refine_stack import fused_refine_stack

    h = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    rng = np.random.default_rng(0)
    m, v = _make_vars(c, 8)
    d = jnp.asarray(rng.normal(0, 1, (1, h, h, c)).astype(np.float32))
    run = lambda interp: fused_refine_stack(
        d, v["params"], v["batch_stats"], hidden_blocks=8,
        store_dtype=jnp.bfloat16, interpret=interp,
    )
    got_f, got_c = (np.asarray(a.astype(jnp.float32)) for a in run(False))
    ref_f, ref_c = (np.asarray(a.astype(jnp.float32)) for a in run(True))
    print("flow max abs diff vs interpret:", np.abs(got_f - ref_f).max())
    print("cert max abs diff vs interpret:", np.abs(got_c - ref_c).max())


if __name__ == "__main__":
    main()
