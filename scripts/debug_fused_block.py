"""Minimal hardware repro for the fused refine-block kernel.

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/debug_fused_block.py [h] [c]
"""

from __future__ import annotations

import sys

import jax.numpy as jnp
import numpy as np

from gfnet_tpu.ops.pallas.refine_stack import _PAD, fused_refine_block


def main():
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    b = 1
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.normal(0, 1, (b, h + 2 * _PAD, c, h + 2 * _PAD)).astype(np.float32)
    ).astype(jnp.bfloat16)
    taps = jnp.asarray(rng.normal(0, 0.1, (25, c, 1)).astype(np.float32))
    bias = jnp.asarray(rng.normal(0, 0.1, (c, 1)).astype(np.float32))
    wmat = jnp.asarray(rng.normal(0, 0.1, (c, c)).astype(np.float32))
    pwb = jnp.asarray(rng.normal(0, 0.1, (c, 1)).astype(np.float32))
    out = fused_refine_block(x, taps, bias, wmat, pwb)
    got = np.asarray(out.astype(jnp.float32))
    ref = np.asarray(
        fused_refine_block(x, taps, bias, wmat, pwb, interpret=True).astype(
            jnp.float32
        )
    )
    print("max abs diff vs interpret:", np.abs(got - ref).max())


if __name__ == "__main__":
    main()
