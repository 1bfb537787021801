"""One-shot attention kernel vs jax flash (current) at ViT-L shapes.

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_oneshot.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def fetch(out):
    return np.asarray(jnp.sum(jax.tree_util.tree_leaves(out)[0]))


def timed(fn, iters=10, warmup=3):
    for _ in range(warmup):
        out = fn()
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    fetch(out)
    return (time.perf_counter() - t0) / iters


def scan24(op, k, v):
    def run(q):
        def body(c, _):
            return op(c, k, v), None

        out, _ = jax.lax.scan(body, q, None, length=24)
        return out

    return jax.jit(run)


def main():
    from gfnet_tpu.ops.attention import fused_attention, scaled_dot_product_attention
    from gfnet_tpu.ops.pallas.oneshot_attention import oneshot_attention

    rng = np.random.default_rng(0)
    B, H, D = 2, 16, 64
    for N in (1025, 1601):
        bf = lambda a: jnp.asarray(a.astype(np.float32)).astype(jnp.bfloat16)
        q = bf(rng.normal(0, 1, (B, N, H, D)))
        k = bf(rng.normal(0, 1, (B, N, H, D)))
        v = bf(rng.normal(0, 1, (B, N, H, D)))
        ref = scaled_dot_product_attention(
            q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
        )
        def flash(q, k, v):
            import os

            os.environ["GFNET_ATTN_IMPL"] = "flash"
            try:
                return fused_attention(q, k, v)
            finally:
                os.environ.pop("GFNET_ATTN_IMPL", None)

        cands = {
            "flash_pad512_blk512": flash,
            "oneshot_q256": functools.partial(oneshot_attention, block_q=256),
            "oneshot_q512": functools.partial(oneshot_attention, block_q=512),
            "oneshot_q832": functools.partial(oneshot_attention, block_q=832),
            "oneshot_q1088": functools.partial(oneshot_attention, block_q=1088),
            "oneshot_q1664": functools.partial(oneshot_attention, block_q=1664),
        }
        print(f"N={N} (ms per call, from x24-scan):", flush=True)
        for name, fn in cands.items():
            try:
                out = fn(q, k, v)
                err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
                f = scan24(fn, k, v)
                t = timed(functools.partial(f, q)) / 24 * 1e3
                print(f"  {name:<22} {t:7.3f}  maxerr={err:.2e}", flush=True)
            except Exception as e:
                print(f"  {name:<22} FAILED: {type(e).__name__}: {str(e)[:140]}",
                      flush=True)


if __name__ == "__main__":
    main()
