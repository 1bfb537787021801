"""ViT attention variants at the flagship shapes: flash block sizes vs SDPA.

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_attn.py
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def fetch(out):
    return np.asarray(jnp.sum(jax.tree_util.tree_leaves(out)[0]))


def timed(fn, iters=30, warmup=3):
    for _ in range(warmup):
        out = fn()
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    fetch(out)
    return (time.perf_counter() - t0) / iters


def flash(q, k, v, blk):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention,
    )

    b, n, h, d = q.shape
    np_ = -(-n // blk) * blk
    pad = lambda x: jnp.pad(x, ((0, 0), (0, np_ - x.shape[1]), (0, 0), (0, 0)))
    qp = jnp.moveaxis(pad(q), 1, 2)
    kp = jnp.moveaxis(pad(k), 1, 2)
    vp = jnp.moveaxis(pad(v), 1, 2)
    seg = (jnp.arange(np_) < n).astype(jnp.int32)[None].repeat(b, 0)
    m = min(blk, np_)
    bs = BlockSizes(
        block_q=m, block_k_major=m, block_k=m, block_b=1,
        block_q_major_dkv=m, block_k_major_dkv=m, block_k_dkv=m, block_q_dkv=m,
        block_k_major_dq=m, block_k_dq=m, block_q_dq=m,
    )
    out = flash_attention(
        qp, kp, vp, segment_ids=SegmentIds(q=seg, kv=seg),
        sm_scale=float(d) ** -0.5, block_sizes=bs,
    )
    return jnp.moveaxis(out, 1, 2)[:, :n]


def sdpa(q, k, v):
    from gfnet_tpu.ops.attention import scaled_dot_product_attention

    return scaled_dot_product_attention(q, k, v)


def main():
    rng = np.random.default_rng(0)
    for n in (1025, 1601):
        q, k, v = (
            jnp.asarray(rng.normal(0, 1, (2, n, 16, 64)).astype(np.float32)).astype(jnp.bfloat16)
            for _ in range(3)
        )
        rows = {}
        for blk in (128, 256, 384, 512):
            f = jax.jit(partial(flash, blk=blk))
            rows[f"flash{blk}(pad {-(-n // blk) * blk})"] = timed(lambda: f(q, k, v))
        f = jax.jit(sdpa)
        rows["sdpa"] = timed(lambda: f(q, k, v))
        print(f"N={n}")
        for kk, vv in rows.items():
            print(f"  {kk:<22} {vv * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
