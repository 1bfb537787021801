"""A/B flash-attention padding/block-size configs at ViT-L shapes.

The flash kernel's grid is cdiv over q (a partial final q block computes
garbage rows that are discarded on the slice-back), so q needs NO padding;
only kv must be padded to a multiple of block_k. The current fused_attention
pads BOTH to a multiple of 512 (1025->1536, 1601->2048) — up to 2.25x padded
FLOPs. This sweep measures real alternatives, x24 inside one jit (scan) to
amortize tunnel dispatch.

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_flash_pad.py
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


def flash_cfg(q, k, v, *, kv_mult, block_q, block_k_major, block_k):
    """q,k,v (B, N, H, D). kv padded to a multiple of kv_mult; q unpadded."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    b, n, h, d = q.shape
    nk = k.shape[1]
    npk = -(-nk // kv_mult) * kv_mult
    kp = jnp.pad(k, ((0, 0), (0, npk - nk), (0, 0), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, npk - nk), (0, 0), (0, 0)))
    qp = jnp.moveaxis(q, 1, 2)
    kp = jnp.moveaxis(kp, 1, 2)
    vp = jnp.moveaxis(vp, 1, 2)
    seg_q = jnp.ones((b, n), jnp.int32)
    seg_kv = (jnp.arange(npk) < nk).astype(jnp.int32)[None].repeat(b, 0)
    bs = BlockSizes(
        block_q=min(block_q, n),
        block_k_major=min(block_k_major, npk),
        block_k=min(block_k, npk),
        block_b=1,
        block_q_major_dkv=min(block_q, n),
        block_k_major_dkv=min(block_k_major, npk),
        block_k_dkv=min(block_k, npk),
        block_q_dkv=min(block_q, n),
        block_k_major_dq=min(block_k_major, npk),
        block_k_dq=min(block_k, npk),
        block_q_dq=min(block_q, n),
    )
    out = flash_attention(
        qp, kp, vp, segment_ids=SegmentIds(q=seg_q, kv=seg_kv),
        sm_scale=float(d**-0.5), block_sizes=bs,
    )
    return jnp.moveaxis(out, 1, 2)


def scan24(op, k, v):
    def run(q):
        def body(c, _):
            o = op(c, k, v)
            return o, None

        out, _ = jax.lax.scan(body, q, None, length=24)
        return out

    return jax.jit(run)


def main():
    from gfnet_tpu.ops.attention import fused_attention, scaled_dot_product_attention

    rng = np.random.default_rng(0)
    B, H, D = 2, 16, 64
    for N in (1025, 1601):
        bf = lambda a: jnp.asarray(a.astype(np.float32)).astype(jnp.bfloat16)
        q = bf(rng.normal(0, 1, (B, N, H, D)))
        k = bf(rng.normal(0, 1, (B, N, H, D)))
        v = bf(rng.normal(0, 1, (B, N, H, D)))

        cands = {
            "current_pad512_blk512": lambda q_, k_, v_: fused_attention(q_, k_, v_),
            "kv128_q512_km512_k128": functools.partial(
                flash_cfg, kv_mult=128, block_q=512, block_k_major=512, block_k=128
            ),
            "kv128_q512_kmFull_k128": None,  # set below (full = padded kv len)
            "kv128_q256_km256_k128": functools.partial(
                flash_cfg, kv_mult=128, block_q=256, block_k_major=256, block_k=128
            ),
            "kv128_q128_km128_k128": functools.partial(
                flash_cfg, kv_mult=128, block_q=128, block_k_major=128, block_k=128
            ),
            "kv256_q512_km256_k256": functools.partial(
                flash_cfg, kv_mult=256, block_q=512, block_k_major=256, block_k=256
            ),
            "kv128_q384_km384_k128": functools.partial(
                flash_cfg, kv_mult=384 if N == 1025 else 128, block_q=384,
                block_k_major=384 if N == 1025 else 128, block_k=128,
            ),
        }
        npk = -(-N // 128) * 128
        cands["kv128_q512_kmFull_k128"] = functools.partial(
            flash_cfg, kv_mult=128, block_q=512, block_k_major=npk, block_k=128
        )

        # reference output for numerics check
        ref = scaled_dot_product_attention(
            q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
        )

        print(f"N={N} (ms per call, from x24-scan):", flush=True)
        for name, fn in cands.items():
            try:
                out = fn(q, k, v)
                err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
                f = scan24(fn, k, v)
                t = timed(functools.partial(f, q)) / 24 * 1e3
                print(f"  {name:<26} {t:7.3f}  maxerr={err:.2e}", flush=True)
            except Exception as e:
                print(f"  {name:<26} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
