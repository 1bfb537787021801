"""Flash sweep round 2: LARGE equal blocks at tight kv padding.

Round 1 (profile_flash_pad.py) showed block_k=128 kills the kernel; untested
was keeping blocks large (384..832) while shrinking the padded kv length.
The kernel is VPU-softmax-bound, so time should track padded q-rows x padded
kv-rows. q needs no padding (cdiv grid; garbage rows sliced off), kv must be
padded to a multiple of block_k.

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_flash_pad2.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from profile_flash_pad import flash_cfg, scan24, timed  # noqa: E402


def main():
    from gfnet_tpu.ops.attention import fused_attention, scaled_dot_product_attention

    rng = np.random.default_rng(0)
    B, H, D = 2, 16, 64
    cands_by_n = {
        1025: [
            ("current_pad512_blk512", None),
            ("kv1152_q384_k384", dict(kv_mult=384, block_q=384,
                                      block_k_major=384, block_k=384)),
            ("kv1152_q576_k576", dict(kv_mult=576, block_q=576,
                                      block_k_major=576, block_k=576)),
            ("kv1152_q352_k576", dict(kv_mult=576, block_q=352,
                                      block_k_major=576, block_k=576)),
            ("kv1056_q352_k352", dict(kv_mult=352, block_q=352,
                                      block_k_major=352, block_k=352)),
        ],
        1601: [
            ("current_pad512_blk512", None),
            ("kv1664_q416_k416", dict(kv_mult=416, block_q=416,
                                      block_k_major=416, block_k=416)),
            ("kv1664_q832_k832", dict(kv_mult=832, block_q=832,
                                      block_k_major=832, block_k=832)),
            ("kv1664_q544_k832", dict(kv_mult=832, block_q=544,
                                      block_k_major=832, block_k=832)),
            ("kv1608_q536_k536", dict(kv_mult=536, block_q=536,
                                      block_k_major=536, block_k=536)),
        ],
    }
    for N, cands in cands_by_n.items():
        bf = lambda a: jnp.asarray(a.astype(np.float32)).astype(jnp.bfloat16)
        q = bf(rng.normal(0, 1, (B, N, H, D)))
        k = bf(rng.normal(0, 1, (B, N, H, D)))
        v = bf(rng.normal(0, 1, (B, N, H, D)))
        ref = scaled_dot_product_attention(
            q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
        )
        print(f"N={N} (ms per call, from x24-scan):", flush=True)
        for name, kw in cands:
            fn = fused_attention if kw is None else functools.partial(flash_cfg, **kw)
            try:
                out = fn(q, k, v)
                err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
                f = scan24(fn, k, v)
                t = timed(functools.partial(f, q)) / 24 * 1e3
                print(f"  {name:<26} {t:7.3f}  maxerr={err:.2e}", flush=True)
            except Exception as e:
                print(f"  {name:<26} FAILED: {type(e).__name__}: {str(e)[:120]}",
                      flush=True)


if __name__ == "__main__":
    main()
