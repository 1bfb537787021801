"""flash_attention (current, blk512) vs splash attention at ViT-L shapes.

Each candidate runs x24 inside one jit (scan) to amortize tunnel dispatch.
Splash gets a pad-aware NumpyMask so numerics match (checked vs current) and
fully-masked pad blocks are skipped by its mask-info precomputation.

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_splash.py
"""

from __future__ import annotations

import math
import time
from functools import partial

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
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk,
    )
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_mask as sm,
    )

    from gfnet_tpu.ops.attention import fused_attention

    rng = np.random.default_rng(0)
    B, H, D = 2, 16, 64
    for N in (1025, 1601):
        sh = (B, N, H, D)
        bf = lambda: jnp.asarray(rng.normal(0, 1, sh).astype(np.float32)).astype(jnp.bfloat16)
        q, k, v = bf(), bf(), bf()
        base_out = None
        rows = {}

        f0 = scan24(fused_attention, k, v)
        rows["flash512(cur)"] = timed(partial(f0, q)) / 24 * 1e3
        base_out = fused_attention(q, k, v)

        scale = D**-0.5

        def mk_splash(bq, bkv, npad):
            valid = np.zeros((npad,), bool)
            valid[:N] = True
            m = valid[:, None] & valid[None, :]
            # pad q rows must attend to SOMETHING or splash skips them (fine —
            # their output is dropped anyway); a fully-false row is allowed.
            mask = sm.MultiHeadMask([sm.NumpyMask(m) for _ in range(H)])
            bs = sk.BlockSizes(
                block_q=bq, block_kv=bkv, block_kv_compute=bkv,
                block_q_dkv=bq, block_kv_dkv=bkv, block_kv_dkv_compute=bkv,
                block_q_dq=bq, block_kv_dq=bkv,
            )
            kern = sk.make_splash_mha_single_device(mask=mask, block_sizes=bs)

            def op(q, k, v):
                def one(q1, k1, v1):
                    return kern(q1 * scale, k1, v1)

                pad = lambda x: jnp.pad(
                    jnp.moveaxis(x, 1, 2), ((0, 0), (0, 0), (0, npad - N), (0, 0))
                )
                out = jax.vmap(one)(pad(q), pad(k), pad(v))
                return jnp.moveaxis(out, 1, 2)[:, :N]

            return op

        for bq, bkv in ((512, 512), (256, 512), (512, 256), (256, 256), (128, 512), (1024, 1024)):
            l = math.lcm(bq, bkv)
            npad = -(-N // l) * l
            tag = f"splash{bq}x{bkv}(pad{npad})"
            try:
                op = mk_splash(bq, bkv, npad)
                f = scan24(op, k, v)
                rows[tag] = timed(partial(f, q)) / 24 * 1e3
                d = float(jnp.max(jnp.abs(
                    op(q, k, v).astype(jnp.float32) - base_out.astype(jnp.float32))))
                rows[tag] = (rows[tag], d)
            except Exception as e:  # noqa: BLE001
                rows[tag] = f"FAIL {type(e).__name__}: {str(e)[:90]}"

        print(f"N={N}:", flush=True)
        for kk, vv in rows.items():
            if isinstance(vv, tuple):
                print(f"  {kk:<24} {vv[0]:7.3f}ms  maxdiff {vv[1]:.2e}", flush=True)
            elif isinstance(vv, str):
                print(f"  {kk:<24} {vv}", flush=True)
            else:
                print(f"  {kk:<24} {vv:7.3f}ms", flush=True)


if __name__ == "__main__":
    main()
