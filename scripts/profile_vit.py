"""Component-level timing of the frozen ViT-L backbone on device.

Per-dispatch tunnel overhead (~1.4ms) swamps single-op timings, so every
component is looped x24 inside ONE jit via lax.scan (carry threaded through
the op to serialize iterations).

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_vit.py
"""

from __future__ import annotations

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


def scan24(op):
    def run(x):
        def body(h, _):
            return op(h), None

        out, _ = jax.lax.scan(body, x, None, length=24)
        return out

    return jax.jit(run)


def main():
    import flax.linen as nn

    from gfnet_tpu.ops.attention import fused_attention, scaled_dot_product_attention

    rng = np.random.default_rng(0)
    B, D, H, F = 2, 1024, 16, 4096
    hd = D // H

    bf = lambda a: jnp.asarray(a.astype(np.float32)).astype(jnp.bfloat16)
    wqkv = bf(rng.normal(0, 0.02, (D, 3 * D)))
    wproj = bf(rng.normal(0, 0.02, (D, D)))
    w1 = bf(rng.normal(0, 0.02, (D, F)))
    w2 = bf(rng.normal(0, 0.02, (F, D)))
    ln_vars = {"params": {"scale": jnp.ones((D,)), "bias": jnp.zeros((D,))}}
    ln = nn.LayerNorm(epsilon=1e-6, dtype=jnp.bfloat16)

    for N in (1025, 1601):
        x = bf(rng.normal(0, 1, (B, N, D)))

        def attn_op(fa):
            def op(h):
                a = (h @ wqkv).reshape(B, N, 3, H, hd)
                o = fa(a[:, :, 0], a[:, :, 1], a[:, :, 2])
                return o.reshape(B, N, D) @ wproj

            return op

        ops = {
            "qkv(x@3D)": lambda h: (h @ wqkv)[..., :D],
            "proj": lambda h: h @ wproj,
            "mlp_erf": lambda h: jax.nn.gelu(h @ w1, approximate=False) @ w2,
            "mlp_tanh": lambda h: jax.nn.gelu(h @ w1, approximate=True) @ w2,
            "ln": lambda h: ln.apply(ln_vars, h),
            "qkv+flash+proj": attn_op(fused_attention),
            "qkv+sdpa+proj": attn_op(scaled_dot_product_attention),
        }

        def full_block(h):
            a = (ln.apply(ln_vars, h) @ wqkv).reshape(B, N, 3, H, hd)
            o = fused_attention(a[:, :, 0], a[:, :, 1], a[:, :, 2])
            h = h + o.reshape(B, N, D) @ wproj
            m = jax.nn.gelu(ln.apply(ln_vars, h) @ w1, approximate=False) @ w2
            return h + m

        ops["full_block"] = full_block

        print(f"N={N} (ms per single op, from x24-scan):", flush=True)
        for k, op in ops.items():
            f = scan24(op)
            t = timed(partial(f, x)) / 24 * 1e3
            print(f"  {k:<16} {t:7.3f}", flush=True)


if __name__ == "__main__":
    main()
