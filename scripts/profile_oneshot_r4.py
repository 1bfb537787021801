"""Round-4 oneshot attention sweep at the ViT shapes (N=1025, 1601).

Device-time measurement: LOOPS the kernel inside one jit with a data
dependency (output feeds the next query), so tunnel RTT amortizes over
LOOP iterations.
"""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from gfnet_tpu.ops.pallas.oneshot_attention import oneshot_attention
from gfnet_tpu.ops.attention import scaled_dot_product_attention

LOOP = 50


def bench(attn, q, k, v, iters=3):
    @jax.jit
    def run(q):
        def body(i, q):
            return attn(q, k, v).astype(q.dtype)

        return jax.lax.fori_loop(0, LOOP, body, q)

    np.asarray(run(q)[0, 0, 0])  # compile+warm
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(run(q)[0, 0, 0])
    return (time.perf_counter() - t0) / (iters * LOOP)


rng = np.random.default_rng(0)
for n in (1025, 1601):
    b, h, d = 2, 16, 64
    mk = lambda: jnp.asarray(
        rng.normal(0, 1, (b, n, h, d)).astype(np.float32)
    ).astype(jnp.bfloat16)
    q, k, v = mk(), mk(), mk()
    flops = 4 * n * n * d * h * b

    t = bench(scaled_dot_product_attention, q, k, v)
    print(f"N={n}: sdpa-einsum          {t*1e3:7.3f} ms  {flops/t/1e12:5.1f} TF/s", flush=True)

    for blk in (None, -(-n // 8) * 8, 512, 256):
        t = bench(partial(oneshot_attention, block_q=blk), q, k, v)
        print(f"N={n}: oneshot blk={str(blk):>5} {t*1e3:7.3f} ms  {flops/t/1e12:5.1f} TF/s", flush=True)
