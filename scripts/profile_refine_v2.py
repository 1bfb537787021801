"""Runtime A/B: single-call fused refine stack vs the flax block chain.

Times the whole ConvRefiner tail (block1 + 8 hidden + out_conv) at the
e2e-hot shapes, x8 inside one jit (scan) to amortize tunnel dispatch.

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_refine_v2.py
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def fetch(out):
    return np.asarray(jnp.sum(jax.tree_util.tree_leaves(out)[0]))


def timed(fn, iters=8, warmup=2):
    for _ in range(warmup):
        out = fn()
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    fetch(out)
    return (time.perf_counter() - t0) / iters


def main():
    import sys

    sys.path.insert(0, "tests")
    from test_refine_stack import _make_vars

    from gfnet_tpu.ops.pallas.refine_stack import fused_refine_stack

    rng = np.random.default_rng(0)
    for (b, h, w, c) in [(2, 320, 320, 24), (2, 160, 160, 73)]:
        m, v = _make_vars(c, 8)
        d = jnp.asarray(rng.normal(0, 1, (b, h, w, c)).astype(np.float32))

        def rep8(fn):
            def run(x):
                def body(carry, _):
                    f, _c = fn(carry)
                    # thread a dependency so iterations serialize
                    nxt = carry + 1e-6 * jnp.pad(
                        f.astype(carry.dtype), ((0, 0), (0, 0), (0, 0), (0, c - 2))
                    )
                    return nxt, None

                out, _ = jax.lax.scan(body, x, None, length=8)
                return out

            return jax.jit(run)

        flax_fn = rep8(lambda x: m.apply(v, x, train=False))
        fused_fn = rep8(
            lambda x: fused_refine_stack(
                x, v["params"], v["batch_stats"], hidden_blocks=8,
                store_dtype=jnp.bfloat16,
            )
        )
        t_flax = timed(partial(flax_fn, d)) / 8 * 1e3
        print(f"{(b,h,w,c)} flax  {t_flax:7.3f} ms", flush=True)
        t_fused = timed(partial(fused_fn, d)) / 8 * 1e3
        print(f"{(b,h,w,c)} fused {t_fused:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
