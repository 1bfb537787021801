"""Round-4 P1 ground truth: jax.profiler traces of pass1/pass2 at B=1 and B=8.

Produces /tmp/trace_r4/{pass1_b1,pass2_b1,pass1_b8,pass2_b8} trace dirs for
scripts/trace_top_ops.py, plus fetch-forced wall timings.

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_r4_layout.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from gfnet_tpu.config import ModelConfig
from gfnet_tpu.matcher.api import GFNetMatcher


def measure_rt():
    triv = jax.jit(lambda x, i: x.sum() + i)
    xt = jnp.ones((8, 128))
    np.asarray(triv(xt, 0))
    t0 = time.perf_counter()
    for i in range(20):
        np.asarray(triv(xt, i))
    return (time.perf_counter() - t0) / 20


def timeit(fn, pick, iters, rt):
    np.asarray(pick(fn(0)))
    t0 = time.perf_counter()
    for i in range(iters):
        np.asarray(pick(fn(i)))
    return max((time.perf_counter() - t0) / iters - rt, 0.0)


def main():
    cfg = ModelConfig()
    m = GFNetMatcher(cfg)
    rng = np.random.default_rng(0)
    hv, vp = m.head_vars, m.vit_params
    RT = measure_rt()
    print(f"fetch roundtrip {RT*1e3:.1f} ms", flush=True)
    ITERS = 6

    for b in (1, 8):
        base = rng.uniform(0, 1, (b, 448, 448, 3)).astype(np.float32)
        var_a = [jnp.asarray((base + 1e-4 * j).clip(0, 1)) for j in range(ITERS)]
        bb = jnp.asarray(rng.uniform(0, 1, (b, 448, 448, 3)).astype(np.float32))
        p1 = m._pass1_jit(hv, vp, var_a[0], bb)
        jax.block_until_ready(p1)
        out2 = m._pass2_jit(hv, vp, var_a[0], bb, *p1)
        np.asarray(out2[0][0, 0, 0])

        t1 = timeit(lambda i: m._pass1_jit(hv, vp, var_a[i], bb), lambda o: o[0][0, 0, 0], ITERS, RT)
        t2 = timeit(lambda i: m._pass2_jit(hv, vp, var_a[i], bb, *p1), lambda o: o[0][0, 0, 0], ITERS, RT)
        print(f"B={b}: pass1 {t1*1e3/b:7.2f} ms/pair  pass2 {t2*1e3/b:7.2f} ms/pair", flush=True)

        for name, fn in (
            (f"pass1_b{b}", lambda i: m._pass1_jit(hv, vp, var_a[i], bb)),
            (f"pass2_b{b}", lambda i: m._pass2_jit(hv, vp, var_a[i], bb, *p1)),
        ):
            d = f"/tmp/trace_r4/{name}"
            with jax.profiler.trace(d):
                for i in range(3):
                    out = fn(i)
                np.asarray(jax.tree_util.tree_leaves(out)[0][0, 0, 0])
            print(f"traced {d}", flush=True)


if __name__ == "__main__":
    main()
