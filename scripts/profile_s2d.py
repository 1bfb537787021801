"""A/B the s2d refiner stack in context: pass1+pass2 wall time, s2d on/off.

    GFNET_S2D=0|auto PYTHONPATH=... python scripts/profile_s2d.py
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from gfnet_tpu.config import ModelConfig
from gfnet_tpu.matcher.api import GFNetMatcher


def rt_measure():
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
    RT = rt_measure()
    ITERS = 8
    print(f"s2d={os.environ.get('GFNET_S2D', 'auto')} RTT {RT*1e3:.1f} ms", flush=True)
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
        print(f"B={b}: pass1 {t1*1e3/b:7.2f} ms/pair  pass2 {t2*1e3/b:7.2f} ms/pair  "
              f"head-total {(t1+t2)*1e3/b:7.2f}", flush=True)


if __name__ == "__main__":
    main()
