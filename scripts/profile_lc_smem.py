"""Standalone local-corr timings after the blocked-SMEM change, B=2 vs 16."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from gfnet_tpu.ops.local_correlation import _local_correlation_patch
from gfnet_tpu.ops.pallas.local_corr import local_correlation_pallas

LOOP = 8


def bench(fn, args, iters=3):
    jf = jax.jit(fn)
    np.asarray(jf(*args)[0, 0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(jf(*args)[0, 0, 0, 0])
    return (time.perf_counter() - t0) / iters


rng = np.random.default_rng(0)
for b in (2, 16):
    t = jnp.asarray(rng.normal(0, 1, (b, 224, 224, 16)).astype(np.float32))
    q = jnp.asarray(rng.normal(0, 1, (b, 128, 128, 16)).astype(np.float32))
    f = jnp.asarray(rng.uniform(-1, 1, (b, 128, 128, 2)).astype(np.float32))
    for name, fn in (
        ("pallas_f32", lambda q_, t_, f_: local_correlation_pallas(q_, t_, f_, 2)),
        ("pallas_bf16", lambda q_, t_, f_: local_correlation_pallas(
            q_, t_, f_, 2, compute_dtype=jnp.bfloat16)),
        ("patch", lambda q_, t_, f_: _local_correlation_patch(q_, t_, f_, 2)),
    ):
        dt = bench(fn, (q, t, f))
        print(f"B={b} {name:>11}: {dt*1e3:8.2f} ms", flush=True)
