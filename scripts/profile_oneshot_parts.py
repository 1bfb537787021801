"""Isolate oneshot-attention cost: matmuls-only vs +max vs +exp vs full."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOOP = 50


def make_kernel(mode, scale, nk, nkp, tq):
    def _kernel(q_ref, k_ref, v_ref, o_ref):
        q = q_ref[0].astype(jnp.float32)
        k = k_ref[0].astype(jnp.float32)
        logits = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        if nk < nkp:
            col = jax.lax.broadcasted_iota(jnp.int32, (tq, nkp), 1)
            logits = jnp.where(col < nk, logits, -jnp.inf)
        if mode == "dots":
            e = logits.astype(v_ref.dtype)
            s = 1.0
        elif mode == "max":
            m = jnp.max(logits, axis=1, keepdims=True)
            e = (logits - m).astype(v_ref.dtype)
            s = 1.0
        elif mode == "exp_bf16":
            m = jnp.max(logits, axis=1, keepdims=True)
            eb = jnp.exp((logits - m).astype(jnp.bfloat16).astype(v_ref.dtype))
            s = jnp.sum(eb.astype(jnp.float32), axis=1, keepdims=True)
            e = eb
        else:  # full f32
            m = jnp.max(logits, axis=1, keepdims=True)
            ef = jnp.exp(logits - m)
            s = jnp.sum(ef, axis=1, keepdims=True)
            e = ef.astype(v_ref.dtype)
        out = jax.lax.dot_general(
            e, v_ref[0], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0] = (out * (1.0 / s)).astype(o_ref.dtype)

    return _kernel


def run(mode, q, k, v, scale=0.125):
    b, n, h, d = q.shape
    nk = k.shape[1]
    nkp = -(-nk // 128) * 128
    kp = jnp.pad(k, ((0, 0), (0, nkp - nk), (0, 0), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, nkp - nk), (0, 0), (0, 0)))
    fold = lambda t: jnp.moveaxis(t, 1, 2).reshape(b * h, t.shape[1], d)
    qf, kf, vf = fold(q), fold(kp), fold(vp)
    kern = make_kernel(mode, scale, nk, nkp, n)
    return pl.pallas_call(
        kern,
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, n, d), lambda bh: (bh, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nkp, d), lambda bh: (bh, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nkp, d), lambda bh: (bh, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, d), lambda bh: (bh, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, n, d), q.dtype),
    )(qf, kf, vf)


def bench(fn, q, iters=3):
    @jax.jit
    def looped(q):
        def body(i, q):
            o = fn(q)
            return jnp.moveaxis(o.reshape(q.shape[0], q.shape[2], q.shape[1], q.shape[3]), 1, 2)

        return jax.lax.fori_loop(0, LOOP, body, q)

    np.asarray(looped(q)[0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(looped(q)[0, 0, 0])
    return (time.perf_counter() - t0) / (iters * LOOP)


rng = np.random.default_rng(0)
for n in (1025, 1601):
    b, h, d = 2, 16, 64
    mk = lambda: jnp.asarray(
        rng.normal(0, 1, (b, n, h, d)).astype(np.float32)
    ).astype(jnp.bfloat16)
    q, k, v = mk(), mk(), mk()
    for mode in ("dots", "max", "exp_bf16", "full"):
        t = bench(lambda q_: run(mode, q_, k, v), q)
        print(f"N={n} {mode:>9}: {t*1e3:7.3f} ms", flush=True)
