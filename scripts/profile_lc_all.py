"""pallas (f32 + bf16) vs patch local-correlation across every flagship
refiner shape, with tunnel-safe fetch-forced timing (see bench.py).

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_lc_all.py
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def measure_roundtrip(iters: int = 20) -> float:
    triv = jax.jit(lambda x, i: x.sum() + i)
    x = jnp.ones((8, 128))
    np.asarray(triv(x, 0))
    t0 = time.perf_counter()
    for i in range(iters):
        np.asarray(triv(x, i))
    return (time.perf_counter() - t0) / iters


def timed(fn, variants, roundtrip_s, iters=20):
    """fn(q) per iteration with a distinct input (defeats the tunnel's
    result cache) + a tiny fetch (completion proof), minus the measured
    fetch roundtrip."""
    np.asarray(jnp.sum(fn(variants[0])))  # warm/compile
    t0 = time.perf_counter()
    for i in range(iters):
        np.asarray(jnp.sum(fn(variants[i % len(variants)])))
    return max((time.perf_counter() - t0) / iters - roundtrip_s, 0.0)


# (scale, grid, target_hw, C, r) for 448-pass and 560-pass of the flagship
SHAPES = [
    ("16@448", 32, 32, 64, 7),
    ("8@448", 32, 56, 64, 6),
    ("4@448", 64, 112, 32, 4),
    ("2@448", 128, 224, 16, 2),
    ("8@560", 40, 70, 64, 6),
    ("4@560", 80, 140, 32, 4),
    ("2@560", 160, 280, 16, 2),
]


def main():
    from gfnet_tpu.ops.local_correlation import local_correlation

    rng = np.random.default_rng(0)
    rt = measure_roundtrip()
    print(f"fetch roundtrip {rt * 1e3:.2f} ms")
    print(f"{'shape':<10} {'patch ms':>9} {'pallas f32':>11} {'pallas bf16':>12}")
    for tag, g, hw, c, r in SHAPES:
        qs = [
            jnp.asarray(rng.normal(0, 1, (2, g, g, c)).astype(np.float32))
            for _ in range(4)
        ]
        t = jnp.asarray(rng.normal(0, 1, (2, hw, hw, c)).astype(np.float32))
        f = jnp.asarray(rng.uniform(-1, 1, (2, g, g, 2)).astype(np.float32))
        cols = []
        for impl, cd in (("patch", None), ("pallas", None), ("pallas", jnp.bfloat16)):
            fj = jax.jit(
                partial(local_correlation, radius=r, impl=impl, compute_dtype=cd)
            )
            try:
                cols.append(f"{timed(lambda q: fj(q, t, f), qs, rt) * 1e3:>.2f}")
            except Exception as e:  # noqa: BLE001
                cols.append("FAIL:" + type(e).__name__)
        print(f"{tag:<10} {cols[0]:>9} {cols[1]:>11} {cols[2]:>12}", flush=True)


if __name__ == "__main__":
    main()
