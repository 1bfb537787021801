"""A/B the grid_sample lowerings at the exact fine-refiner warp shapes.

The trace (round 4) shows the scale-"1" warp gather at 3.3 ms in pass2 —
one gather row per output cell puts it at the TPU's row-issue floor; this
checks whether the packed (4-corners-in-channels) form or a bf16/f32 dtype
change shifts that floor at the REAL shapes, with the tunnel-safe
distinct-input fetch protocol (dispatch result cache defeated).

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/ab_warp_r4.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from gfnet_tpu.ops.sampler import grid_sample


def timeit_variants(jfn, variants, fixed, iters=10):
    np.asarray(jnp.ravel(jfn(variants[0], fixed))[0])  # compile
    t0 = time.perf_counter()
    for i in range(iters):
        np.asarray(jnp.ravel(jfn(variants[i % len(variants)], fixed))[0])
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    # (target shape, grid G) per refiner scale/pass; bf16 features as in model
    cases = [
        ("pass2 s1", (2, 560, 560, 8), 320),
        ("pass1 s1", (2, 448, 448, 8), 256),
        ("pass2 s2", (2, 280, 280, 16), 160),
        ("B=8 p2 s1", (16, 560, 560, 8), 320),
    ]
    # measured host<->device fetch roundtrip to subtract
    triv = jax.jit(lambda x, _: x.sum())
    z = jnp.ones((8, 128))
    np.asarray(triv(z, 0))
    t0 = time.perf_counter()
    for i in range(20):
        np.asarray(triv(z, i))
    rt = (time.perf_counter() - t0) / 20

    for name, tshape, g in cases:
        b = tshape[0]
        tgt = jnp.asarray(rng.normal(0, 1, tshape).astype(np.float32)).astype(
            jnp.bfloat16
        )
        grids = [
            jnp.asarray(rng.uniform(-1, 1, (b, g, g, 2)).astype(np.float32))
            for _ in range(10)
        ]
        for impl in ("patch", "packed", "base"):
            if impl == "base":
                fn = jax.jit(
                    lambda gr, t: grid_sample(t, gr, impl="auto", padding_mode="border")
                )
                # border-mode forces the 4-gather base path
            else:
                fn = jax.jit(lambda gr, t, i=impl: grid_sample(t, gr, impl=i))
            try:
                dt = timeit_variants(fn, grids, tgt) - rt
                print(f"{name:>10} {impl:>7}: {dt*1e3:7.2f} ms", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{name:>10} {impl:>7}: FAIL {type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()
