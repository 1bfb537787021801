"""Headline benchmark: end-to-end matched pairs per second on one TPU chip.

Protocol mirrors the reference's runtime measurement (`estimation.py:56,78`):
wall-clock of match (448 pass + 560 upsample-refinement pass, symmetric) +
threshold-balanced sampling + robust homography solve, per image pair — but
fully on-device (no OpenCV host round trip).

Measures BOTH serving shapes:
  - single-stream (one pair per dispatch, latency-bound, the reference's
    protocol) — this is the headline `value`;
  - batched (B pairs through `estimate_homography_batched`, 3 dispatches
    total, throughput-bound) — reported as `batched_pairs_per_s`;
plus a per-phase time split (pass1 / pass2 / sample+solve) so the remaining
cost structure is visible.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "pairs/s", "vs_baseline": N, ...}

vs_baseline compares against the first recorded run on this hardware
(bench_baseline.json, committed once measured) so the driver can track
speedups across rounds.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_baseline.json")


def _retry_compile(thunk, tries: int = 3):
    """The remote-compile tunnel occasionally drops a response mid-body
    ("response body closed before all bytes were read") on big programs; the
    compile itself is fine on retry (server-side cache warm). Retry the
    compile-triggering call instead of failing the whole bench."""
    for attempt in range(tries):
        try:
            return thunk()
        except Exception:  # noqa: BLE001 - jax wraps the tunnel error opaquely
            if attempt == tries - 1:
                raise
            time.sleep(5.0)


def _timeit(fn, sync, iters):
    t0 = time.perf_counter()
    out = None
    for i in range(iters):
        out = fn(i)
    sync(out)
    return (time.perf_counter() - t0) / iters


def _timeit_fetch(fn, pick, iters, roundtrip_s):
    """Tunnel-safe phase timing: the remote runtime's final sync is lazy and
    its dispatch queue absorbs short loops, so force a tiny host fetch every
    iteration (completion proof) and subtract the measured fetch roundtrip."""
    import numpy as np

    np.asarray(pick(fn(0)))  # warm
    t0 = time.perf_counter()
    for i in range(iters):
        np.asarray(pick(fn(i)))
    dt = (time.perf_counter() - t0) / iters - roundtrip_s
    return max(dt, 0.0)


def _measure_roundtrip(iters: int = 20) -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    triv = jax.jit(lambda x, i: x.sum() + i)
    x = jnp.ones((8, 128))
    np.asarray(triv(x, 0))
    t0 = time.perf_counter()
    for i in range(iters):
        np.asarray(triv(x, i))
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from gfnet_tpu.config import ModelConfig
    from gfnet_tpu.matcher.api import GFNetMatcher

    cfg = ModelConfig()  # flagship basic config: 448 -> 560 two-pass, symmetric
    matcher = GFNetMatcher(cfg)

    rng = np.random.default_rng(0)
    im_a = jnp.asarray(rng.uniform(0, 1, (448, 448, 3)).astype(np.float32))
    im_b = jnp.asarray(rng.uniform(0, 1, (448, 448, 3)).astype(np.float32))
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    bsz = int(os.environ.get("BENCH_BATCH", "8"))
    sync = jax.block_until_ready

    # ---------------- single-stream (headline, reference protocol) ----------
    def one_pair(i):
        return matcher.estimate_homography(
            im_a, im_b, num_matches=5000, key=jax.random.PRNGKey(i)
        )

    _retry_compile(lambda: sync(one_pair(0)))  # compile
    rt0 = _measure_roundtrip()
    dt_single = _timeit_fetch(one_pair, lambda H: H, iters, rt0)
    pairs_per_s = 1.0 / dt_single

    # ---------------- per-phase split (single-stream) -----------------------
    # The remote tunnel can serve repeated identical (executable, args)
    # dispatches from a result cache, so every timed iteration must see a
    # distinct input buffer (pre-staged on device, outside the timed loop).
    hv, vp = matcher.head_vars, matcher.vit_params
    variants_a = [
        jnp.asarray((np.asarray(im_a) + 1e-4 * j).clip(0, 1)[None]) for j in range(iters)
    ]
    b1 = im_b[None]
    # wrap the call+sync pair together: a tunnel drop can surface during the
    # blocking fetch rather than at synchronous compile time
    p1 = _retry_compile(lambda: sync(matcher._pass1_jit(hv, vp, variants_a[0], b1)))
    warp, cert = _retry_compile(
        lambda: sync(matcher._pass2_jit(hv, vp, variants_a[0], b1, *p1))
    )
    hw = (448, 448)
    _retry_compile(
        lambda: sync(
            matcher._sample_solve_batched_jit(
                warp, cert, 5000, jax.random.PRNGKey(0), hw, hw
            )
        )
    )
    rt = _measure_roundtrip()
    t_pass1 = _timeit_fetch(
        lambda i: matcher._pass1_jit(hv, vp, variants_a[i], b1),
        lambda out: out[0][0, 0, 0],
        iters, rt,
    )
    t_pass2 = _timeit_fetch(
        lambda i: matcher._pass2_jit(hv, vp, variants_a[i], b1, *p1),
        lambda out: out[0][0, 0, 0],
        iters, rt,
    )
    t_solve = _timeit_fetch(
        lambda i: matcher._sample_solve_batched_jit(
            warp, cert, 5000, jax.random.PRNGKey(i), hw, hw
        ),
        lambda out: out[0, 0, 0],
        iters, rt,
    )

    # ---------------- batched serving ---------------------------------------
    # Distinct per-slot images (honest protocol — a broadcast batch is a
    # dispatch-cache-friendly best case), and distinct batches per iteration
    # like the single-stream loop, pre-staged outside the timed region.
    n_bat = max(iters // 2, 3)
    im_ab_v = [
        jnp.asarray(rng.uniform(0, 1, (bsz, 448, 448, 3)).astype(np.float32))
        for _ in range(n_bat)
    ]
    im_bb = jnp.asarray(rng.uniform(0, 1, (bsz, 448, 448, 3)).astype(np.float32))

    def batched(i):
        return matcher.estimate_homography_batched(
            im_ab_v[i % n_bat], im_bb, num_matches=5000, key=jax.random.PRNGKey(i)
        )

    _retry_compile(lambda: sync(batched(0)))  # compile
    dt_batched = _timeit_fetch(batched, lambda Hs: Hs[0], n_bat, rt0)
    batched_pairs_per_s = bsz / dt_batched

    vs_baseline = 1.0
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            base = json.load(f).get("pairs_per_s")
        if base:
            vs_baseline = pairs_per_s / base

    from gfnet_tpu.ops.local_correlation import dispatch_table

    print(
        json.dumps(
            {
                "metric": "e2e_match_sample_solve_448to560_sym",
                "value": round(pairs_per_s, 3),
                "unit": "pairs/s",
                "vs_baseline": round(vs_baseline, 3),
                "batched_pairs_per_s": round(batched_pairs_per_s, 3),
                "batch_size": bsz,
                "phase_ms": {
                    "pass1_448": round(t_pass1 * 1e3, 2),
                    "pass2_560": round(t_pass2 * 1e3, 2),
                    "sample_solve": round(t_solve * 1e3, 2),
                },
                # which local-correlation impl actually ran per shape
                # (silent kernel-coverage regressions show up here)
                "local_corr_dispatch": [
                    f"t{tuple(d['target'])} q{tuple(d['query'])} r{d['radius']}"
                    f" -> {d['impl']}"
                    for d in dispatch_table()
                ],
            }
        )
    )


if __name__ == "__main__":
    main()
