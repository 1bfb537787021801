"""One-shot (non-streaming) Pallas attention for short sequences.

The ViT backbone's sequences are image-token grids (1025 at 448^2, 1601 at
560^2) — short enough that a whole attention row fits VMEM, so the
flash-attention streaming machinery (running max/sum, per-k-block rescaling,
grid over kv) is pure overhead. This kernel computes, per (batch*head,
q-block) program:

    logits = (q_blk @ K^T) * scale        one MXU dot, (TQ, Nkp) f32
    logits[:, nk:] = -inf                 iota mask for the kv pad tail
    out    = softmax(logits) @ V          one row-wide softmax + one MXU dot

K/V live fully in VMEM per program (Nkp x 64 bf16 = ~0.2 MB); the f32
logits block at TQ<=512 is <= 3.4 MB. Numerics match flash/SDPA: f32
logits + f32 softmax, bf16 PV operands with f32 accumulation.

kv is padded to a multiple of 128 lanes on the host (the logits' lane dim);
q needs no padding — the grid is cdiv over q rows and the garbage rows of a
partial final block are sliced off by the caller. Measured on v5e vs the
jax flash kernel (blk 512, its best config; scripts/profile_oneshot.py):
~1.45x faster at N=1025 and N=1601, giving the ViT's dominant kernel back
to the MXU-bound regime.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _kernel_bnhd(q_ref, k_ref, v_ref, o_ref, *, scale, nk, nkp, tq, h):
    # refs are (1, rows, H, D) slices of the native (B, N, H, D) tensors —
    # one fully CONTIGUOUS DMA per operand brings all heads, and the head
    # loop runs in VMEM. No (B,N,H,D)<->(B,H,N,D) relayout ever
    # materializes in HBM (those transposes measured ~0.6 ms/block at B=8
    # when XLA couldn't fuse them).
    col = None
    if nk < nkp:
        col = jax.lax.broadcasted_iota(jnp.int32, (tq, nkp), 1)
    outs = []
    for hh in range(h):  # static unroll over heads
        q = q_ref[0, :, hh, :]  # (TQ, D)
        k = k_ref[0, :, hh, :]  # (Nkp, D)
        v = v_ref[0, :, hh, :]
        logits = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        if col is not None:
            logits = jnp.where(col < nk, logits, -jnp.inf)
        m = jnp.max(logits, axis=1, keepdims=True)
        e = jnp.exp(logits - m)
        s = jnp.sum(e, axis=1, keepdims=True)
        out = jax.lax.dot_general(
            e.astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        outs.append((out * (1.0 / s)).astype(o_ref.dtype))
    # heads concatenated along lanes: the output ref is (1, TQ, H*D) — the
    # exact flattened layout the proj matmul consumes, and a plain 2D store
    # (middle-indexed 4D ref stores don't lower in Mosaic 2026-08)
    o_ref[0] = jnp.concatenate(outs, axis=-1)


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale, nk, nkp, tq):
    # QK^T with the operands in their storage dtype: bf16 inputs feed the MXU
    # at full rate (f32 operands run at ~1/4 on v5e), and since bf16 x bf16
    # products are exact in the f32 accumulator, the logits are identical to
    # the old cast-to-f32 form for 16-bit inputs.
    q = q_ref[0]  # (TQ, D)
    k = k_ref[0]  # (Nkp, D)
    logits = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (TQ, Nkp)
    if nk < nkp:
        col = jax.lax.broadcasted_iota(jnp.int32, (tq, nkp), 1)
        logits = jnp.where(col < nk, logits, -jnp.inf)
    m = jnp.max(logits, axis=1, keepdims=True)
    e = jnp.exp(logits - m)
    s = jnp.sum(e, axis=1, keepdims=True)
    # normalize AFTER the PV dot: dividing the (TQ, Nkp) block by s costs a
    # many-cycle VPU divide per element (measured ~2.6x whole-kernel time at
    # N=1601); scaling the (TQ, D) output by 1/s is Nkp/D times cheaper.
    out = jax.lax.dot_general(
        e.astype(v_ref.dtype), v_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TQ, D)
    o_ref[0] = (out * (1.0 / s)).astype(o_ref.dtype)


def oneshot_attention(
    q: Array, k: Array, v: Array, scale: float | None = None,
    block_q: int | None = None, interpret: bool = False,
    layout: str = "fold",
) -> Array:
    """q, k, v: (B, N, H, D) -> (B, N, H, D). Non-causal, full attention.

    kv may be shorter/longer than q. D should be lane-friendly (64/128).

    block_q=None picks the whole q row per program when the f32 logits block
    fits comfortably in VMEM, else 512. One program per (batch, head) beats
    q-tiling at every ViT shape (v5e sweep scripts/profile_oneshot.py,
    2026-08-20: 0.263 vs 0.355 ms/block at N=1025, 0.453 vs 0.586 at
    N=1601) — fewer grid steps and one K/V fetch per row.

    layout="fold" (default): explicit (B,N,H,D)->(B*H,N,D) moveaxis around
    the kernel. Those relayouts materialize as ~0.58 ms/block HBM transposes
    at B=8 (r5 trace), which motivated layout="bnhd": consume the producer
    layout directly, loop heads in-kernel, emit (B,N,H*D). MEASURED RESULT
    (v5e, r5): bnhd LOSES >2x — per-head strided sub-lane loads, the q-pad
    to the block grid, and the VMEM-constrained smaller q blocks cost far
    more than the relayouts they remove (attn 9.0 vs ~4 ms/pair at B=8
    pass1). Kept env-gated (GFNET_ATTN_LAYOUT=bnhd) as the record of that
    A/B, not as a path worth taking.
    """
    import os

    layout = os.environ.get("GFNET_ATTN_LAYOUT", layout)
    b, n, h, d = q.shape
    if d < 64:
        # Mosaic can't lower the (rows, hh, :) sub-lane stores for small head
        # dims (crossview uses d=8); those shapes keep the explicit-relayout
        # form — they're tiny, the relayout is cheap there.
        layout = "fold"
    nk = k.shape[1]
    if scale is None:
        scale = d**-0.5
    nkp = -(-nk // 128) * 128
    if block_q is None:
        if layout == "bnhd":
            # the head loop is unrolled and the compiler schedules iterations
            # concurrently, so the stack holds ~h (f32 logits + bf16 exp)
            # blocks at once (6 B/element); size tq to fit the pinned budget
            # with headroom for the double-buffered q/k/v/out blocks
            per_row = h * nkp * 6
            block_q = max(256, (64 * 1024 * 1024 // per_row) // 128 * 128)
        else:
            block_q = n if n * nkp * 4 <= 24 * 1024 * 1024 else 512
    kp = jnp.pad(k, ((0, 0), (0, nkp - nk), (0, 0), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, nkp - nk), (0, 0), (0, 0)))
    tq = min(block_q, n)
    nq_blocks = -(-n // tq)

    if layout == "bnhd":
        # pad q rows to the block grid; pad rows yield finite outputs
        # (uniform softmax over real keys) and are sliced off below
        qp = jnp.pad(q, ((0, 0), (0, nq_blocks * tq - n), (0, 0), (0, 0)))
        kern = functools.partial(
            _kernel_bnhd, scale=float(scale), nk=nk, nkp=nkp, tq=tq, h=h
        )
        out = pl.pallas_call(
            kern,
            grid=(b, nq_blocks),
            in_specs=[
                pl.BlockSpec((1, tq, h, d), lambda bb, i: (bb, i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nkp, h, d), lambda bb, i: (bb, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nkp, h, d), lambda bb, i: (bb, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, tq, h * d), lambda bb, i: (bb, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, nq_blocks * tq, h * d), q.dtype),
            # the head unroll's temporaries exceed the default scoped-vmem
            # budget (~17M observed); v5e VMEM is 128M — pin like
            # ops/pallas/local_corr.py
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        )(qp, kp, vp)
        # reshape only — no transpose: heads are already lane-major
        return out[:, :n].reshape(b, n, h, d)

    # (B, N, H, D) -> (B*H, N, D)
    fold = lambda t: jnp.moveaxis(t, 1, 2).reshape(b * h, t.shape[1], d)
    qf, kf, vf = fold(q), fold(kp), fold(vp)

    # pad q rows to the block grid; the pad rows' outputs are finite
    # (uniform softmax over real keys) and sliced off below
    qf = jnp.pad(qf, ((0, 0), (0, nq_blocks * tq - n), (0, 0)))
    kern = functools.partial(_kernel, scale=float(scale), nk=nk, nkp=nkp, tq=tq)
    out = pl.pallas_call(
        kern,
        grid=(b * h, nq_blocks),
        in_specs=[
            pl.BlockSpec((1, tq, d), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nkp, d), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nkp, d), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, d), lambda bh, i: (bh, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, nq_blocks * tq, d), q.dtype),
        interpret=interpret,
    )(qf, kf, vf)

    out = out[:, :n].reshape(b, h, n, d)
    return jnp.moveaxis(out, 1, 2)
