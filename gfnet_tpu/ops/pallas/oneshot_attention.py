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
) -> Array:
    """q, k, v: (B, N, H, D) -> (B, N, H, D). Non-causal, full attention.

    kv may be shorter/longer than q. D should be lane-friendly (64/128).

    block_q=None picks the whole q row per program when the f32 logits block
    fits comfortably in VMEM, else 512. One program per (batch, head) beats
    q-tiling at every ViT shape (v5e sweep scripts/profile_oneshot.py,
    2026-08-20: 0.263 vs 0.355 ms/block at N=1025, 0.453 vs 0.586 at
    N=1601) — fewer grid steps and one K/V fetch per row.
    """
    b, n, h, d = q.shape
    nk = k.shape[1]
    if scale is None:
        scale = d**-0.5
    nkp = -(-nk // 128) * 128
    if block_q is None:
        block_q = n if n * nkp * 4 <= 24 * 1024 * 1024 else 512
    kp = jnp.pad(k, ((0, 0), (0, nkp - nk), (0, 0), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, nkp - nk), (0, 0), (0, 0)))

    # (B, N, H, D) -> (B*H, N, D)
    fold = lambda t: jnp.moveaxis(t, 1, 2).reshape(b * h, t.shape[1], d)
    qf, kf, vf = fold(q), fold(kp), fold(vp)

    tq = min(block_q, n)
    nq_blocks = -(-n // tq)
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
