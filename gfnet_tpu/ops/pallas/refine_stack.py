"""Fused Pallas kernels for the ConvRefiner block stack (inference).

The refiner stacks are the engine's dominant non-ViT cost (profile_head:
ref1@320 9.4 ms, ref2@160 11.8 ms at 560 input). Each of the 9 RefineBlocks
(depthwise 5x5 -> BN -> ReLU -> 1x1, ref `model/network.py:505-531`) is
HBM-bandwidth bound at tiny channel counts (C = 24/73 at the fine scales),
and the NHWC layout XLA uses pads C to the 128-lane width -- every
inter-block activation round-trip moves up to 5.3x the real bytes.

This kernel instead keeps activations in a channels-in-sublane layout
`(B, H+4, C, W+4)` (lane dim = W, sublane dim = C, zero borders carried in
the array) between blocks, so HBM traffic is the true activation size:

  - depthwise 5x5: 25 static shifted slices (rows = leading dim, cols =
    lane offsets 0..4) with a per-channel FMA on the VPU -- the same
    shift-accumulate lowering the XLA path uses, minus the lane padding;
  - BN (inference) is pre-folded into the depthwise taps and bias on the
    host: s = gamma * rsqrt(var + eps), taps' = taps * s,
    bias' = (dw_bias - mean) * s + beta;
  - 1x1 conv: one TH-batched MXU dot_general (C_out, C_in) x (C_in, W)
    per row tile.

Each block is one `pallas_call` over a (B, H-tiles) grid; the input stays
in HBM (`memory_space=ANY`) and each program DMAs its (TH+4)-row halo tile
into VMEM, computes, and DMAs the TH-row interior back -- overlapping
halo reads cannot be expressed as pipelined BlockSpecs.

Training mode keeps the unfused flax path (batch-norm batch statistics are
a global reduction, and the backward pass is XLA's job); the refiner only
dispatches here when `train=False`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_PAD = 2  # kernel 5x5 -> 2-cell zero border carried in the activation array


def _row_tile(h: int, cap: int = 64) -> int:
    """Largest divisor of h that is <= cap."""
    for t in range(min(cap, h), 0, -1):
        if h % t == 0:
            return t
    return 1


def _block_kernel(x_hbm, taps_ref, bias_ref, wmat_ref, pwb_ref, out_hbm,
                  xin, yout, zrow, sem_in, sem_out, sem_z,
                  *, th, c, w, nh, ksize):
    """One RefineBlock: folded dw5x5 -> ReLU -> 1x1, on a (TH, C, W) tile."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    row0 = i * th
    halo = ksize - 1

    cp_in = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(row0, th + halo)], xin, sem_in
    )
    cp_in.start()
    cp_in.wait()

    acc = jnp.zeros((th, c, w), jnp.float32)
    for dy in range(ksize):
        for dx in range(ksize):
            tap = xin[dy : dy + th, :, dx : dx + w].astype(jnp.float32)
            acc = acc + tap * taps_ref[dy * ksize + dx]
    y = jnp.maximum(acc + bias_ref[:], 0.0)

    # 1x1 conv: batched (C_out, C_in) @ (C_in, W) over the TH rows.
    wm = jnp.broadcast_to(wmat_ref[:], (th, c, c))
    out = jax.lax.dot_general(
        wm, y,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (TH, C, W)
    out = out + pwb_ref[:]

    yout[:] = jnp.zeros(yout.shape, yout.dtype)
    yout[:, :, _PAD : _PAD + w] = out.astype(yout.dtype)
    cp_out = pltpu.make_async_copy(
        yout, out_hbm.at[b, pl.ds(_PAD + row0, th)], sem_out
    )
    cp_out.start()
    cp_out.wait()

    # Boundary programs also write the zero border rows of the output.
    @pl.when(i == 0)
    def _():
        zrow[:] = jnp.zeros(zrow.shape, zrow.dtype)
        cp = pltpu.make_async_copy(zrow, out_hbm.at[b, pl.ds(0, _PAD)], sem_z)
        cp.start()
        cp.wait()

    @pl.when(i == nh - 1)
    def _():
        zrow[:] = jnp.zeros(zrow.shape, zrow.dtype)
        cp = pltpu.make_async_copy(
            zrow, out_hbm.at[b, pl.ds(_PAD + nh * th, _PAD)], sem_z
        )
        cp.start()
        cp.wait()


def fused_refine_block(
    x: Array, taps: Array, bias: Array, wmat: Array, pwb: Array,
    *, ksize: int = 5, interpret: bool = False,
) -> Array:
    """Apply one folded RefineBlock to a padded (B, H+4, C, W+4) activation.

    taps: (ksize^2, C, 1) f32 BN-folded depthwise taps.
    bias: (C, 1) f32 folded bias; wmat: (C_out, C_in) f32 1x1 kernel (already
    transposed); pwb: (C, 1) f32 1x1 bias. Output has the same padded layout
    and dtype as x, zero borders included.
    """
    b, hp, c, wp = x.shape
    h = hp - 2 * _PAD
    w = wp - 2 * _PAD
    th = _row_tile(h)
    nh = h // th
    kern = functools.partial(
        _block_kernel, th=th, c=c, w=w, nh=nh, ksize=ksize
    )
    vspec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(b, nh),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            vspec(), vspec(), vspec(), vspec(),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((b, hp, c, wp), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + (ksize - 1), c, wp), x.dtype),
            pltpu.VMEM((th, c, wp), x.dtype),
            pltpu.VMEM((_PAD, c, wp), x.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(x, taps, bias, wmat, pwb)


def fold_block_params(params: dict, batch_stats: dict, eps: float = 1e-5):
    """Fold inference BN into the depthwise conv of one RefineBlock.

    params/batch_stats: the flax subtrees of a RefineBlock ({dw, bn, pw} /
    {bn}), possibly with a leading stacked-blocks axis (nn.scan layout).
    Returns (taps, bias, wmat, pwb) with the layouts fused_refine_block wants
    (plus the leading axis if present).
    """
    dw_k = jnp.asarray(params["dw"]["kernel"], jnp.float32)  # (..., k, k, 1, C)
    dw_b = jnp.asarray(params["dw"]["bias"], jnp.float32)  # (..., C)
    gamma = jnp.asarray(params["bn"]["scale"], jnp.float32)
    beta = jnp.asarray(params["bn"]["bias"], jnp.float32)
    mean = jnp.asarray(batch_stats["bn"]["mean"], jnp.float32)
    var = jnp.asarray(batch_stats["bn"]["var"], jnp.float32)
    pw_k = jnp.asarray(params["pw"]["kernel"], jnp.float32)  # (..., 1, 1, C, C)

    s = gamma * jax.lax.rsqrt(var + eps)  # (..., C)
    k = dw_k.shape[-4]
    lead = dw_k.shape[:-4]
    taps = dw_k.reshape(lead + (k * k, dw_k.shape[-1]))
    taps = (taps * s[..., None, :])[..., None]  # (..., k^2, C, 1)
    bias = (((dw_b - mean) * s) + beta)[..., None]  # (..., C, 1)
    wmat = jnp.swapaxes(pw_k[..., 0, 0, :, :], -1, -2)  # (..., C_out, C_in)
    pwb = jnp.asarray(params["pw"]["bias"], jnp.float32)[..., None]
    return taps, bias, wmat, pwb


def fused_refine_stack(
    d: Array,
    refiner_params: dict,
    refiner_stats: dict,
    *,
    hidden_blocks: int = 8,
    ksize: int = 5,
    store_dtype: jnp.dtype = jnp.bfloat16,
    eps: float = 1e-5,
    interpret: bool = False,
) -> tuple[Array, Array]:
    """Run block1 + the scanned hidden blocks + out_conv, fused.

    d: (B, H, W, C) NHWC concat features (refiner input after disp_emb /
    local-corr concat). refiner_params/refiner_stats: the ConvRefiner
    subtrees ({block1, hidden, out_conv} / {block1, hidden}).
    Returns (delta_flow (B,H,W,2), delta_cert (B,H,W,1)) in f32, matching
    `model/network.py:556-563` semantics.
    """
    t1 = fold_block_params(refiner_params["block1"], refiner_stats["block1"], eps)
    th = fold_block_params(
        refiner_params["hidden"]["block"], refiner_stats["hidden"]["block"], eps
    )
    blocks = [tuple(x[j] for x in th) for j in range(hidden_blocks)]
    blocks.insert(0, t1)

    # NHWC -> (B, H, C, W) with a 2-cell zero border carried between blocks.
    x = jnp.transpose(d, (0, 1, 3, 2)).astype(store_dtype)
    x = jnp.pad(x, ((0, 0), (_PAD, _PAD), (0, 0), (_PAD, _PAD)))
    for taps, bias, wmat, pwb in blocks:
        x = fused_refine_block(
            x, taps, bias, wmat, pwb, ksize=ksize, interpret=interpret
        )

    inner = x[:, _PAD:-_PAD, :, _PAD:-_PAD].astype(jnp.float32)
    ok = jnp.asarray(refiner_params["out_conv"]["kernel"], jnp.float32)[0, 0]
    ob = jnp.asarray(refiner_params["out_conv"]["bias"], jnp.float32)
    out = jnp.einsum("bhcw,co->bhwo", inner, ok) + ob
    return out[..., :2], out[..., 2:3]


@functools.partial(jax.jit, static_argnums=(1, 2))
def _probe(x, ksize, interpret):
    c = x.shape[2]
    taps = jnp.zeros((ksize * ksize, c, 1), jnp.float32)
    b1 = jnp.zeros((c, 1), jnp.float32)
    wm = jnp.zeros((c, c), jnp.float32)
    return fused_refine_block(x, taps, b1, wm, b1, ksize=ksize, interpret=interpret)


_PROBE_CACHE: dict = {}


def fused_stack_supported(
    shape: tuple, store_dtype=jnp.bfloat16, ksize: int = 5
) -> bool:
    """Per-shape dispatch gate: compile the standalone block kernel once
    (cached); VMEM-overflow or unsupported-lowering shapes fall back to the
    unfused flax path instead of failing the caller's jit compile."""
    b, h, w, c = shape
    key = (b, h, w, c, jnp.dtype(store_dtype).name, ksize)
    hit = _PROBE_CACHE.get(key)
    if hit is not None:
        return hit
    x = jax.ShapeDtypeStruct(
        (b, h + 2 * _PAD, c, w + 2 * _PAD), jnp.dtype(store_dtype)
    )
    try:
        _probe.lower(x, ksize, False).compile()
        ok = True
    except Exception:
        ok = False
    _PROBE_CACHE[key] = ok
    return ok
