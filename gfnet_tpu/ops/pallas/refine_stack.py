"""Fused Pallas kernel for the ConvRefiner block stack (inference).

The refiner stacks are the engine's dominant non-ViT cost. Each of the 9
RefineBlocks (depthwise 5x5 -> BN -> ReLU -> 1x1, ref `model/network.py:
505-531`) is HBM-bandwidth bound at tiny channel counts (C = 24/73 at the
fine scales), and the NHWC layout XLA uses pads C to the 128-lane width —
every inter-block activation round-trip moves up to 5.3x the real bytes.

This kernel runs the WHOLE stack (block1 + 8 hidden blocks) as ONE
`pallas_call` over a (B,) grid:

  - each program holds one image's padded activation entirely in VMEM in a
    channels-in-sublane layout (H+4, Cp, Wp) — lane dim = W rounded up to
    the 128-lane tiling, sublane dim = C rounded up to 8, zero borders
    carried in the array;
  - blocks execute back-to-back between two VMEM ping-pong buffers, so the
    only HBM traffic for the whole stack is the input fetch + output store
    (Pallas double-buffers those across the batch grid);
  - depthwise 5x5: 25 static shifted slices with a per-channel FMA on the
    VPU, accumulated in an f32 VMEM scratch (bounds the Mosaic stack);
  - BN (inference) is pre-folded into the depthwise taps and bias on the
    host: s = gamma * rsqrt(var + eps), taps' = taps * s,
    bias' = (dw_bias - mean) * s + beta;
  - 1x1 conv: a row-tile-batched MXU dot_general (C, C) x (C, W).

Mosaic (libtpu 2026-08) compile rules baked in: memref slices along tiled
dims must be tiling-aligned (hence the Cp/Wp padding); a (C, 1)
lane-broadcast fused into the matmul epilogue crashes vector_extract_slice,
so the 1x1 bias arrives pre-broadcast to (C, Wp).

Training mode keeps the unfused flax path (batch-norm batch statistics are
a global reduction, and the backward pass is XLA's job); the refiner only
dispatches here when `train=False`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_PAD = 2  # kernel 5x5 -> 2-cell zero border carried in the activation array
_ACC_BUDGET = 4 * 1024 * 1024  # f32 row-tile accumulator scratch bytes


def _row_tile(h: int, cap: int) -> int:
    """Largest divisor of h that is <= cap."""
    for t in range(min(cap, h), 0, -1):
        if h % t == 0:
            return t
    return 1


def _row_tile_for(h: int, cp: int, wp: int) -> int:
    """Row tile sized so the f32 accumulator scratch fits _ACC_BUDGET."""
    cap = max(int(_ACC_BUDGET // max(cp * wp * 4, 1)), 1)
    return _row_tile(h, min(cap, 64))


def _stack_kernel(taps_ref, bias_ref, wmat_ref, pwb_ref, ok_ref, ob_ref,
                  x_ref, out_ref, bufa, bufb, acc, *, nb, th, h, c, w, ksize):
    """All nb RefineBlocks on one image; x_ref/out_ref (1, H+4, Cp, Wp).

    The block loop is a fori_loop with dynamically-indexed params (one
    compiled block body — a static 9-block unroll took the remote Mosaic
    compiler ~4 min per shape) reading bufa and writing bufb, then copying
    bufb back into bufa (a VMEM-to-VMEM copy, negligible next to the tap
    math)."""
    nh = h // th

    bufa[...] = x_ref[0]

    def block_body(blk, _):
        bufb[...] = jnp.zeros(bufb.shape, bufb.dtype)

        def row_body(t, _2):
            r0 = t * th
            acc[...] = jnp.zeros(acc.shape, jnp.float32)
            for dy in range(ksize):
                for dx in range(ksize):
                    tap = bufa[pl.ds(r0 + dy, th), :, dx : dx + w].astype(
                        jnp.float32
                    )
                    acc[...] += tap * taps_ref[blk, dy * ksize + dx]
            y = jnp.maximum(acc[...] + bias_ref[blk], 0.0)
            wm = jnp.broadcast_to(wmat_ref[blk], (th, c, c))
            out = jax.lax.dot_general(
                wm, y,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (TH, C, W)
            out = out + pwb_ref[blk, :, :w]
            bufb[pl.ds(_PAD + r0, th), :, _PAD : _PAD + w] = out.astype(bufb.dtype)
            return 0

        jax.lax.fori_loop(0, nh, row_body, 0)
        bufa[...] = bufb[...]
        return 0

    jax.lax.fori_loop(0, nb, block_body, 0)

    # Final 1x1 out_conv (3 channels padded to 8 sublanes) in-kernel: the
    # host-side einsum over the 24-channel f32 activation plus its layout
    # change measured ~2 ms/pass at 320^2 — here it's one more row loop.
    o8 = ok_ref.shape[0]

    def out_body(t, _):
        r0 = t * th
        y = bufa[pl.ds(_PAD + r0, th), :, _PAD : _PAD + w].astype(jnp.float32)
        wm = jnp.broadcast_to(ok_ref[...], (th, o8, c))
        o = jax.lax.dot_general(
            wm, y,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (TH, 8, W)
        o = o + ob_ref[:, :w]
        out_ref[0, pl.ds(r0, th), :, :w] = o
        return 0

    jax.lax.fori_loop(0, h // th, out_body, 0)


def fused_refine_stack(
    d: Array,
    refiner_params: dict,
    refiner_stats: dict,
    *,
    hidden_blocks: int = 8,
    ksize: int = 5,
    store_dtype: jnp.dtype = jnp.bfloat16,
    eps: float = 1e-5,
    include_block1: bool = True,
    interpret: bool = False,
) -> tuple[Array, Array]:
    """Run [block1 +] the scanned hidden blocks + out_conv, fused.

    d: (B, H, W, C) NHWC input — the refiner concat (disp_emb / local-corr /
    features) when include_block1, else block1's output. refiner_params /
    refiner_stats: the ConvRefiner subtrees ({block1, hidden, out_conv} /
    {block1, hidden}).

    include_block1=False is the in-context sweet spot: XLA fuses the concat
    front-end directly into block1's shift-accumulate (the reason the
    full-fused kernel lost end-to-end, see ConvRefiner._fused_mode), while
    the remaining 8 hidden blocks + out_conv still skip 8 HBM round-trips of
    lane-padded activations.

    Returns (delta_flow (B,H,W,2), delta_cert (B,H,W,1)) in f32, matching
    `model/network.py:556-563` semantics.
    """
    th_ = fold_block_params(
        refiner_params["hidden"]["block"], refiner_stats["hidden"]["block"], eps
    )
    if include_block1:
        t1 = fold_block_params(refiner_params["block1"], refiner_stats["block1"], eps)
        nb = hidden_blocks + 1
        # stack block1 + hidden into (NB, ...) parameter arrays
        taps = jnp.concatenate([t1[0][None], th_[0]], axis=0)
        bias = jnp.concatenate([t1[1][None], th_[1]], axis=0)
        wmat = jnp.concatenate([t1[2][None], th_[2]], axis=0)
        pwb = jnp.concatenate([t1[3][None], th_[3]], axis=0)
    else:
        nb = hidden_blocks
        taps, bias, wmat, pwb = th_

    b, h, w, c = d.shape
    wp = -(-(w + 2 * _PAD) // 128) * 128
    cp = -(-c // 8) * 8
    hp = h + 2 * _PAD
    e = cp - c
    taps = jnp.pad(taps, ((0, 0), (0, 0), (0, e), (0, 0)))
    bias = jnp.pad(bias, ((0, 0), (0, e), (0, 0)))
    wmat = jnp.pad(wmat, ((0, 0), (0, e), (0, e)))
    pwb = jnp.broadcast_to(jnp.pad(pwb, ((0, 0), (0, e), (0, 0))), (nb, cp, wp))

    # out_conv (3 -> pad 8 sublanes), applied in-kernel after the stack
    ok = jnp.asarray(refiner_params["out_conv"]["kernel"], jnp.float32)[0, 0]
    ob = jnp.asarray(refiner_params["out_conv"]["bias"], jnp.float32)
    ok8 = jnp.pad(jnp.swapaxes(ok, 0, 1), ((0, 8 - ok.shape[1]), (0, e)))
    ob8 = jnp.broadcast_to(
        jnp.pad(ob, (0, 8 - ob.shape[0]))[:, None], (8, wp)
    )

    # cast to the store dtype BEFORE the (W, C) -> (C, W) relayout: the
    # f32 transpose of the materialized concat measured ~1 ms/pass at 320^2
    x = jnp.transpose(d.astype(store_dtype), (0, 1, 3, 2))
    x = jnp.pad(x, ((0, 0), (_PAD, _PAD), (0, cp - c), (_PAD, wp - w - _PAD)))

    tile = _row_tile_for(h, cp, wp)
    kern = functools.partial(
        _stack_kernel, nb=nb, th=tile, h=h, c=cp, w=w, ksize=ksize
    )
    vspec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    img = lambda: pl.BlockSpec((1, hp, cp, wp), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[vspec(), vspec(), vspec(), vspec(), vspec(), vspec(), img()],
        out_specs=pl.BlockSpec((1, h, 8, wp), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, 8, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((hp, cp, wp), x.dtype),
            pltpu.VMEM((hp, cp, wp), x.dtype),
            pltpu.VMEM((tile, cp, w), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(taps, bias, wmat, pwb, ok8, ob8, x)

    res = jnp.transpose(out[:, :, :3, :w], (0, 1, 3, 2))  # (B, H, W, 3) f32
    return res[..., :2], res[..., 2:3]


def fold_block_params(params: dict, batch_stats: dict, eps: float = 1e-5):
    """Fold inference BN into the depthwise conv of one RefineBlock.

    params/batch_stats: the flax subtrees of a RefineBlock ({dw, bn, pw} /
    {bn}), possibly with a leading stacked-blocks axis (nn.scan layout).
    Returns (taps, bias, wmat, pwb) with the layouts _stack_kernel wants
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


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7, 8))
def _probe(taps, bias, wmat, pwb, shape, ksize, interpret,
           store_dtype=jnp.bfloat16, include_block1=True):
    b, h, w, c = shape
    d = jnp.zeros((b, h, w, c), jnp.float32)
    nb = taps.shape[0] - (1 if include_block1 else 0)
    params = {
        "block1": _unfold_zeros(c, ksize),
        "hidden": {"block": _unfold_zeros(c, ksize, lead=nb)},
        "out_conv": {
            "kernel": jnp.zeros((1, 1, c, 3), jnp.float32),
            "bias": jnp.zeros((3,), jnp.float32),
        },
    }
    stats = {
        "block1": {"bn": _bn_zeros(c)},
        "hidden": {"block": {"bn": _bn_zeros(c, lead=nb)}},
    }
    return fused_refine_stack(
        d, params, stats, hidden_blocks=nb, ksize=ksize,
        store_dtype=store_dtype, include_block1=include_block1,
        interpret=interpret,
    )


def _unfold_zeros(c, ksize, lead=None):
    sh = lambda *dims: ((lead,) + dims) if lead else dims
    return {
        "dw": {
            "kernel": jnp.zeros(sh(ksize, ksize, 1, c), jnp.float32),
            "bias": jnp.zeros(sh(c), jnp.float32),
        },
        "bn": {
            "scale": jnp.ones(sh(c), jnp.float32),
            "bias": jnp.zeros(sh(c), jnp.float32),
        },
        "pw": {
            "kernel": jnp.zeros(sh(1, 1, c, c), jnp.float32),
            "bias": jnp.zeros(sh(c), jnp.float32),
        },
    }


def _bn_zeros(c, lead=None):
    sh = (lead, c) if lead else (c,)
    return {
        "mean": jnp.zeros(sh, jnp.float32),
        "var": jnp.ones(sh, jnp.float32),
    }


_PROBE_CACHE: dict = {}


def fused_stack_supported(
    shape: tuple, store_dtype=jnp.bfloat16, ksize: int = 5,
    hidden_blocks: int = 8, include_block1: bool = True,
) -> bool:
    """Per-shape dispatch gate.

    Static profitability rule first (v5e A/Bs, scripts/profile_refine_v2.py +
    the in-context pass A/Bs behind GFNET_REFINE_STACK): the kernel wins
    where XLA's 128-lane channel padding wastes the most — small C at a
    large grid (C=24 @ 320^2: 9.1 -> 2.8 ms standalone; C=73 @ 160^2
    break-even full-fused but profitable hidden-only where the concat
    boundary cost is gone; C>=177 grids are tiny and not worth the compile).
    Shapes passing the rule are then probe-compiled once (cached) so an
    unsupported lowering falls back to flax instead of failing the caller's
    jit.
    """
    b, h, w, c = shape
    c_cap = 80 if not include_block1 else 32
    if c > c_cap or h * w < 128 * 128:
        return False
    wp = -(-(w + 2 * _PAD) // 128) * 128
    cp = -(-c // 8) * 8
    hp = h + 2 * _PAD
    itemsize = jnp.dtype(store_dtype).itemsize
    # 2 ping-pong buffers + pipelined in/out blocks (2x each) + acc scratch
    vmem = 6 * hp * cp * wp * itemsize + _ACC_BUDGET
    if vmem > 88 * 1024 * 1024:
        return False
    key = (b, h, w, c, jnp.dtype(store_dtype).name, ksize, hidden_blocks,
           include_block1)
    hit = _PROBE_CACHE.get(key)
    if hit is not None:
        return hit
    nb = hidden_blocks + (1 if include_block1 else 0)
    taps = jax.ShapeDtypeStruct((nb, ksize * ksize, c, 1), jnp.float32)
    bias = jax.ShapeDtypeStruct((nb, c, 1), jnp.float32)
    wm = jax.ShapeDtypeStruct((nb, c, c), jnp.float32)
    try:
        _probe.lower(
            taps, bias, wm, bias, (b, h, w, c), ksize, False,
            jnp.dtype(store_dtype), include_block1,
        ).compile()
        ok = True
    except Exception:
        ok = False
    _PROBE_CACHE[key] = ok
    return ok
