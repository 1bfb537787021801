"""Pallas TPU kernel for local correlation windows.

The reference's hottest op (`utils/local_correlation.py:4-72`) is a per-cell
(2r+1)^2-tap bilinear window gather against the target feature map followed by
a dot with the query feature. A naive gather formulation re-reads
B*G*G*K*C*4corners values from HBM; this kernel instead:

  1. exploits that all K taps of one cell sit on an integer-pixel lattice
     sharing ONE fractional offset, so a cell needs only a contiguous
     (2r+2)^2 patch and a 4-term shifted combine;
  2. keeps the (padded) target feature map resident in VMEM per (batch, row)
     program, so each patch read is a VMEM dynamic slice, not an HBM gather;
  3. reorders dot-then-combine (both linear) and batches a whole row of
     cells: G patch copies into VMEM scratch, then ONE batched
     (G, win^2, C) x (G, C) MXU contraction + a vectorized VPU bilinear
     combine — no per-cell scalar compute;
  4. feeds the per-cell integer bases through BLOCKED SMEM inputs (one
     (rows*G,) int32 block per program) for data-dependent slice indices;
     fractional weights ride a VMEM operand. (Scalar prefetch would load the
     whole B*G*G base array into SMEM — capacity-crashes the compiler at
     B >= 8 fine scales.)

Zero-padding semantics of `grid_sample(padding_mode="zeros",
align_corners=False)` are reproduced exactly by zero-padding the target with
margin P >= 2r+2 and clamping base indices — fully-out-of-range windows land
entirely in the zero margin (golden-tested against the gather reference).

A custom VJP propagates gradients to the query features only, matching the
reference's `disable_local_corr_grad=True` (`model/network.py:76`,
`local_correlation.py:54`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _precompute(flow: Array, h: int, w: int, radius: int, pad: int):
    """Integer window bases (into the padded map) + shared fractional weights."""
    px = ((flow[..., 0] + 1) * w - 1) * 0.5
    py = ((flow[..., 1] + 1) * h - 1) * 0.5
    # guard non-finite flow: send the window fully into the zero margin
    px = jnp.where(jnp.isfinite(px), px, -1e9)
    py = jnp.where(jnp.isfinite(py), py, -1e9)
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    fx = (px - x0).astype(jnp.float32)
    fy = (py - y0).astype(jnp.float32)
    win = 2 * radius + 2
    bx = jnp.clip(x0.astype(jnp.int32) - radius + pad, 0, w + 2 * pad - win)
    by = jnp.clip(y0.astype(jnp.int32) - radius + pad, 0, h + 2 * pad - win)
    return by, bx, fy, fx


def _load_patches(by_ref, bx_ref, target_ref, patches_ref, stage_ref, row, g, win):
    """by_ref/bx_ref: (1, 1, 1, rows*g) int32 SMEM blocks (this program's cells);
    `row` is the in-block offset of the grid row being loaded."""
    if stage_ref is None:
        # 32-bit storage: dynamic vector loads at arbitrary (y, x) offsets
        # lower directly.
        def copy(j, _):
            y = by_ref[0, 0, 0, row + j]
            x = bx_ref[0, 0, 0, row + j]
            patches_ref[j] = target_ref[0, pl.ds(y, win), pl.ds(x, win), :]
            return 0

        jax.lax.fori_loop(0, g, copy, 0)
        return

    # 16-bit storage: Mosaic only lowers dynamic sublane-dim offsets it can
    # prove 8-aligned, and window bases never are. Two-step extraction:
    # an 8-aligned widened bf16 load ((x // 8) * 8 is provably aligned),
    # converted f32 into a staging scratch, then the residual 0..7 shift as
    # a dynamic f32 load (f32 has no alignment restriction).
    wide = stage_ref.shape[1]

    def copy(j, _):
        y = by_ref[0, 0, 0, row + j]
        x = bx_ref[0, 0, 0, row + j]
        x8 = (x // 8) * 8
        stage_ref[:] = target_ref[0, pl.ds(y, win), pl.ds(x8, wide), :].astype(
            jnp.float32
        )
        patches_ref[j] = stage_ref[:, pl.ds(x - x8, win), :]
        return 0

    jax.lax.fori_loop(0, g, copy, 0)


def _rows_per_program(g: int) -> int:
    """Largest row-tile in {8,4,2,1} dividing g — amortizes the per-program
    target-block fetch (the dominant cost when every program re-pulls the
    full padded feature map from HBM) while staying inside VMEM."""
    for r in (8, 4, 2, 1):
        if g % r == 0:
            return r
    return 1


@functools.lru_cache(maxsize=32)
def _selection_matrices(win: int, win_w: int) -> tuple[np.ndarray, ...]:
    """Four (win*win_w, K) 0/1 matrices mapping the flattened (win, win_w)
    patch lattice to the K=(win-1)^2 window taps for each bilinear corner
    (dy, dx). win_w >= win is the (possibly tiling-padded) patch width; the
    extra columns never select."""
    k = (win - 1) ** 2
    mats = []
    for dy in (0, 1):
        for dx in (0, 1):
            S = np.zeros((win * win_w, k), np.float32)
            for ky in range(win - 1):
                for kx in range(win - 1):
                    S[(ky + dy) * win_w + (kx + dx), ky * (win - 1) + kx] = 1.0
            mats.append(S)
    return tuple(mats)


def _corner_weights(fw, g):
    """(g,1) bilinear corner weights in (dy,dx) = 00,01,10,11 order."""
    fy = fw[:, 0].reshape(g, 1)
    fx = fw[:, 1].reshape(g, 1)
    return ((1 - fy) * (1 - fx), (1 - fy) * fx, fy * (1 - fx), fy * fx)


def _fwd_kernel(by_ref, bx_ref, query_ref, fw_ref, sel_ref, target_ref, out_ref,
                patches_ref, *scratch, radius, g, c, rows):
    stage = scratch[0] if scratch else None
    win = 2 * radius + 2
    inv_sqrt_c = 1.0 / float(np.sqrt(c))

    def rowloop(i, _):
        row = i * g
        _load_patches(by_ref, bx_ref, target_ref, patches_ref, stage, row, g, win)

        # collapse (win, win) keeping the lane (C) dim — supported reshape.
        # The dot runs f32 even for bf16 storage (patches are staged f32;
        # Mosaic cannot lower this batched-vector matmul form with bf16
        # operands anyway) — bf16 buys VMEM residency + HBM traffic, not
        # FLOPs; the kernel is memory-bound so the MXU dtype is irrelevant.
        patches = patches_ref[:].reshape(g, win * win, c)
        q = query_ref[0, i].astype(jnp.float32)  # (g, C)
        s = jax.lax.dot_general(
            patches, q,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (g, win^2)

        # bilinear combine as 4 constant-selection MXU matmuls (mosaic
        # cannot split the lane dim win^2 back into (win, win))
        mats = [sel_ref[a] for a in range(4)]
        ws = _corner_weights(fw_ref[0, i], g)
        comb = sum(
            jnp.dot(w * s, m, preferred_element_type=jnp.float32)
            for w, m in zip(ws, mats)
        )  # (g, K)
        out_ref[0, i] = comb * inv_sqrt_c
        return 0

    jax.lax.fori_loop(0, rows, rowloop, 0)


def _bwd_kernel(by_ref, bx_ref, g_ref, fw_ref, sel_ref, target_ref, dq_ref,
                patches_ref, *scratch, radius, g, c, rows):
    """dq[j] = spread(g_j) · patch_j: batched adjoint of dot-then-combine."""
    stage = scratch[0] if scratch else None
    win = 2 * radius + 2
    inv_sqrt_c = 1.0 / float(np.sqrt(c))

    def rowloop(i, _):
        row = i * g
        _load_patches(by_ref, bx_ref, target_ref, patches_ref, stage, row, g, win)

        gj = g_ref[0, i] * inv_sqrt_c  # (g, K)
        mats = [sel_ref[a] for a in range(4)]
        ws = _corner_weights(fw_ref[0, i], g)
        # adjoint of the combine: sw = sum_ab w_ab * (g @ S_ab^T), (g, win^2)
        sw = sum(
            w * jnp.dot(gj, m.T, preferred_element_type=jnp.float32)
            for w, m in zip(ws, mats)
        )
        patches = patches_ref[:].reshape(g, win * win, c)
        dq = jax.lax.dot_general(
            sw, patches,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (g, C)
        dq_ref[0, i] = dq
        return 0

    jax.lax.fori_loop(0, rows, rowloop, 0)


def _run(kernel, main_in, by, bx, fw, target_pad, out_channels, *, radius, interpret):
    b, g1, g2 = main_in.shape[0], main_in.shape[1], main_in.shape[2]
    hp, wp, c = target_pad.shape[1], target_pad.shape[2], target_pad.shape[3]
    win = 2 * radius + 2
    sixteen_bit = target_pad.dtype.itemsize < 4
    sel = jnp.asarray(np.stack(_selection_matrices(win, win)))

    rows = _rows_per_program(g1)
    kern = functools.partial(kernel, radius=radius, g=g2, c=c, rows=rows)
    # Window bases ride BLOCKED SMEM inputs — only this program's rows*g2
    # cells (a few KB) — NOT scalar prefetch, which loads the whole (B*G*G)
    # array into SMEM and blows its capacity at B >= 8 flagship fine scales
    # (the remote compiler subprocess crashes outright; scripts/probe_lc_b8.py).
    nt = g1 // rows
    # trailing (1, rows*g2) dims satisfy the block-shape tiling rule (equal to
    # the respective array dims) while keeping the SMEM block per-program
    by = by.reshape(b, nt, 1, rows * g2)
    bx = bx.reshape(b, nt, 1, rows * g2)
    return pl.pallas_call(
        kern,
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, 1, 1, rows * g2), lambda bb, i: (bb, i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1, rows * g2), lambda bb, i: (bb, i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, rows, g2, main_in.shape[3]),
                         lambda bb, i: (bb, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, g2, 2), lambda bb, i: (bb, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(sel.shape, lambda bb, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hp, wp, c), lambda bb, i: (bb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, rows, g2, out_channels), lambda bb, i: (bb, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((g2, win, win, c), jnp.float32),
        ]
        + (
            # f32 staging for the aligned-load + residual-shift extraction
            # (see _load_patches); wide = win + 7 rounded to the 8-sublane
            # tiling so any 0..7 residual slice fits.
            [pltpu.VMEM((win, -(-(win + 7) // 8) * 8, c), jnp.float32)]
            if sixteen_bit
            else []
        ),
        out_shape=jax.ShapeDtypeStruct((b, g1, g2, out_channels), jnp.float32),
        # The default scoped-vmem limit is context-dependent (16M was observed
        # inside the two-pass matcher graph vs ~64M standalone), which made
        # compile-probe dispatch unreliable; pin the kernel's own budget so
        # in-model and probe compiles agree, and big-map shapes (2@560) fit.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(by, bx, main_in, fw, sel, target_pad)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def local_correlation_pallas(
    query: Array, target: Array, flow: Array, radius: int,
    interpret: bool = False, compute_dtype: jnp.dtype = jnp.float32,
) -> Array:
    """(B, G, G, C), (B, H, W, C), (B, G, G, 2) → (B, G, G, (2r+1)^2).

    compute_dtype=bfloat16 stores the padded target + query feature operands
    in bf16 (the MXU contraction still accumulates f32) — halves the VMEM
    residency so the biggest flagship shape (2@560, 45 MB f32) fits, and
    halves HBM traffic everywhere. Lossless when the features were produced
    in bf16 upstream (the flagship inference path is)."""
    out, _ = _fwd(query, target, flow, radius, interpret, compute_dtype)
    return out


def _prep(query, target, flow, radius, dtype=jnp.float32):
    b, g1, g2, _ = query.shape
    _, h, w, _ = target.shape
    pad = 2 * radius + 4
    win = 2 * radius + 2
    # 16-bit storage reads a widened aligned patch from base (bx // 8) * 8
    # (see _load_patches): `extra` right margin keeps that read in bounds
    # under the unchanged base clamp [0, w + 2*pad - win]. The widened tail
    # is never selected, so zeros-padding semantics (incl. fully-out-of-range
    # windows) hold as-is.
    wide = -(-(win + 7) // 8) * 8 if jnp.dtype(dtype).itemsize < 4 else win
    extra = wide - win
    by, bx, fy, fx = _precompute(flow.astype(jnp.float32), h, w, radius, pad)
    target_pad = jnp.pad(
        target.astype(dtype), ((0, 0), (pad, pad), (pad, pad + extra), (0, 0))
    )
    fw = jnp.stack([fy, fx], axis=-1)  # (B, G, G, 2)
    flat = lambda t: t.reshape(b * g1 * g2)
    return flat(by), flat(bx), fw, target_pad


def _fwd(query, target, flow, radius, interpret, compute_dtype=jnp.float32):
    k = (2 * radius + 1) ** 2
    by, bx, fw, target_pad = _prep(query, target, flow, radius, compute_dtype)
    out = _run(
        _fwd_kernel, query.astype(compute_dtype), by, bx, fw, target_pad, k,
        radius=radius, interpret=interpret,
    )
    return out, (target, flow)


def _bwd(radius, interpret, compute_dtype, res, g):
    target, flow = res
    # backward (training) always runs f32 — the stop-grad window sampling
    # means only dq flows, and training numerics stay unchanged.
    by, bx, fw, target_pad = _prep(g, target, flow, radius)  # g has query's grid shape
    dq = _run(
        _bwd_kernel, g.astype(jnp.float32), by, bx, fw, target_pad,
        target.shape[3], radius=radius, interpret=interpret,
    )
    # no grads into target/flow (reference: window sampling under no_grad)
    return dq, None, None


local_correlation_pallas.defvjp(_fwd, _bwd)
