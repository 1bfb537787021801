"""Per-scale ConvRefiner: iterative flow/certainty refinement head.

Re-design of `model/network.py:444-564` in NHWC flax:
  - warp target features by the current flow (grid_sample,
    ref `network.py:537`) — a gather;
  - resample query features onto the regular G x G grid
    (ref `network.py:547`) — on TPU this is exactly a separable bilinear
    resize (align_corners=False pixel centers), so it runs as two MXU
    matmuls instead of a gather;
  - 1x1-embed the displacement `40/32 * scale_factor * (flow - grid)`
    (ref `network.py:549`);
  - local correlation window (ref `network.py:553`, scales with radius>0);
  - depthwise conv stack: block1 + 8 hidden blocks
    (depthwise 5x5 → BN(momentum .01 torch) → ReLU → 1x1,
    ref `network.py:505-531`), out 1x1 conv in f32 → (Δflow, Δcertainty)
    (ref `network.py:560-563`).

The local-correlation window sampling is non-differentiable in the reference
(`disable_local_corr_grad=True`, `network.py:76`, `local_correlation.py:54`);
we stop_gradient the sampled windows identically.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from gfnet_tpu.core.geometry import normalized_grid
from gfnet_tpu.models.common import torch_uniform_init
from gfnet_tpu.ops.local_correlation import local_correlation
from gfnet_tpu.ops.resize import interpolate, interpolate_s2d
from gfnet_tpu.ops.sampler import grid_sample

Array = jax.Array


# --------------------------------------------------------------------------
# Space-to-depth (factor 2) execution of the refiner conv stack.
#
# At the fine scales the stack's channel counts (24/57 for the flagship) are
# lane-padded to the TPU's 128-lane width on every HBM round-trip (up to 5.3x
# wasted bytes), and the shift-accumulate depthwise conv is VPU-bound. Packing
# 2x2 spatial phases into channels (G, G, C) -> (G/2, G/2, 4C) fixes both at
# once: the tensors fill the lanes, and the depthwise 5x5 becomes a DENSE 3x3
# convolution on 4C channels with zero-structured expanded weights — an MXU
# op. The expansion is exact: tap (ty, tx) of output phase (qy, qx) reads
# input phase ((qy+ty) mod 2, (qx+tx) mod 2) of the s2d cell offset
# (floor((qy+ty)/2), floor((qx+tx)/2)) in {-1, 0, 1}, so a 3x3 kernel covers
# the whole 5x5 receptive field. Same taps, same f32 accumulation — only the
# summation order changes. Params keep their reference-compatible layouts
# ((k, k, 1, C) depthwise, (1, 1, C, C) pointwise, (C,) BN); expansion happens
# per call (tiny einsums against constant 0/1 maps).
# --------------------------------------------------------------------------


def space_to_depth(x: Array) -> Array:
    """(B, H, W, C) -> (B, H/2, W/2, 4C); phase p = 2*py + px, chan p*C + c."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(x: Array) -> Array:
    """Inverse of :func:`space_to_depth`."""
    b, h2, w2, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h2, w2, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, 2 * h2, 2 * w2, c)


@functools.lru_cache(maxsize=8)
def _s2d_tap_map(k: int) -> np.ndarray:
    """(3, 3, 4, 4, k*k) 0/1 map: [dY+1, dX+1, p_in, p_out, tap]."""
    t = np.zeros((3, 3, 4, 4, k * k), np.float32)
    r = k // 2
    for qy in range(2):
        for qx in range(2):
            for ty in range(-r, r + 1):
                for tx in range(-r, r + 1):
                    dy, py = (qy + ty) // 2, (qy + ty) % 2
                    dx, px = (qx + tx) // 2, (qx + tx) % 2
                    t[dy + 1, dx + 1, 2 * py + px, 2 * qy + qx,
                      (ty + r) * k + (tx + r)] = 1.0
    return t


def _expand_dw_kernel(w: Array, k: int, c: int) -> Array:
    """Depthwise (k, k, 1, C) -> dense s2d HWIO (3, 3, 4C, 4C)."""
    tap = jnp.asarray(_s2d_tap_map(k))  # (3,3,4,4,kk)
    wt = jnp.einsum("abiot,tc->abioc", tap, w.reshape(k * k, c))
    eye = jnp.eye(c, dtype=w.dtype)
    full = wt[..., :, None] * eye  # (3,3,4,4,C,C) diag over channel
    return full.transpose(0, 1, 2, 4, 3, 5).reshape(3, 3, 4 * c, 4 * c)


def _expand_pw_kernel(w: Array) -> Array:
    """Pointwise (1, 1, C, D) -> phase-block-diagonal (1, 1, 4C, 4D)."""
    c, d = w.shape[-2], w.shape[-1]
    eye4 = jnp.eye(4, dtype=w.dtype)
    full = eye4[:, None, :, None] * w[0, 0][None, :, None, :]  # (4,C,4,D)
    return full.reshape(1, 1, 4 * c, 4 * d)


def _conv_s2d(x: Array, kernel: Array, bias: Array, dtype) -> Array:
    """NHWC conv in `dtype` operands; returns f32 (bias added in f32).

    No preferred_element_type: TPU bf16 convs accumulate f32 internally
    anyway, and a widened output dtype breaks the conv VJP (cotangent/operand
    dtype mismatch in the transpose conv)."""
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), kernel.astype(dtype),
        window_strides=(1, 1),
        padding="SAME" if kernel.shape[0] > 1 else "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y.astype(jnp.float32) + bias.astype(jnp.float32)


class DepthwiseConv(nn.Module):
    """Depthwise KxK conv lowered as K^2 pad-slice multiply-accumulates.

    XLA lowers `feature_group_count == C` convs through the MXU with channels
    padded to the 128-lane width; at the fine refiner scales (C=24/73/177 at
    320^2/160^2/80^2 for 448-input) most lanes are wasted. The shift-accumulate
    form is pure VPU elementwise work and measures ~2.6x faster end-to-end on
    v5e (scripts/profile_dwconv.py). The accumulator is kept in f32 so bf16
    inputs match the MXU conv's f32 accumulation (per-tap bf16 rounding
    measurably drifts: ~3e-2 max abs on unit-scale activations); taps are cast
    up per-slice, the result cast back once after the bias add.

    Param layout matches `nn.Conv(feature_group_count=C)` — kernel
    (K, K, 1, C), bias (C,) — so converted reference checkpoints
    (`model/network.py:505-531` dw convs) load unchanged.
    """

    features: int
    kernel: int = 5
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, s2d: bool = False) -> Array:
        k = self.kernel
        kernel = self.param("kernel", torch_uniform_init(), (k, k, 1, self.features))
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        if s2d:
            # (B, G/2, G/2, 4C) phase-packed input: dense 3x3 MXU conv with
            # the zero-structured expanded weights (see module docstring).
            w3 = _expand_dw_kernel(kernel.astype(jnp.float32), k, self.features)
            b4 = jnp.tile(bias, 4)
            return _conv_s2d(x, w3, b4, self.dtype).astype(self.dtype)
        w = kernel.astype(jnp.float32)
        x = x.astype(self.dtype)
        p = k // 2
        _, h, ww, _ = x.shape
        xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
        out = jnp.zeros(x.shape, jnp.float32)
        for dy in range(k):
            for dx in range(k):
                tap = xp[:, dy : dy + h, dx : dx + ww, :].astype(jnp.float32)
                out = out + tap * w[dy, dx, 0, :]
        return (out + bias.astype(jnp.float32)).astype(self.dtype)


class PhaseBN(nn.Module):
    """BatchNorm with reference-layout (C,) stats/params that can normalize a
    phase-folded s2d tensor (..., P*C); P=1 reproduces nn.BatchNorm exactly
    (same f32 moments, same biased-variance running update)."""

    features: int
    momentum: float = 0.99
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: Array, train: bool, phases: int = 1) -> Array:
        c = self.features
        scale = self.param("scale", nn.initializers.ones_init(), (c,))
        bias = self.param("bias", nn.initializers.zeros_init(), (c,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        xf = x.astype(jnp.float32)
        if train:
            red = tuple(range(x.ndim - 1))
            n = x.size // x.shape[-1] * phases
            s1 = jnp.sum(xf, axis=red)
            s2 = jnp.sum(xf * xf, axis=red)
            if phases > 1:
                s1 = s1.reshape(phases, c).sum(0)
                s2 = s2.reshape(phases, c).sum(0)
            mean = s1 / n
            var = jnp.maximum(0.0, s2 / n - mean * mean)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var
        else:
            mean, var = ra_mean.value, ra_var.value
        tile = (lambda v: jnp.tile(v, phases)) if phases > 1 else (lambda v: v)
        # literal nn.BatchNorm arithmetic: (x - mean) * (scale * rsqrt) + bias
        mul = scale * jax.lax.rsqrt(var + self.epsilon)
        return (xf - tile(mean)) * tile(mul) + tile(bias)


class PwConv(nn.Module):
    """1x1 conv with reference param layout, s2d-aware (block-diag expand)."""

    in_features: int
    features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, s2d: bool = False) -> Array:
        kernel = self.param(
            "kernel", torch_uniform_init(), (1, 1, self.in_features, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        if not s2d:
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype), (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return y + bias.astype(y.dtype)
        w4 = _expand_pw_kernel(kernel)
        return _conv_s2d(x, w4, jnp.tile(bias, 4), self.dtype).astype(self.dtype)


class RefineBlock(nn.Module):
    """depthwise 5x5 conv → BN → ReLU → 1x1 conv (ref `network.py:505-531`)."""

    features: int
    kernel: int = 5
    bn_momentum: float = 0.99  # torch 0.01
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, train: bool = False, s2d: bool = False) -> Array:
        x = DepthwiseConv(self.features, self.kernel, dtype=self.dtype, name="dw")(
            x, s2d=s2d
        )
        x = PhaseBN(self.features, momentum=self.bn_momentum, name="bn")(
            x, train, phases=4 if s2d else 1
        ).astype(self.dtype)
        x = jax.nn.relu(x)
        return PwConv(self.features, self.features, dtype=self.dtype, name="pw")(
            x, s2d=s2d
        )


class _HiddenScanBody(nn.Module):
    """Adapter so the 8 identical hidden blocks run as one nn.scan
    (single compiled body; params/batch_stats stacked on a depth axis)."""

    features: int
    kernel: int
    train: bool
    dtype: jnp.dtype
    s2d: bool = False

    @nn.compact
    def __call__(self, x: Array, _):
        y = RefineBlock(self.features, self.kernel, dtype=self.dtype, name="block")(
            x, self.train, s2d=self.s2d
        )
        return y, None


class ConvRefiner(nn.Module):
    """One coarse-to-fine refinement head (ref `network.py:444-564`)."""

    hidden_dim: int
    displacement_dim: int
    radius: int  # local correlation radius; 0 disables (corr_in_other=False)
    hidden_blocks: int = 8
    kernel_size: int = 5
    dtype: jnp.dtype = jnp.bfloat16

    def _s2d_enabled(self, g: int, train: bool = False) -> bool:
        """Space-to-depth stack execution gate.

        Wins where lane padding + the VPU depthwise bite: large grids at small
        channel counts (flagship scales "2"/"1": C=57/24 at G>=128; measured
        v5e, scripts/profile_s2d.py). At C>=96 the dense-conv redundancy
        (9*(4C)^2 MACs vs 25*C) overtakes the padding saved — keep the
        shift-accumulate path there. GFNET_S2D=0 hard-off, =1 forces it for
        any even grid (CPU tests use this)."""
        flag = os.environ.get("GFNET_S2D")
        if flag == "0" or g % 2:
            return False
        if flag == "1":
            return True
        # Training keeps the plain stack: measured on v5e (batch 8, bf16,
        # flagship) the s2d train step is 2.16 s vs 1.78 s with it off —
        # the expanded dense-conv backward outweighs the lane-padding saved
        # (workspace/ab_trainstep_r5.json). Inference keeps the measured win.
        return (not train) and g >= 128 and self.hidden_dim <= 96

    @nn.compact
    def __call__(
        self,
        query_feat: Array,  # (B, h, w, C) view-A features at this scale
        target_feat: Array,  # (B, h, w, C) view-B features
        flow: Array,  # (B, G, G, 2) normalized target coords
        scale_factor: float = 1.0,
        train: bool = False,
    ) -> tuple[Array, Array]:
        g = flow.shape[1]
        dt = self.dtype

        # Warp target features to the query grid by the current flow.
        # Training defaults to the packed lowering: the patch-slice gather's
        # VJP is a per-point slice-scatter, while packed transposes to a
        # take_along_axis scatter on the 4C-packed map (the round-3 training
        # path). Inference keeps the patch dispatch (fastest forward).
        warp_impl = (
            os.environ.get("GFNET_TRAIN_WARP", "packed") if train else "auto"
        )
        # disp_emb: PwConv carries nn.Conv's exact param layout/names
        # ((1,1,2,D) kernel + (D,) zero-init bias) and adds the s2d-expanded
        # execution for the phase-packed front-end below.
        disp_emb = PwConv(2, self.displacement_dim, dtype=dt, name="disp_emb")

        if self._s2d_enabled(g, train) and self.radius == 0:
            # Phase-packed front-end (radius-0 fine scales, the largest
            # grids): every component is produced DIRECTLY in s2d layout, so
            # no (G, G, C<=24) tensor — lane-padded up to 16x — ever hits HBM
            # between the warp and the conv stack. Exact same math:
            #   - warp: 4 phase gathers (same total gather rows);
            #   - grid_feature: phase-sliced separable resize (interpolate_s2d);
            #   - disp_emb: block-diagonal expanded 1x1 (PwConv s2d).
            g2 = g // 2
            grid_full = normalized_grid(g, g)[None]
            scale_disp = 40.0 / 32.0 * scale_factor
            xhat_ph, disp_ph = [], []
            for py in (0, 1):
                for px in (0, 1):
                    f_p = flow[:, py::2, px::2, :]
                    xhat_ph.append(
                        grid_sample(target_feat.astype(dt), f_p, impl=warp_impl)
                    )
                    disp_ph.append(
                        scale_disp * (f_p - grid_full[:, py::2, px::2, :])
                    )
            grid_s2d = interpolate_s2d(query_feat.astype(dt), (g, g))
            emb_s2d = disp_emb(
                jnp.concatenate(disp_ph, axis=-1).astype(dt), s2d=True
            )
            c, dd = query_feat.shape[-1], self.displacement_dim
            parts = []
            for p in range(4):
                parts += [
                    grid_s2d[..., p * c:(p + 1) * c],
                    xhat_ph[p],
                    emb_s2d[..., p * dd:(p + 1) * dd],
                ]
            d = jnp.concatenate(parts, axis=-1)
            assert d.shape == (flow.shape[0], g2, g2, 4 * self.hidden_dim), d.shape
            return self._run_stack_s2d(d, train, dt)

        x_hat = grid_sample(target_feat.astype(dt), flow, impl=warp_impl)
        # Query features at the regular grid = separable bilinear resize.
        grid_feature = interpolate(query_feat.astype(dt), (g, g), "bilinear", False)

        grid = normalized_grid(g, g)[None]
        in_disp = flow - grid
        emb = disp_emb((40.0 / 32.0 * scale_factor * in_disp).astype(dt))

        feats = [grid_feature, x_hat, emb]
        if self.radius > 0:
            # Only the window sampling is non-differentiable in the reference
            # (`local_correlation.py:54`): grads flow into the query features
            # but not through the warped target windows.
            # Inference stores the Pallas operands in the model compute dtype
            # (bf16 flagship): lossless — the features were produced in bf16 —
            # and it halves the kernel's VMEM/HBM footprint. Training pins the
            # XLA patch-gather impl: its backward is plain XLA (the Pallas
            # custom-VJP kernel's batched dot fails to lower under AD on
            # libtpu 2026-08, and the compile probe only covers the forward),
            # and f32 operands keep backward numerics unchanged.
            corr = local_correlation(
                grid_feature.astype(jnp.float32),
                jax.lax.stop_gradient(target_feat.astype(jnp.float32)),
                jax.lax.stop_gradient(flow),
                self.radius,
                impl="patch" if train else "auto",
                compute_dtype=None if train else dt,
            )
            feats.append(corr.astype(dt))
        d = jnp.concatenate(feats, axis=-1)
        assert d.shape[-1] == self.hidden_dim, (d.shape, self.hidden_dim)

        if self._s2d_enabled(g, train):
            # Space-to-depth execution of the whole stack (see top of file):
            # dense MXU convs on 4C lanes replace the VPU shift-accumulate
            # depthwise + lane-padded round-trips. Exact same math; works in
            # training too (PhaseBN folds phase stats back to (C,)).
            return self._run_stack_s2d(space_to_depth(d), train, dt)

        # The fused Pallas refine-stack kernel (git history: ops/pallas/
        # refine_stack.py, removed 2026-08-20) lost its in-context A/B twice —
        # XLA fuses the concat front-end into block1's taps, and the kernel's
        # boundary relayouts cost more than its VMEM residency saved
        # (scripts/ab_round3.py). The space-to-depth path above is the
        # winning fix for the same lane-padding problem.
        d = RefineBlock(self.hidden_dim, self.kernel_size, dtype=dt, name="block1")(d, train)
        # Training remats each hidden block: the scan otherwise stacks all 8
        # residual activations for backward, and XLA's (8,128)-tiled layout
        # pads the small channel counts up to 5.3x — at the flagship train
        # shapes that alone is tens of GB of HLO temps (single-chip HBM OOM).
        # Recomputing a depthwise block is far cheaper than spilling it.
        body = nn.remat(_HiddenScanBody) if train else _HiddenScanBody
        Scanned = nn.scan(
            body,
            variable_axes={"params": 0, "batch_stats": 0},
            split_rngs={"params": True},
            length=self.hidden_blocks,
            metadata_params={nn.meta.PARTITION_NAME: None},
        )
        d, _ = Scanned(
            self.hidden_dim, self.kernel_size, train, dt, name="hidden"
        )(d, None)
        out = PwConv(self.hidden_dim, 3, dtype=jnp.float32, name="out_conv")(
            d.astype(jnp.float32)
        )
        delta_flow, delta_cert = out[..., :2], out[..., 2:3]
        return delta_flow, delta_cert

    def _run_stack_s2d(self, d: Array, train: bool, dt) -> tuple[Array, Array]:
        """Conv stack on a phase-packed (B, G/2, G/2, 4*hidden) input; called
        from __call__ (compact context), so submodule names match the
        unpacked path and checkpoints load into either."""
        d = RefineBlock(self.hidden_dim, self.kernel_size, dtype=dt,
                        name="block1")(d, train, s2d=True)
        body = nn.remat(_HiddenScanBody) if train else _HiddenScanBody
        Scanned = nn.scan(
            body,
            variable_axes={"params": 0, "batch_stats": 0},
            split_rngs={"params": True},
            length=self.hidden_blocks,
            metadata_params={nn.meta.PARTITION_NAME: None},
        )
        d, _ = Scanned(
            self.hidden_dim, self.kernel_size, train, dt, True, name="hidden"
        )(d, None)
        out = PwConv(self.hidden_dim, 3, dtype=jnp.float32, name="out_conv")(
            d.astype(jnp.float32), s2d=True
        )
        out = depth_to_space(out.astype(jnp.float32))
        return out[..., :2], out[..., 2:3]
