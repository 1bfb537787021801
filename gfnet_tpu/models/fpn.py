"""Full-resolution conv FPN encoder/decoder.

Re-design of `model/FPN.py` (FPNEncoder `:5-36`, FPNDecoder_concat `:39-69`,
Conv2d wrapper `:95-134`, Swish `:88-93`) in NHWC flax. BatchNorm everywhere
(norm_type='BN' on the GFNet path, `model/network.py:62-63`): torch momentum
0.1 → flax momentum 0.9; refiners use torch 0.01 → flax 0.99. Under a
data-sharded jit the batch-stat reductions are global across the mesh, giving
sync-BN semantics for free.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from gfnet_tpu.models.common import swish, torch_uniform_init
from gfnet_tpu.ops.resize import interpolate, interpolate_s2d
from gfnet_tpu.ops.s2d import depth_to_space_n, expand_dense_kernel, space_to_depth_n

Array = jax.Array


class TorchConv(nn.Module):
    """Conv with nn.Conv's exact param layout ((K,K,I,O) HWIO kernel +
    optional (O,) bias) and torch-style symmetric K//2 padding, plus an
    optional space-to-depth execution mode: `s2d=(p_in, p_out)` consumes a
    phase-packed input and emits a phase-packed output via the
    zero-structured expanded kernel (ops/s2d.py) — identical math on a
    p-times-smaller, lane-filling layout."""

    features: int
    kernel: int
    stride: int = 1
    use_bias: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, s2d: tuple[int, int] | None = None) -> Array:
        k = self.kernel
        in_feat = x.shape[-1] if s2d is None else x.shape[-1] // s2d[0] ** 2
        kernel = self.param("kernel", torch_uniform_init(), (k, k, in_feat, self.features))
        bias = (
            self.param("bias", nn.initializers.zeros_init(), (self.features,))
            if self.use_bias else None
        )
        if s2d is None:
            w, strides, pad = kernel, (self.stride, self.stride), k // 2
        else:
            p_in, p_out = s2d
            w = expand_dense_kernel(kernel, p_in, p_out, self.stride)
            strides, pad = (1, 1), (w.shape[0] - 1) // 2
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w.astype(self.dtype), strides,
            [(pad, pad), (pad, pad)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if bias is not None:
            b = bias if s2d is None else jnp.tile(bias, s2d[1] ** 2)
            y = y + b.astype(y.dtype)
        return y


class ConvBNAct(nn.Module):
    """conv → BN → leaky_relu(0.1) (ref `model/FPN.py:95-128`)."""

    features: int
    kernel: int
    stride: int = 1
    use_bn: bool = True
    act: str = "leaky_relu"  # or "swish" or "none"
    bn_momentum: float = 0.9  # flax convention (= 1 - torch momentum)
    dtype: jnp.dtype = jnp.bfloat16
    # The encoder's Conv2d wrapper drops conv bias under BN (`FPN.py:113`),
    # but the decoder/merge Sequentials keep it (plain nn.Conv2d defaults,
    # `FPN.py:43-52`, `network.py:66`) — parametrized for checkpoint parity.
    conv_bias: bool | None = None

    @nn.compact
    def __call__(
        self, x: Array, train: bool = False, s2d: tuple[int, int] | None = None
    ) -> Array:
        from gfnet_tpu.models.refiner import PhaseBN

        use_bias = (not self.use_bn) if self.conv_bias is None else self.conv_bias
        x = TorchConv(
            self.features, self.kernel, self.stride, use_bias,
            dtype=self.dtype, name="conv",
        )(x, s2d=s2d)
        if self.use_bn:
            # PhaseBN == nn.BatchNorm leaf for leaf (params scale/bias, stats
            # mean/var, f32 moments; tested in tests/test_refiner_s2d.py) and
            # additionally folds phase-packed channels back to (C,) stats.
            x = PhaseBN(
                self.features, momentum=self.bn_momentum, epsilon=1e-5, name="bn"
            )(x, train, phases=1 if s2d is None else s2d[1] ** 2).astype(self.dtype)
        if self.act == "leaky_relu":
            x = jax.nn.leaky_relu(x, 0.1)
        elif self.act == "swish":
            x = swish(x)
        return x


class FPNEncoder(nn.Module):
    """4-stage encoder, strides 1/2/4/8 (ref `model/FPN.py:5-36`).

    feat_chs fine→coarse, e.g. (8, 16, 32, 64).
    """

    feat_chs: Sequence[int]
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, train: bool = False, s2d: bool = False) -> list[Array]:
        c0, c1, c2, c3 = self.feat_chs
        dt = self.dtype
        if s2d:
            # Phase-packed execution of the fine stages (identical math, see
            # ops/s2d.py): stage 0 runs 4x4-packed (C=3..8 -> 48..128 lanes
            # at H/4), stage 1 2x2-packed, downsample2 unpacks — every conv
            # becomes a stride-1 dense 3x3 on an H/4 x W/4 grid with
            # lane-filling channels, instead of full-resolution maps that
            # the (8,128)-lane tiling pads up to 16x. The full-res conv01/
            # conv11 maps are materialized ONCE each for the decoder.
            xp = space_to_depth_n(x.astype(dt), 4)
            xp = ConvBNAct(c0, 7, dtype=dt, name="conv00")(xp, train, s2d=(4, 4))
            c01p = ConvBNAct(c0, 5, dtype=dt, name="conv01")(xp, train, s2d=(4, 4))
            xp = ConvBNAct(c1, 5, 2, dtype=dt, name="downsample1")(c01p, train, s2d=(4, 2))
            xp = ConvBNAct(c1, 3, dtype=dt, name="conv10")(xp, train, s2d=(2, 2))
            c11p = ConvBNAct(c1, 3, dtype=dt, name="conv11")(xp, train, s2d=(2, 2))
            x = ConvBNAct(c2, 5, 2, dtype=dt, name="downsample2")(c11p, train, s2d=(2, 1))
            # conv01 stays 4x4-packed: its ONLY consumer is the decoder's
            # full-res stage, which runs packed too (see FPNDecoder) — the
            # lane-padded (H, W, c0) map never exists.
            conv01 = c01p
            conv11 = depth_to_space_n(c11p, 2)
        else:
            x = ConvBNAct(c0, 7, dtype=dt, name="conv00")(x.astype(dt), train)
            conv01 = ConvBNAct(c0, 5, dtype=dt, name="conv01")(x, train)
            x = ConvBNAct(c1, 5, 2, dtype=dt, name="downsample1")(conv01, train)
            x = ConvBNAct(c1, 3, dtype=dt, name="conv10")(x, train)
            conv11 = ConvBNAct(c1, 3, dtype=dt, name="conv11")(x, train)
            x = ConvBNAct(c2, 5, 2, dtype=dt, name="downsample2")(conv11, train)
        x = ConvBNAct(c2, 3, dtype=dt, name="conv20")(x, train)
        conv21 = ConvBNAct(c2, 3, dtype=dt, name="conv21")(x, train)
        x = ConvBNAct(c3, 3, 2, dtype=dt, name="downsample3")(conv21, train)
        x = ConvBNAct(c3, 3, dtype=dt, name="conv30")(x, train)
        conv31 = ConvBNAct(c3, 3, dtype=dt, name="conv31")(x, train)
        return [conv01, conv11, conv21, conv31]


class FPNDecoder(nn.Module):
    """Top-down concat-fusion decoder (ref `model/FPN.py:39-69`).

    Produces 4 levels at strides 8/4/2/1 (out0..out3).
    """

    feat_chs: Sequence[int]  # fine→coarse, e.g. (8, 16, 32, 64)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self, conv01: Array, conv11: Array, conv21: Array, conv31: Array,
        train: bool = False, s2d: bool = False,
    ) -> list[Array]:
        """s2d=True: `conv01` arrives 4x4-phase-packed (B, H/4, W/4, 16*c0)
        from the packed encoder and the full-res stage (upsample, concat,
        inner3, residual, out3) runs entirely in that layout — the only
        full-resolution tensor materialized is the final out3 feature map."""
        c0, c1, c2, c3 = self.feat_chs
        dt = self.dtype

        def up2(t, ref_hw):
            # f32 bilinear x2 upsample (ref casts to float32, `FPN.py:59`)
            return interpolate(
                t.astype(jnp.float32), ref_hw, "bilinear", False
            ).astype(dt)

        intra = conv31
        out0 = ConvBNAct(c3, 1, act="swish", dtype=dt, conv_bias=True, name="out0")(intra, train)

        cat = jnp.concatenate([up2(intra, conv21.shape[1:3]), conv21], axis=-1)
        intra = conv21 + ConvBNAct(c2, 3, act="swish", dtype=dt, conv_bias=True, name="inner1")(cat, train)
        out1 = ConvBNAct(c2, 1, act="swish", dtype=dt, conv_bias=True, name="out1")(intra, train)

        cat = jnp.concatenate([up2(intra, conv11.shape[1:3]), conv11], axis=-1)
        intra = conv11 + ConvBNAct(c1, 3, act="swish", dtype=dt, conv_bias=True, name="inner2")(cat, train)
        out2 = ConvBNAct(c1, 1, act="swish", dtype=dt, conv_bias=True, name="out2")(intra, train)

        if s2d:
            h4, w4 = conv01.shape[1:3]
            up_p = interpolate_s2d(
                intra.astype(jnp.float32), (4 * h4, 4 * w4), p=4
            ).astype(dt)  # phase-major (.., 16*c1)
            parts = []
            for ph in range(16):  # per-phase [up(c1), conv01(c0)] interleave
                parts += [
                    up_p[..., ph * c1:(ph + 1) * c1],
                    conv01[..., ph * c0:(ph + 1) * c0],
                ]
            cat = jnp.concatenate(parts, axis=-1)
            intra = conv01 + ConvBNAct(
                c0, 3, act="swish", dtype=dt, conv_bias=True, name="inner3"
            )(cat, train, s2d=(4, 4))
            out3 = ConvBNAct(
                c0, 1, act="swish", dtype=dt, conv_bias=True, name="out3"
            )(intra, train, s2d=(4, 4))
            out3 = depth_to_space_n(out3, 4)
        else:
            cat = jnp.concatenate([up2(intra, conv01.shape[1:3]), conv01], axis=-1)
            intra = conv01 + ConvBNAct(c0, 3, act="swish", dtype=dt, conv_bias=True, name="inner3")(cat, train)
            out3 = ConvBNAct(c0, 1, act="swish", dtype=dt, conv_bias=True, name="out3")(intra, train)

        return [out0, out1, out2, out3]
