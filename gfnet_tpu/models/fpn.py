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
from gfnet_tpu.ops.resize import interpolate

Array = jax.Array


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
    def __call__(self, x: Array, train: bool = False) -> Array:
        p = self.kernel // 2
        use_bias = (not self.use_bn) if self.conv_bias is None else self.conv_bias
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(p, p), (p, p)],
            use_bias=use_bias,
            kernel_init=torch_uniform_init(),
            dtype=self.dtype,
            name="conv",
        )(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=self.bn_momentum,
                epsilon=1e-5,
                dtype=jnp.float32,
                name="bn",
            )(x).astype(self.dtype)
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
    def __call__(self, x: Array, train: bool = False) -> list[Array]:
        c0, c1, c2, c3 = self.feat_chs
        dt = self.dtype
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
        self, conv01: Array, conv11: Array, conv21: Array, conv31: Array, train: bool = False
    ) -> list[Array]:
        c0, c1, c2, c3 = self.feat_chs
        dt = self.dtype

        def up2(t, ref):
            # f32 bilinear x2 upsample (ref casts to float32, `FPN.py:59`)
            return interpolate(
                t.astype(jnp.float32), (ref.shape[1], ref.shape[2]), "bilinear", False
            ).astype(dt)

        intra = conv31
        out0 = ConvBNAct(c3, 1, act="swish", dtype=dt, conv_bias=True, name="out0")(intra, train)

        cat = jnp.concatenate([up2(intra, conv21), conv21], axis=-1)
        intra = conv21 + ConvBNAct(c2, 3, act="swish", dtype=dt, conv_bias=True, name="inner1")(cat, train)
        out1 = ConvBNAct(c2, 1, act="swish", dtype=dt, conv_bias=True, name="out1")(intra, train)

        cat = jnp.concatenate([up2(intra, conv11), conv11], axis=-1)
        intra = conv11 + ConvBNAct(c1, 3, act="swish", dtype=dt, conv_bias=True, name="inner2")(cat, train)
        out2 = ConvBNAct(c1, 1, act="swish", dtype=dt, conv_bias=True, name="out2")(intra, train)

        cat = jnp.concatenate([up2(intra, conv01), conv01], axis=-1)
        intra = conv01 + ConvBNAct(c0, 3, act="swish", dtype=dt, conv_bias=True, name="inner3")(cat, train)
        out3 = ConvBNAct(c0, 1, act="swish", dtype=dt, conv_bias=True, name="out3")(intra, train)

        return [out0, out1, out2, out3]
