"""Shared model building blocks: torch-parity initializers and norms.

The reference relies on torch's default `kaiming_uniform_(a=sqrt(5))`
conv/linear init (plus uniform bias by fan-in); training-dynamics parity
(SURVEY.md §7 hard part #7) wants the same variance here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jax.Array


def torch_uniform_init(scale_from_fan_in: bool = True):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — torch's default for Conv/Linear weights."""

    def init(key, shape, dtype=jnp.float32):
        # flax conv kernels: (kh, kw, in_ch/groups, out_ch); dense: (in, out)
        if len(shape) == 2:
            fan_in = shape[0]
        else:
            fan_in = int(np.prod(shape[:-1]))
        bound = 1.0 / np.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_bias_init(fan_in: int):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / np.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class LayerScale(nn.Module):
    """Per-channel learned residual scaling (ref `layers/layer_scale.py:16-28`)."""

    dim: int
    init_values: float = 1.0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        gamma = self.param(
            "gamma", lambda k, s: jnp.full(s, self.init_values, jnp.float32), (self.dim,)
        )
        return x * gamma.astype(x.dtype)


def swish(x: Array) -> Array:
    """x * sigmoid(x) (ref `model/FPN.py:88-93`)."""
    return x * jax.nn.sigmoid(x)
