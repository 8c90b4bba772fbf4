"""MOGA — multi-order gated aggregation (NHWC).

Re-designs `other/cvit_GGCA_ADD_MOGA.py:158-383`: feature decomposition
(x + σ·(x − GAP(x))), SiLU gate × multi-order dilated depthwise value
(5×5 d1 / 5×5 d2 on middle split / 7×7 d3 on top split + pointwise), with
residual. Includes the ChannelAggregationFFN companion block for completeness
(defined in the reference, unused by the shipped variant forward).
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class ElementScale(nn.Module):
    dim: int
    init_value: float = 0.0

    @nn.compact
    def __call__(self, x):
        s = self.param("scale",
                       lambda k, sh: jnp.full(sh, self.init_value, jnp.float32),
                       (self.dim,))
        return x * s


class MultiOrderDWConv(nn.Module):
    dim: int
    dilations: Tuple[int, int, int] = (1, 2, 3)
    channel_split: Tuple[int, int, int] = (1, 3, 4)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        total = sum(self.channel_split)
        d1 = int(self.channel_split[1] / total * self.dim)
        d2 = int(self.channel_split[2] / total * self.dim)
        d0 = self.dim - d1 - d2

        def dw(t, ch, k, dil, name):
            p = (1 + (k - 1) * dil) // 2
            return nn.Conv(ch, (k, k), padding=((p, p), (p, p)),
                           kernel_dilation=(dil, dil), feature_group_count=ch,
                           use_bias=True, dtype=self.dtype, name=name)(t)

        x0 = dw(x, self.dim, 5, self.dilations[0], "dw0")
        x1 = dw(x0[..., d0:d0 + d1], d1, 5, self.dilations[1], "dw1")
        x2 = dw(x0[..., self.dim - d2:], d2, 7, self.dilations[2], "dw2")
        x = jnp.concatenate([x0[..., :d0], x1, x2], axis=-1)
        return nn.Conv(self.dim, (1, 1), use_bias=True, dtype=self.dtype,
                       name="pw")(x)


class MultiOrderGatedAggregation(nn.Module):
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        shortcut = x
        x = nn.Conv(self.dim, (1, 1), use_bias=True, dtype=self.dtype,
                    name="proj_1")(x)
        x_d = jnp.mean(x, axis=(1, 2), keepdims=True)
        x = x + ElementScale(self.dim, 1e-5, name="sigma")(x - x_d)
        x = jax.nn.silu(x)
        g = nn.Conv(self.dim, (1, 1), use_bias=True, dtype=self.dtype,
                    name="gate")(x)
        v = MultiOrderDWConv(self.dim, dtype=self.dtype, name="value")(x)
        y = nn.Conv(self.dim, (1, 1), use_bias=True, dtype=self.dtype,
                    name="proj_2")(jax.nn.silu(g) * jax.nn.silu(v))
        return y + shortcut


class ChannelAggregationFFN(nn.Module):
    """Conv-FFN with learned channel aggregation (`:172-240` in the reference
    family; companion block, not wired into the shipped variant)."""
    dim: int
    ffn_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = int(self.dim * self.ffn_ratio)
        h = nn.Conv(hidden, (1, 1), dtype=self.dtype, name="fc1")(x)
        h = nn.Conv(hidden, (3, 3), padding=((1, 1), (1, 1)),
                    feature_group_count=hidden, dtype=self.dtype, name="dw")(h)
        h = nn.gelu(h, approximate=False)
        agg = nn.Conv(1, (1, 1), dtype=self.dtype, name="decompose")(h)
        h = h + ElementScale(hidden, 1e-5, name="sigma")(h - nn.gelu(agg))
        return nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="fc2")(h)
