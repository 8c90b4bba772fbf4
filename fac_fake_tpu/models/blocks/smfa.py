"""SMFA — self-modulated feature aggregation (NHWC).

Re-designs `other/cvit_GGCA_SMFA.py:160-207`: the input splits into a
non-local branch (variance + downsampled depthwise statistics gate a nearest
upsampled modulation) and a local DMlp branch; outputs sum through a 1×1.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn


def adaptive_max_pool(x, out_h, out_w):
    """torch adaptive_max_pool2d for divisible sizes (h % out_h == 0)."""
    b, h, w, c = x.shape
    return jnp.max(x.reshape(b, out_h, h // out_h, out_w, w // out_w, c),
                   axis=(2, 4))


class DMlp(nn.Module):
    dim: int
    growth: float = 2.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = int(self.dim * self.growth)
        # grouped 3×3 (groups=dim) expanding to hidden, then 1×1
        x = nn.Conv(hidden, (3, 3), padding=((1, 1), (1, 1)),
                    feature_group_count=self.dim, dtype=self.dtype,
                    name="conv0a")(x)
        x = nn.Conv(hidden, (1, 1), dtype=self.dtype, name="conv0b")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="conv1")(x)


class SMFA(nn.Module):
    dim: int
    down_scale: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        yx = nn.Conv(self.dim * 2, (1, 1), dtype=self.dtype, name="linear_0")(x)
        y, xs = yx[..., : self.dim], yx[..., self.dim:]

        pooled = adaptive_max_pool(xs, h // self.down_scale, w // self.down_scale)
        x_s = nn.Conv(self.dim, (3, 3), padding=((1, 1), (1, 1)),
                      feature_group_count=self.dim, dtype=self.dtype,
                      name="dw_conv")(pooled)
        x_v = jnp.var(xs, axis=(1, 2), keepdims=True)
        alpha = self.param("alpha", nn.initializers.ones, (self.dim,))
        belt = self.param("belt", nn.initializers.zeros, (self.dim,))
        gate = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="linear_1")(
            x_s * alpha + x_v * belt)
        gate = nn.gelu(gate, approximate=False)
        # torch F.interpolate(..., mode='nearest'): idx_i = floor(i·oh/h)
        oh, ow = gate.shape[1], gate.shape[2]
        rows = jnp.arange(h) * oh // h
        cols = jnp.arange(w) * ow // w
        gate = gate[:, rows][:, :, cols]
        x_l = xs * gate
        y_d = DMlp(self.dim, dtype=self.dtype, name="lde")(y)
        return nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="linear_2")(
            x_l + y_d)
