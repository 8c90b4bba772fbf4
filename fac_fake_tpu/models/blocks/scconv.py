"""ScConv — spatial (SRU) + channel (CRU) reconstruction units (NHWC).

Re-designs `other/cvit_GGCA_ADD_ScConv.py:159-357`: SRU gates features with
GroupNorm-weight-normalized sigmoid reweights, splits into above/below
threshold halves and cross-reconstructs; CRU squeezes the channel halves,
runs grouped+pointwise convs, and softmax-pools the fused result.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


class SRU(nn.Module):
    channels: int
    group_num: int = 4
    gate_threshold: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # manual GroupNorm: the affine scale doubles as the reweight gamma
        scale = self.param("gn_scale", nn.initializers.ones, (self.channels,))
        bias = self.param("gn_bias", nn.initializers.zeros, (self.channels,))
        b, h, wdt, c = x.shape
        g = self.group_num
        xg = x.reshape(b, h, wdt, g, c // g)
        mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
        var = jnp.var(xg, axis=(1, 2, 4), keepdims=True)
        xn = ((xg - mean) / jnp.sqrt(var + 1e-5)).reshape(b, h, wdt, c)
        gn_x = xn * scale + bias
        w = scale / jnp.sum(scale)
        rew = nn.sigmoid(gn_x * w.reshape(1, 1, 1, -1))
        w1 = jnp.where(rew > self.gate_threshold, 1.0, rew)
        w2 = jnp.where(rew > self.gate_threshold, 0.0, rew)
        x1, x2 = w1 * x, w2 * x
        c = self.channels // 2
        return jnp.concatenate([x1[..., :c] + x2[..., c:],
                                x1[..., c:] + x2[..., :c]], axis=-1)


class CRU(nn.Module):
    channels: int
    alpha: float = 0.5
    squeeze_radio: int = 2
    group_size: int = 2
    group_kernel_size: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        up_c = int(self.alpha * self.channels)
        low_c = self.channels - up_c
        up, low = x[..., :up_c], x[..., up_c:]
        up = nn.Conv(up_c // self.squeeze_radio, (1, 1), use_bias=False,
                     dtype=self.dtype, name="squeeze1")(up)
        low = nn.Conv(low_c // self.squeeze_radio, (1, 1), use_bias=False,
                      dtype=self.dtype, name="squeeze2")(low)
        gk = self.group_kernel_size
        y1 = nn.Conv(self.channels, (gk, gk), padding=((gk // 2,) * 2,) * 2,
                     feature_group_count=self.group_size, dtype=self.dtype,
                     name="gwc")(up) + \
            nn.Conv(self.channels, (1, 1), use_bias=False, dtype=self.dtype,
                    name="pwc1")(up)
        y2 = jnp.concatenate(
            [nn.Conv(self.channels - low_c // self.squeeze_radio, (1, 1),
                     use_bias=False, dtype=self.dtype, name="pwc2")(low), low],
            axis=-1)
        out = jnp.concatenate([y1, y2], axis=-1)
        gate = jax.nn.softmax(jnp.mean(out, axis=(1, 2), keepdims=True), axis=-1)
        out = gate * out
        half = out.shape[-1] // 2
        return out[..., :half] + out[..., half:]


class ScConv(nn.Module):
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = SRU(self.channels, dtype=self.dtype, name="sru")(x)
        return CRU(self.channels, dtype=self.dtype, name="cru")(x)
