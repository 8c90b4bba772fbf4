"""MDFA + BFM attention blocks (NHWC).

Re-designs `other/cvit_BFM_GGCA_MDFA.py:153-379`:
  * MDFA — multi-scale dilated fusion: 1×1 + three dilated 3×3 branches
    (rates 6/12/18) + global branch, concat → channel/spatial excitation
    (`tongdao`/`kongjian`/`hebing`, elementwise max) → 1×1 reduce;
  * BFM — bi-feature fusion: shared multi-scale extractor (3/5/7 kernels)
    on both inputs, then TFAM (ECA-style 1-D channel conv + 7×7 spatial conv
    attention, softmax over the two streams, +1 bias) weighted sum.
"""
from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from fac_fake_tpu.models.layers import TorchBatchNorm


class ChannelExcite(nn.Module):  # `tongdao`
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = jnp.mean(x, axis=(1, 2), keepdims=True)
        y = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype, name="fc")(y)
        y = nn.relu(y)
        return x * y  # nearest-interpolated 1×1 broadcast == broadcast


class SpatialExcite(nn.Module):  # `kongjian`
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype, name="conv")(x)
        return x * nn.sigmoid(y)


class ExciteMax(nn.Module):  # `hebing`
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        a = ChannelExcite(dtype=self.dtype, name="tongdao")(x)
        b = SpatialExcite(dtype=self.dtype, name="kongjian")(x)
        return jnp.maximum(a, b)


class MDFA(nn.Module):
    dim_out: int
    rate: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda n: TorchBatchNorm(use_running_average=not train,
                                      dtype=self.dtype, name=n)

        def branch(k, dil, name):
            pad = ((dil * (k // 2), dil * (k // 2)),) * 2 if k > 1 else ((0, 0), (0, 0))
            y = nn.Conv(self.dim_out, (k, k), padding=pad,
                        kernel_dilation=(dil, dil), dtype=self.dtype,
                        name=f"{name}_conv")(x)
            return nn.relu(bn(f"{name}_bn")(y))

        b1 = branch(1, self.rate, "b1")
        b2 = branch(3, 6 * self.rate, "b2")
        b3 = branch(3, 12 * self.rate, "b3")
        b4 = branch(3, 18 * self.rate, "b4")
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = nn.Conv(self.dim_out, (1, 1), dtype=self.dtype, name="b5_conv")(g)
        g = nn.relu(bn("b5_bn")(g))
        g = jnp.broadcast_to(g, b1.shape)  # bilinear upsample of 1×1 == broadcast

        cat = jnp.concatenate([b1, b2, b3, b4, g], axis=-1)
        gated = ExciteMax(dtype=self.dtype, name="hebing")(cat) * cat
        out = nn.Conv(self.dim_out, (1, 1), dtype=self.dtype, name="cat_conv")(gated)
        return nn.relu(bn("cat_bn")(out))


def eca_kernel_size(c: int) -> int:
    k = int((math.log2(c) + 1) // 2)
    return k + 1 if k % 2 == 0 else k


class TFAM(nn.Module):
    """Temporal fusion attention over two feature streams."""
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, t1, t2):
        k = eca_kernel_size(self.channels)
        # --- channel attention: pools (B,C) stacked as 4 "channels" of a 1-D conv
        pools = jnp.stack([
            jnp.mean(t1, axis=(1, 2)), jnp.max(t1, axis=(1, 2)),
            jnp.mean(t2, axis=(1, 2)), jnp.max(t2, axis=(1, 2)),
        ], axis=-1)  # (B, C, 4) — torch layout (B, 4, C) convolved over C
        ca1 = nn.Conv(1, (k,), padding=k // 2, dtype=self.dtype,
                      name="channel_conv1")(pools)  # (B, C, 1)
        ca2 = nn.Conv(1, (k,), padding=k // 2, dtype=self.dtype,
                      name="channel_conv2")(pools)
        ch = jax.nn.softmax(jnp.stack([ca1, ca2], axis=0), axis=0)
        ch = ch[..., 0][:, :, None, None, :]  # (2, B, 1, 1, C)

        # --- spatial attention
        spool = jnp.concatenate([
            jnp.mean(t1, axis=-1, keepdims=True), jnp.max(t1, axis=-1, keepdims=True),
            jnp.mean(t2, axis=-1, keepdims=True), jnp.max(t2, axis=-1, keepdims=True),
        ], axis=-1)  # (B, H, W, 4)
        sa1 = nn.Conv(1, (7, 7), padding=((3, 3), (3, 3)), dtype=self.dtype,
                      name="spatial_conv1")(spool)
        sa2 = nn.Conv(1, (7, 7), padding=((3, 3), (3, 3)), dtype=self.dtype,
                      name="spatial_conv2")(spool)
        sp = jax.nn.softmax(jnp.stack([sa1, sa2], axis=0), axis=0)  # (2,B,H,W,1)

        att = ch + sp + 1.0
        return att[0] * t1 + att[1] * t2


class BFM(nn.Module):
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, t1, t2, train: bool = False):
        # the multi-scale extractor is SHARED between both streams
        convs = [nn.Conv(self.channels, (k, k), padding=((k // 2,) * 2,) * 2,
                         dtype=self.dtype, name=f"ms_conv{k}")
                 for k in (3, 5, 7)]

        def extract(t):
            return sum(nn.relu(c(t)) for c in convs)

        return TFAM(self.channels, dtype=self.dtype, name="tfam")(
            extract(t1), extract(t2))
