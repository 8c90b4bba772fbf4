"""S3D composite blocks: Inception mixes, GCNet context, MSCAN, iFormer.

Sources re-designed (layouts NDHWC, cited for parity checking):
  * Mixed_3b..5c Inception blocks — `S3D/model.py:84-342` (one parameterized
    module instead of eight copy-pasted classes); msca Mixed_5b/5c variants
    with ReLU6 + SepConv3dV2 — `S3D/msca_S3Dv1.py:130-184`;
  * ContextBlock3d (GCNet) — `S3D/new_model/context_block_3d.py:5-88`;
  * DWConv/Mlp/AttentionModule/SpatialAttention/MSCAN — `new_model/msca_3d.py`;
  * make_divisible/InceptionMixer/iFormerBlock(_light) — `new_model/iformer_3d.py`.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from fac_fake_tpu.models.s3d.layers import (BN3D, BasicConv3d, DWSepConv3d,
                                            SepConv3d, max_pool3d)

# (b0, b1_reduce, b1_out, b2_reduce, b2_out, b3) channel plans, keyed by the
# reference class names (`S3D/model.py:84-342`).
INCEPTION_PLANS = {
    "3b": (64, 96, 128, 16, 32, 32),
    "3c": (128, 128, 192, 32, 96, 64),
    "4b": (192, 96, 208, 16, 48, 64),
    "4c": (160, 112, 224, 24, 64, 64),
    "4d": (128, 128, 256, 24, 64, 64),
    "4e": (112, 144, 288, 32, 64, 64),
    "4f": (256, 160, 320, 32, 128, 128),
    "5b": (256, 160, 320, 32, 128, 128),
    "5c": (384, 192, 384, 48, 128, 128),
    # msca reduced tails (`msca_S3Dv1.py:130-184`)
    "m5b": (192, 96, 208, 16, 48, 64),
    "m5c": (384, 192, 384, 48, 128, 128),
}


class InceptionMix(nn.Module):
    """4-branch Inception: 1×1 | 1×1→sep3 | 1×1→sep3 | maxpool3→1×1."""
    plan: Tuple[int, int, int, int, int, int]
    act: str = "relu"
    sep_spatial_bn: bool = True  # False = msca SepConv3dV2 in branches 1/2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b0, r1, o1, r2, o2, b3 = self.plan
        k = dict(act=self.act, dtype=self.dtype)
        y0 = BasicConv3d(b0, name="b0", **k)(x, train)
        y1 = BasicConv3d(r1, name="b1a", **k)(x, train)
        y1 = SepConv3d(o1, (3, 3, 3), 1, (1, 1, 1), name="b1b",
                       spatial_bn=self.sep_spatial_bn,
                       spatial_act=self.sep_spatial_bn, **k)(y1, train)
        y2 = BasicConv3d(r2, name="b2a", **k)(x, train)
        y2 = SepConv3d(o2, (3, 3, 3), 1, (1, 1, 1), name="b2b",
                       spatial_bn=self.sep_spatial_bn,
                       spatial_act=self.sep_spatial_bn, **k)(y2, train)
        y3 = max_pool3d(x, (3, 3, 3), (1, 1, 1), (1, 1, 1))
        y3 = BasicConv3d(b3, name="b3", **k)(y3, train)
        return jnp.concatenate([y0, y1, y2, y3], axis=-1)


class ContextBlock3d(nn.Module):
    """GCNet global-context attention (`context_block_3d.py:5-88`),
    channel_add fusion with avg or att pooling."""
    ratio: float = 1.0 / 16.0
    pooling: str = "avg"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, t, h, w, c = x.shape
        planes = int(c * self.ratio)
        if self.pooling == "att":
            mask = nn.Conv(1, (1, 1, 1), dtype=self.dtype, name="conv_mask")(x)
            mask = jax.nn.softmax(mask.reshape(b, -1, 1), axis=1)
            ctx = jnp.einsum("bnc,bno->boc", x.reshape(b, -1, c), mask)
            ctx = ctx.reshape(b, 1, 1, 1, c)
        else:
            ctx = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
        y = nn.Conv(planes, (1, 1, 1), dtype=self.dtype, name="ca1")(ctx)
        # reference LayerNorm([planes,1,1,1]) normalizes over the channel dim
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln")(y)
        y = jnp.clip(y, 0.0, 6.0)  # ReLU6
        y = nn.Conv(c, (1, 1, 1), dtype=self.dtype, name="ca2")(y)
        return x + y


class Mlp3d(nn.Module):
    """SegNeXt conv-FFN: 1×1 → DW sep 3³ → GELU → 1×1 (`msca_3d.py:14-34`)."""
    hidden: int
    out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.hidden, (1, 1, 1), use_bias=True, dtype=self.dtype,
                    name="fc1")(x)
        x = DWSepConv3d((3, 3, 3), 1, (1, 1, 1), dtype=self.dtype,
                        name="dw")(x, train)
        x = nn.gelu(x, approximate=False)
        return nn.Conv(self.out, (1, 1, 1), use_bias=True, dtype=self.dtype,
                       name="fc2")(x)


class AttentionModule3d(nn.Module):
    """Multi-kernel (3/5/7) depthwise gating (`msca_3d.py:36-67`)."""
    time_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        tp = self.time_size // 2
        u = x
        a = DWSepConv3d((self.time_size, 3, 3), 1, (tp, 1, 1), dtype=self.dtype,
                        name="conv0")(x, train)
        a0 = DWSepConv3d((self.time_size, 5, 5), 1, (tp, 2, 2), dtype=self.dtype,
                         name="conv0_1")(a, train)
        a1 = DWSepConv3d((self.time_size, 7, 7), 1, (tp, 3, 3), dtype=self.dtype,
                         name="conv1_1")(a, train)
        a = a + a0 + a1
        a = nn.Conv(x.shape[-1], (1, 1, 1), use_bias=True, dtype=self.dtype,
                    name="conv3")(a)
        return a * u


class SpatialAttention3d(nn.Module):
    """proj → GELU → AttentionModule → proj (`msca_3d.py:70-86`)."""
    time_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = x.shape[-1]
        x = nn.Conv(d, (1, 1, 1), use_bias=True, dtype=self.dtype, name="proj1")(x)
        x = nn.gelu(x, approximate=False)
        x = AttentionModule3d(self.time_size, dtype=self.dtype, name="gate")(x, train)
        return nn.Conv(d, (1, 1, 1), use_bias=True, dtype=self.dtype,
                       name="proj2")(x)


class MSCANHalf(nn.Module):
    """x + attn(BN(x)) (`msca_3d.py:88-100`)."""
    time_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = BN3D(use_running_average=not train, dtype=self.dtype, name="norm1")(x)
        return x + SpatialAttention3d(self.time_size, dtype=self.dtype,
                                      name="attn")(h, train)


class MSCAN(nn.Module):
    """MSCANHalf then (quirk: NON-residual) conv-FFN (`msca_3d.py:102-122` —
    the mlp output replaces x instead of adding)."""
    time_size: int
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = BN3D(use_running_average=not train, dtype=self.dtype, name="norm1")(x)
        x = x + SpatialAttention3d(self.time_size, dtype=self.dtype,
                                   name="attn")(h, train)
        h = BN3D(use_running_average=not train, dtype=self.dtype, name="norm2")(x)
        return Mlp3d(int(x.shape[-1] * self.mlp_ratio), x.shape[-1],
                     dtype=self.dtype, name="mlp")(h, train)


def make_divisible(v, divisor=8, min_value=None, round_limit=0.9):
    min_value = min_value or divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < round_limit * v:
        new_v += divisor
    return new_v


class InceptionMixer(nn.Module):
    """Channel-split mixer (`iformer_3d.py:18-54`): high-frequency halves go
    through maxpool→1×1 and 1×1→DW-sep paths; the low-frequency tail through
    spatial attention; concat order is [attn, pool, dw]."""
    tran_ratio: float
    time_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        low = make_divisible(c * self.tran_ratio, 32)
        high = c - low
        tp = self.time_size // 2
        xh1 = x[..., : high // 2]
        xh2 = x[..., high // 2: high]
        xl = x[..., c - low:]

        y1 = max_pool3d(xh1, (self.time_size, 3, 3), (1, 1, 1), (tp, 1, 1))
        y1 = BasicConv3d(high // 2, act="relu6", dtype=self.dtype,
                         name="pool_fc")(y1, train)
        y2 = BasicConv3d(high // 2, act="relu6", dtype=self.dtype,
                         name="fc")(xh2, train)
        y2 = DWSepConv3d((self.time_size, 3, 3), 1, (tp, 1, 1),
                         dtype=self.dtype, name="dw")(y2, train)
        y2 = BN3D(use_running_average=not train, dtype=self.dtype, name="bn")(y2)
        yl = SpatialAttention3d(self.time_size, dtype=self.dtype,
                                name="attn")(xl, train)
        return jnp.concatenate([yl, y1, y2], axis=-1)


class IFormerBlock(nn.Module):
    """x + mixer(BN(x)); full version adds x + mlp(BN(x)), light applies GELU
    (`iformer_3d.py:56-98`)."""
    tran_ratio: float
    time_size: int
    light: bool = False
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = BN3D(use_running_average=not train, dtype=self.dtype, name="norm1")(x)
        x = x + InceptionMixer(self.tran_ratio, self.time_size,
                               dtype=self.dtype, name="mixer")(h, train)
        if self.light:
            return nn.gelu(x, approximate=False)
        h = BN3D(use_running_average=not train, dtype=self.dtype, name="norm2")(x)
        return x + Mlp3d(int(x.shape[-1] * self.mlp_ratio), x.shape[-1],
                         dtype=self.dtype, name="mlp")(h, train)
