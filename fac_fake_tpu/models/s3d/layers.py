"""S3D building blocks (Flax, NDHWC layout: batch, time, H, W, channels).

Re-designs the reference's 3D conv primitives:
  * `BasicConv3d` / `SepConv3d` — `S3D/model.py:50-82` (ReLU) and
    `S3D/new_model/Conv3d.py` (ReLU6 / V2-no-spatial-BN / depthwise);
  * `HPF` / `HPF3` frozen SRM filter banks — `S3D/SRM/HPF.py:11-65`; the
    30 (or 3) published steganalysis kernels ship as .npy assets
    (`assets/srm_30.npy`, `assets/srm_msca3.npy`) and are applied as a
    constant 2D conv vmapped over time (kernel_size=(1,5,5)).

Separable = spatial (1,k,k) then temporal (k,1,1) factored convs — these map
directly to XLA `conv_general_dilated` with NDHWC/DHWIO dimension numbers,
which the TPU compiler tiles onto the MXU.

torch BN hyperparams here: eps=1e-3, momentum=0.001 → flax decay 0.999.
"""
from __future__ import annotations

import functools
import os
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from fac_fake_tpu.models.layers import Bf16FastBatchNorm

_ASSETS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "assets")

BN3D_EPS = 1e-3
BN3D_MOMENTUM = 0.999


class BN3D(Bf16FastBatchNorm):
    """torch S3D BN hyperparams + the shared bf16 fast path (NDHWC reduces
    over all-but-last, so the 2D implementation carries over unchanged)."""
    use_running_average: Optional[bool] = None
    momentum: float = BN3D_MOMENTUM
    epsilon: float = BN3D_EPS


def _act(name: str):
    if name == "relu":
        return nn.relu
    if name == "relu6":
        return lambda x: jnp.clip(x, 0.0, 6.0)
    raise KeyError(name)


def conv3d_mod(features, kernel, strides=(1, 1, 1), padding=(0, 0, 0),
               groups=1, use_bias=False, dtype=jnp.float32, name=None) -> nn.Conv:
    pad = tuple((p, p) for p in padding)
    return nn.Conv(features, kernel, strides=strides, padding=pad,
                   feature_group_count=groups, use_bias=use_bias,
                   dtype=dtype, name=name)


class BasicConv3d(nn.Module):
    """conv → BN → act (`S3D/model.py:50-61`; ReLU6 in the msca family)."""
    features: int
    kernel: Tuple[int, int, int] = (1, 1, 1)
    strides: Tuple[int, int, int] = (1, 1, 1)
    padding: Tuple[int, int, int] = (0, 0, 0)
    act: str = "relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv3d_mod(self.features, self.kernel, self.strides, self.padding,
                       dtype=self.dtype, name="conv")(x)
        x = BN3D(use_running_average=not train, dtype=self.dtype, name="bn")(x)
        return _act(self.act)(x)


class SepConv3d(nn.Module):
    """spatial (1,k,k) conv-BN-act, then temporal (k,1,1) conv-BN-act
    (`S3D/model.py:63-82`). `spatial_bn=False` gives the msca `SepConv3dV2`
    (`new_model/Conv3d.py:24-43`); `depthwise=True` the `DWSepConv3d`
    (`:45-64`, grouped convs, no spatial BN/act), with per-axis kernel
    (kt, kh, kw)."""
    features: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    strides: int = 1
    padding: Tuple[int, int, int] = (1, 1, 1)
    act: str = "relu"
    spatial_bn: bool = True
    spatial_act: bool = True
    depthwise: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kt, kh, kw = self.kernel
        pt, ph, pw = self.padding
        s = self.strides
        groups = x.shape[-1] if self.depthwise else 1
        feats = x.shape[-1] if self.depthwise else self.features
        x = conv3d_mod(feats, (1, kh, kw), (1, s, s), (0, ph, pw),
                       groups=groups, dtype=self.dtype, name="conv_s")(x)
        if self.spatial_bn:
            x = BN3D(use_running_average=not train, dtype=self.dtype, name="bn_s")(x)
        if self.spatial_act:
            x = _act(self.act)(x)
        groups_t = feats if self.depthwise else 1
        x = conv3d_mod(feats, (kt, 1, 1), (s, 1, 1), (pt, 0, 0),
                       groups=groups_t, dtype=self.dtype, name="conv_t")(x)
        x = BN3D(use_running_average=not train, dtype=self.dtype, name="bn_t")(x)
        return _act(self.act)(x)


class DWSepConv3d(nn.Module):
    """Depthwise separable 3D conv (`new_model/Conv3d.py:45-64`): grouped
    spatial + grouped temporal, BN+ReLU6 after the temporal conv only."""
    kernel: Tuple[int, int, int]
    strides: int = 1
    padding: Tuple[int, int, int] = (0, 0, 0)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return SepConv3d(x.shape[-1], self.kernel, self.strides, self.padding,
                         act="relu6", spatial_bn=False, spatial_act=False,
                         depthwise=True, dtype=self.dtype, name="sep")(x, train)


def max_pool3d(x, kernel: Tuple[int, int, int], strides: Tuple[int, int, int],
               padding: Tuple[int, int, int] = (0, 0, 0)):
    pad = ((0, 0),) + tuple((p, p) for p in padding) + ((0, 0),)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        (1,) + kernel + (1,), (1,) + strides + (1,), pad)


def avg_pool3d(x, kernel: Tuple[int, int, int]):
    win = (1,) + kernel + (1,)
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, win, (1,) * 5,
                                   ((0, 0),) * 5)
    return summed / float(np.prod(kernel))


@functools.lru_cache(maxsize=2)
def _srm_kernel(name: str, rescale: float) -> np.ndarray:
    """(5,5,1?,3,K) DHWIO kernel from the asset bank: filter k applied to the
    mean-ish of RGB — reference stacks the same 5×5 across the 3 input
    channels (÷3 for the 30-bank, ×1 for the msca 3-bank; `HPF.py:24-27,52-55`)."""
    bank = np.load(os.path.join(_ASSETS, name))  # (K, 5, 5)
    k = bank.shape[0]
    w = np.zeros((1, 5, 5, 3, k), np.float32)
    for i in range(k):
        for c in range(3):
            w[0, :, :, c, i] = bank[i] * rescale
    return w


def srm_filter(x: jnp.ndarray, full: bool = True) -> jnp.ndarray:
    """Frozen SRM high-pass bank as a constant conv: (B,T,H,W,3) →
    (B,T,H,W,30) [full] or (...,3) [msca subset]."""
    w = _srm_kernel("srm_30.npy", 1.0 / 3.0) if full \
        else _srm_kernel("srm_msca3.npy", 1.0)
    return jax.lax.conv_general_dilated(
        x, jnp.asarray(w), (1, 1, 1),
        ((0, 0), (2, 2), (2, 2)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
