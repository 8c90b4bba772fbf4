"""InceptionDWConv2d — Inception-style depthwise mixer (NHWC).

Re-designs `cvit_GGCA_ADD_DConv.py:157-177`: channels split into identity /
3×3 depthwise / 1×11 band / 11×1 band branches (branch width = ⅛ of input).
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn


class InceptionDWConv2d(nn.Module):
    channels: int
    square_kernel: int = 3
    band_kernel: int = 11
    branch_ratio: float = 0.125
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        gc = int(self.channels * self.branch_ratio)
        cid = self.channels - 3 * gc
        x_id = x[..., :cid]
        x_hw = x[..., cid:cid + gc]
        x_w = x[..., cid + gc:cid + 2 * gc]
        x_h = x[..., cid + 2 * gc:]

        sp = self.square_kernel // 2
        bp = self.band_kernel // 2
        y_hw = nn.Conv(gc, (self.square_kernel,) * 2, padding=((sp, sp),) * 2,
                       feature_group_count=gc, dtype=self.dtype,
                       name="dwconv_hw")(x_hw)
        y_w = nn.Conv(gc, (1, self.band_kernel), padding=((0, 0), (bp, bp)),
                      feature_group_count=gc, dtype=self.dtype,
                      name="dwconv_w")(x_w)
        y_h = nn.Conv(gc, (self.band_kernel, 1), padding=((bp, bp), (0, 0)),
                      feature_group_count=gc, dtype=self.dtype,
                      name="dwconv_h")(x_h)
        return jnp.concatenate([x_id, y_hw, y_w, y_h], axis=-1)
