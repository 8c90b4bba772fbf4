"""ODConv2d — omni-dimensional dynamic convolution (NHWC).

Re-designs `other/cvit_GGCA_ADD_ODConv.py:158-293`: a squeeze-excite style
attention head produces channel / filter / spatial / kernel attentions; the
K candidate kernels are blended per-sample and applied. The reference folds
the batch into conv groups; here the per-sample convolution is a `vmap` over
the batch — XLA batches it into one large contraction.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from fac_fake_tpu.models.layers import TorchBatchNorm


class ODConv2d(nn.Module):
    in_planes: int
    out_planes: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    reduction: float = 0.0625
    kernel_num: int = 4
    temperature: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        k, kn = self.kernel_size, self.kernel_num
        att_ch = max(int(self.in_planes * self.reduction), 16)

        # attention trunk: GAP → 1×1 → BN → ReLU (`Attention1.forward`)
        a = jnp.mean(x, axis=(1, 2), keepdims=True)
        a = nn.Conv(att_ch, (1, 1), use_bias=False, dtype=self.dtype, name="fc")(a)
        a = TorchBatchNorm(use_running_average=not train, dtype=self.dtype,
                           name="bn")(a)
        a = nn.relu(a)

        t = self.temperature
        ch_att = nn.sigmoid(nn.Conv(self.in_planes, (1, 1), dtype=self.dtype,
                                    name="channel_fc")(a) / t)       # (b,1,1,Ci)
        f_att = nn.sigmoid(nn.Conv(self.out_planes, (1, 1), dtype=self.dtype,
                                   name="filter_fc")(a) / t)         # (b,1,1,Co)
        s_att = nn.sigmoid(nn.Conv(k * k, (1, 1), dtype=self.dtype,
                                   name="spatial_fc")(a) / t)        # (b,1,1,k²)
        k_att = jax.nn.softmax(nn.Conv(kn, (1, 1), dtype=self.dtype,
                                       name="kernel_fc")(a) / t, axis=-1)

        # candidate kernels, HWIO per candidate: (kn, k, k, Ci, Co)
        weight = self.param(
            "weight",
            lambda key, shape: jax.nn.initializers.he_normal(
                in_axis=(1, 2, 3), out_axis=4)(key, shape),
            (kn, k, k, self.in_planes, self.out_planes))

        x = x * ch_att
        # blend: spatial (b,k,k,1,1) × kernel (b,kn,1,1,1,1) × weight
        s = s_att.reshape(b, k, k, 1, 1)
        ka = k_att.reshape(b, kn, 1, 1, 1, 1)
        agg = jnp.sum(ka * weight[None], axis=1) * s  # (b,k,k,Ci,Co)

        def conv_one(xi, wi):
            return jax.lax.conv_general_dilated(
                xi[None], wi, (self.stride, self.stride),
                ((self.padding, self.padding),) * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]

        y = jax.vmap(conv_one)(x, agg.astype(self.dtype))
        return y * f_att
