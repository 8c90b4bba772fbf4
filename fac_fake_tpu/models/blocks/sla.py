"""Simplified Linear Attention (focused linear attention variant).

Re-designs `other/cvit_GGCA_SLA.py:160-245`: ReLU-kernelized linear
attention with an additive positional encoding on K and a depthwise-conv
local branch on V. The attention math picks the cheaper contraction order;
under jit both orders are static, so we keep the reference's selector.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn


class SimplifiedLinearAttention(nn.Module):
    dim: int
    window_size: Tuple[int, int] = (32, 32)
    num_heads: int = 8
    qkv_bias: bool = True
    kernel_size: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, n, c = x.shape
        h = self.num_heads
        hd = self.dim // h

        qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(x).reshape(b, n, 3, c)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        pos = self.param("positional_encoding", nn.initializers.zeros,
                         (1, self.window_size[0] * self.window_size[1], self.dim))
        k = k + pos[:, :n]

        q, k = nn.relu(q), nn.relu(k)
        # (b, n, h·hd) → (b·h, n, hd)
        split = lambda t: (t.reshape(b, n, h, hd).transpose(0, 2, 1, 3)
                           .reshape(b * h, n, hd))
        q, k, v = split(q), split(k), split(v)

        i = j = n
        cd = hd
        z = 1.0 / (jnp.einsum("bic,bc->bi", q, k.sum(axis=1)) + 1e-6)
        if i * j * (cd + cd) > cd * cd * (i + j):
            kv = jnp.einsum("bjc,bjd->bcd", k, v)
            out = jnp.einsum("bic,bcd,bi->bid", q, kv, z)
        else:
            qk = jnp.einsum("bic,bjc->bij", q, k)
            out = jnp.einsum("bij,bjd,bi->bid", qk, v, z)

        # depthwise local enhancement on V arranged as a square map
        num = int(round(n ** 0.5))
        fm = v.reshape(b * h, num, num, hd)
        fm = nn.Conv(hd, (self.kernel_size,) * 2,
                     padding=((self.kernel_size // 2,) * 2,) * 2,
                     feature_group_count=hd, dtype=self.dtype, name="dwc")(fm)
        out = out + fm.reshape(b * h, n, hd)

        out = out.reshape(b, h, n, hd).transpose(0, 2, 1, 3).reshape(b, n, c)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)
