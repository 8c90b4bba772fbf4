"""GGCA — Global Grouped Coordinate Attention.

Re-designs `cvit_GGCA_ADD_DEConv_RepBn8.py:144-207`: channels split into
groups; per-group directional (H and W) avg+max pooling; a *shared* 1×1
bottleneck (reduction 16) producing sigmoid gates; output = x · gate_h ·
gate_w. Implemented NHWC with groups folded into the batch axis so the shared
bottleneck is one batched matmul-friendly conv.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from fac_fake_tpu.models.layers import TorchBatchNorm


class GGCA(nn.Module):
    channels: int
    reduction: int = 16
    num_groups: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, hh, ww, c = x.shape
        g = self.num_groups
        cg = c // g
        assert c % g == 0, "channels must divide num_groups"

        # directional pools, keeping NHWC
        x_h_avg = jnp.mean(x, axis=2, keepdims=True)  # (b, h, 1, c)
        x_h_max = jnp.max(x, axis=2, keepdims=True)
        x_w_avg = jnp.mean(x, axis=1, keepdims=True)  # (b, 1, w, c)
        x_w_max = jnp.max(x, axis=1, keepdims=True)

        conv1 = nn.Conv(max(1, cg // self.reduction), (1, 1), use_bias=True,
                        dtype=self.dtype, name="conv1")
        bn = TorchBatchNorm(use_running_average=not train, dtype=self.dtype, name="bn")
        conv2 = nn.Conv(cg, (1, 1), use_bias=True, dtype=self.dtype, name="conv2")

        def fold(t):
            # (b, h, w, c) -> (b*g, h, w, cg): groups are leading channel blocks
            bb, th, tw, _ = t.shape
            return (t.reshape(bb, th, tw, g, cg)
                     .transpose(0, 3, 1, 2, 4)
                     .reshape(bb * g, th, tw, cg))

        def unfold(t, th, tw):
            return (t.reshape(b, g, th, tw, cg)
                     .transpose(0, 2, 3, 1, 4)
                     .reshape(b, th, tw, c))

        def shared(t):
            return conv2(nn.relu(bn(conv1(t))))

        y_h = shared(fold(x_h_avg)) + shared(fold(x_h_max))
        y_w = shared(fold(x_w_avg)) + shared(fold(x_w_max))
        att_h = nn.sigmoid(unfold(y_h, hh, 1))
        att_w = nn.sigmoid(unfold(y_w, 1, ww))
        return x * att_h * att_w
