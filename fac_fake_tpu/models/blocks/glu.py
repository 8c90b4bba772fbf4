"""ConvolutionalGLU — depthwise-conv gated FFN on token sequences.

Re-designs `other/cvit_GGCA_ADD_GLUconv.py:158-205`: fc1 doubles to
2·hidden (hidden = 2/3 of the nominal width), the first half is reshaped to
an H×W map, depthwise-3×3 convolved, GELU'd, and gates the second half;
fc2 projects back.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn


class ConvolutionalGLU(nn.Module):
    dim: int
    hidden: int = 0        # 0 → 2/3 · dim (reference default)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens, h: int, w: int, train: bool = False):
        b, n, c = tokens.shape
        hidden = self.hidden or int(2 * self.dim / 3)
        xv = nn.Dense(hidden * 2, dtype=self.dtype, name="fc1")(tokens)
        x, v = xv[..., :hidden], xv[..., hidden:]
        fm = x.reshape(b, h, w, hidden)
        fm = nn.Conv(hidden, (3, 3), padding=((1, 1), (1, 1)),
                     feature_group_count=hidden, use_bias=True,
                     dtype=self.dtype, name="dwconv")(fm)
        x = nn.gelu(fm.reshape(b, n, hidden), approximate=False) * v
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x)
