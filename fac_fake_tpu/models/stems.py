"""Convolutional stem DSL.

The reference's ~30 CViT variants each copy the whole VGG-ish stem and swap
layers (SURVEY.md §2.2). Here a stem is *data*: a tuple of ops, executed by
one `Stem` module. Op kinds: ("conv", ch) 3×3 conv pad 1 · ("deconv", ch)
DEConv block · ("bn", ch) · ("relu",) · ("pool",) 2×2 maxpool.

Each op is named ``l{index}`` so a stem spec doubles as the checkpoint name
map for torch ``features.{index}.*`` keys (same sequential indexing).
"""
from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from fac_fake_tpu.models.blocks.deconv import DEConv
from fac_fake_tpu.models.layers import TorchBatchNorm, conv3x3

StemSpec = Tuple[Tuple, ...]


def _cbr(ch: int, conv: str = "conv"):
    return ((conv, ch), ("bn", ch), ("relu",))


def vgg_stem() -> StemSpec:
    """Reference CViT base stem: 17 convs, 5 maxpools, 224→7×7×512
    (`model/cvit.py:86-148`)."""
    spec: Tuple = ()
    for ch, n in ((32, 3), (64, 3), (128, 3), (256, 4), (512, 4)):
        for _ in range(n):
            spec += _cbr(ch)
        spec += (("pool",),)
    return spec


def repbn8_stem1() -> StemSpec:
    """Flagship features1 (`cvit_GGCA_ADD_DEConv_RepBn8.py:349-396`):
    conv+2×DEConv per early stage; the 128 stage has the reference's odd
    bn-less conv→deconv→relu tail; 256 stage is conv+3×DEConv."""
    spec: Tuple = ()
    for ch in (32, 64):
        spec += _cbr(ch) + _cbr(ch, "deconv") + _cbr(ch, "deconv") + (("pool",),)
    # 128 stage: c-bn-r, d-bn-r, then conv, deconv, relu (no BNs) — quirk kept
    spec += _cbr(128) + _cbr(128, "deconv")
    spec += (("conv", 128), ("deconv", 128), ("relu",), ("pool",))
    # 256 stage
    spec += _cbr(256) + _cbr(256, "deconv") + _cbr(256, "deconv") + _cbr(256, "deconv")
    spec += (("pool",),)
    return spec


def repbn8_stem2() -> StemSpec:
    """Flagship features2 (`cvit_GGCA_ADD_DEConv_RepBn8.py:397-412`)."""
    spec: Tuple = _cbr(512)
    for _ in range(3):
        spec += _cbr(512, "deconv")
    return spec + (("pool",),)


class Stem(nn.Module):
    spec: StemSpec
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for idx, op in enumerate(self.spec):
            kind = op[0]
            if kind == "conv":
                x = conv3x3(op[1], dtype=self.dtype, name=f"l{idx}")(x)
            elif kind == "deconv":
                x = DEConv(op[1], dtype=self.dtype, name=f"l{idx}")(x)
            elif kind == "bn":
                x = TorchBatchNorm(use_running_average=not train,
                                   dtype=self.dtype, name=f"l{idx}")(x)
            elif kind == "relu":
                x = nn.relu(x)
            elif kind == "pool":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                raise ValueError(f"unknown stem op {kind}")
        return x
