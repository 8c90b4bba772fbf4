"""Convolutional stem DSL.

The reference's ~30 CViT variants each copy the whole VGG-ish stem and swap
layers (SURVEY.md §2.2). Here a stem is *data*: a tuple of ops, executed by
one `Stem` module. Op kinds:
  ("conv", ch) 3×3 conv pad 1 · ("deconv", ch) DEConv · ("bn", ch) ·
  ("relu",) · ("pool",) 2×2 maxpool · ("scconv", ch) · ("wtconv", ch) ·
  ("idw", ch) InceptionDWConv2d · ("od", ch) ODConv2d stem op.

Each op is named ``l{index}`` so a stem spec doubles as the checkpoint name
map for torch ``features.{index}.*`` keys (same sequential indexing). Stem
layouts below were extracted from the corresponding reference Sequentials
(file cited per builder).

``("qconv", ch)`` is a post-training-quantized 3×3 conv (int8 weights +
per-tensor activation scale) produced by `compat/quantize.py` from a folded
("conv", ch) — an inference-only op that runs the MXU at its 2× int8 rate.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from fac_fake_tpu.models.blocks.deconv import DEConv
from fac_fake_tpu.models.layers import TorchBatchNorm, conv3x3

StemSpec = Tuple[Tuple, ...]

_VGG_STAGES = ((32, 3), (64, 3), (128, 3), (256, 4), (512, 4))


def _cbr(ch: int, kind: str = "conv"):
    return ((kind, ch), ("bn", ch), ("relu",))


def _stage(ch: int, kinds) -> Tuple:
    spec: Tuple = ()
    for k in kinds:
        spec += _cbr(ch, k)
    return spec + (("pool",),)


def vgg_stem() -> StemSpec:
    """Reference CViT base stem: 17 convs, 5 maxpools, 224→7×7×512
    (`model/cvit.py:86-148`)."""
    spec: Tuple = ()
    for ch, n in _VGG_STAGES:
        spec += _stage(ch, ["conv"] * n)
    return spec


def vgg_split(n_stages: int = 4) -> Tuple[StemSpec, StemSpec]:
    """VGG stem split after `n_stages` stages — the features1/features2
    separation most `other/` variants use (4 → 256ch/14², 2 → 64ch/56²)."""
    first: Tuple = ()
    second: Tuple = ()
    for i, (ch, n) in enumerate(_VGG_STAGES):
        if i < n_stages:
            first += _stage(ch, ["conv"] * n)
        else:
            second += _stage(ch, ["conv"] * n)
    return first, second


def repbn8_stem1() -> StemSpec:
    """Flagship features1 (`cvit_GGCA_ADD_DEConv_RepBn8.py:349-396`), also
    cvit_DEConv / cvit_GGCA_ADD_DEConv / RepBn5 features1."""
    spec: Tuple = ()
    for ch in (32, 64):
        spec += _stage(ch, ["conv", "deconv", "deconv"])
    # 128 stage: c-bn-r, d-bn-r, then conv, deconv, relu (no BNs) — quirk kept
    spec += _cbr(128) + _cbr(128, "deconv")
    spec += (("conv", 128), ("deconv", 128), ("relu",), ("pool",))
    spec += _stage(256, ["conv", "deconv", "deconv", "deconv"])
    return spec


def repbn8_stem2() -> StemSpec:
    """Flagship features2 (`cvit_GGCA_ADD_DEConv_RepBn8.py:397-412`)."""
    return _stage(512, ["conv", "deconv", "deconv", "deconv"])


def deconv_stem1(tail_deconv: bool = True) -> StemSpec:
    """cvit_DEConv.py features1 == RepBn8's; RepBn4 swaps the last 256 deconv
    for a conv (`cvit_GGCA_ADD_DEConv_RepBn4.py`)."""
    if tail_deconv:
        return repbn8_stem1()
    spec: Tuple = ()
    for ch in (32, 64):
        spec += _stage(ch, ["conv", "deconv", "deconv"])
    spec += _cbr(128) + _cbr(128, "deconv")
    spec += (("conv", 128), ("deconv", 128), ("relu",), ("pool",))
    spec += _stage(256, ["conv", "deconv", "deconv", "conv"])
    return spec


def deconv_stem2() -> StemSpec:
    return repbn8_stem2()


def repbn_stem1() -> StemSpec:
    """cvit_GGCA_ADD_DEConv_RepBn.py features1: one DEConv per early stage."""
    spec: Tuple = _stage(32, ["conv", "conv", "deconv"])
    spec += _stage(64, ["conv", "deconv", "conv"])
    spec += _stage(128, ["conv", "deconv", "conv"])
    spec += _stage(256, ["conv", "deconv", "deconv", "conv"])
    return spec


def repbn3_stems() -> Dict[str, Any]:
    """cvit_GGCA_ADD_DEConv_RepBn3.py: three stems, GGCA add at 64ch/56²."""
    s1 = _stage(32, ["conv", "conv", "deconv"]) + _stage(64, ["conv", "deconv", "conv"])
    s2 = _stage(128, ["conv", "deconv", "conv"]) \
        + _stage(256, ["conv", "deconv", "deconv", "conv"])
    s3 = _stage(512, ["conv"] * 4)
    return dict(stem_spec=s1, stem2_spec=s2, stem3_spec=s3,
                slot1=("ggca", "add", 64))


def repbn4_stem2() -> StemSpec:
    """cvit_GGCA_ADD_DEConv_RepBn4.py features2."""
    return _stage(512, ["conv", "conv", "deconv", "conv"])


def scconv_stem1() -> StemSpec:
    """other/cvit_GGCA_ADD_ScConv.py features1."""
    spec: Tuple = _stage(32, ["conv"] * 3)
    spec += _stage(64, ["conv", "scconv", "conv"])
    spec += _stage(128, ["conv", "scconv", "conv"])
    spec += _stage(256, ["conv", "scconv", "conv", "scconv"])
    return spec


def wtconv_stem() -> StemSpec:
    """other/cvit_GGCA_ADD_WTConv.py features (single stem)."""
    spec: Tuple = ()
    for ch, n in ((32, 3), (64, 3), (128, 3)):
        spec += _stage(ch, ["conv"] + ["wtconv"] * (n - 1))
    spec += _stage(256, ["conv", "wtconv", "wtconv", "wtconv"])
    spec += _stage(512, ["conv"] * 4)
    return spec


def idw_stem() -> StemSpec:
    """cvit_GGCA_ADD_DConv.py features (InceptionDW mixers)."""
    spec: Tuple = ()
    for ch, n in ((32, 3), (64, 3), (128, 3)):
        spec += _stage(ch, ["conv"] + ["idw"] * (n - 1))
    spec += _stage(256, ["conv", "idw", "idw", "idw"])
    spec += _stage(512, ["conv"] * 4)
    return spec


def odconv_stem1() -> StemSpec:
    """other/cvit_GGCA_ADD_ODConv.py features1 (ODConv as a stem op)."""
    spec: Tuple = _stage(32, ["conv"] * 3)
    spec += _stage(64, ["conv", "od", "conv"])
    spec += _stage(128, ["conv", "od", "conv"])
    spec += _stage(256, ["conv", "od", "conv", "od"])
    return spec


def sla_stems() -> Dict[str, Any]:
    """other/cvit_GGCA_SLA.py: only 3 pools (28² features), GGCA add post."""
    s1: Tuple = _stage(32, ["conv"] * 3) + _stage(64, ["conv"] * 3) \
        + _stage(128, ["conv"] * 3)
    s1 += _cbr(256) * 4                 # 256 stage WITHOUT pool
    s2: Tuple = _cbr(512) * 4           # 512 stage WITHOUT pool
    return dict(stem_spec=s1, stem2_spec=s2, slot2=("ggca", "add", 512))


def glu_stem() -> StemSpec:
    """other/cvit_GGCA_ADD_GLUconv.py features: only 2 pools (56² output)."""
    spec: Tuple = _stage(32, ["conv"] * 3) + _stage(64, ["conv"] * 3)
    spec += _cbr(128) * 3 + _cbr(256) * 4 + _cbr(512) * 4
    return spec


class Stem(nn.Module):
    spec: StemSpec
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        from fac_fake_tpu.models.blocks.inception_dw import InceptionDWConv2d
        from fac_fake_tpu.models.blocks.odconv import ODConv2d
        from fac_fake_tpu.models.blocks.scconv import ScConv
        from fac_fake_tpu.models.blocks.wtconv import WTConv2d

        for idx, op in enumerate(self.spec):
            kind = op[0]
            name = f"l{idx}"
            if kind == "conv":
                x = conv3x3(op[1], dtype=self.dtype, name=name)(x)
            elif kind == "qconv":
                from fac_fake_tpu.models.layers import QuantConv3x3
                x = QuantConv3x3(op[1], dtype=self.dtype, name=name)(x)
            elif kind == "deconv":
                x = DEConv(op[1], dtype=self.dtype, name=name)(x)
            elif kind == "bn":
                x = TorchBatchNorm(use_running_average=not train,
                                   dtype=self.dtype, name=name)(x)
            elif kind == "relu":
                x = nn.relu(x)
            elif kind == "pool":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            elif kind == "scconv":
                x = ScConv(op[1], dtype=self.dtype, name=name)(x, train)
            elif kind == "wtconv":
                x = WTConv2d(op[1], dtype=self.dtype, name=name)(x, train)
            elif kind == "idw":
                x = InceptionDWConv2d(op[1], dtype=self.dtype, name=name)(x, train)
            elif kind == "od":
                x = ODConv2d(op[1], op[1], 3, dtype=self.dtype,
                             name=name)(x, train)
            else:
                raise ValueError(f"unknown stem op {kind}")
        return x
