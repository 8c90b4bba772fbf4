"""S3D model family, assembled from spec lists.

One sequence-executing module replaces the reference's four near-identical
~350-line model files:
  * S3D          — `S3D/model.py:6-48` (separable-3D Inception, 20-frame clip
                   → 1 logit; optional 30-ch SRM input, `model.py:10-16`);
  * CA_S3D_v3    — `S3D/CA_S3D.py:9-60` (+ GCNet ContextBlock3d after 6 of
                   the Inception stages);
  * msca_S3D     — `S3D/msca_S3D.py:17-72` / `msca_S3Dv1.py:74-129` (iFormer
                   hybrid, reduced 5b/5c tail);
  * msca_S3D_SRM — `msca_S3Dv1.py:17-72` (residual 3-filter SRM: y = x+SRM(x),
                   + MSCAN_half stem block); v2 variants (`msca_S3Dv2.py`,
                   diff-verified): msca_S3Dv2 = all-full iFormer blocks,
                   msca_S3D_SRM-v2 = v1 structure without the stem MSCAN_half.

This also fixes the reference's shipped import bug (`S3D-train.py:30` imports
`msca_S3D_SRM` from a module that doesn't define it — SURVEY.md §8.6): here
every variant is a registry entry.

Input: (B, T, H, W, 3) float NDHWC (the reference's (B,3,T,H,W) transposed).
Output: (B, num_class) logits (temporal-mean head, `model.py:37-48`).
"""
from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from fac_fake_tpu.core.registry import register
from fac_fake_tpu.models.s3d.blocks import (INCEPTION_PLANS, ContextBlock3d,
                                            IFormerBlock, InceptionMix,
                                            MSCANHalf)
from fac_fake_tpu.models.s3d.layers import (BasicConv3d, SepConv3d,
                                            avg_pool3d, max_pool3d, srm_filter)

_P133 = (("pool", (1, 3, 3), (1, 2, 2), (0, 1, 1)),)
_P333 = (("pool", (3, 3, 3), (2, 2, 2), (1, 1, 1)),)
_P222 = (("pool", (2, 2, 2), (2, 2, 2), (0, 0, 0)),)


def s3d_spec(act: str = "relu") -> Tuple:
    return (
        ("sep", 64, 7, 2, 3, act, True),
    ) + _P133 + (
        ("basic", 64, 1, 1, 0, act),
        ("sep", 192, 3, 1, 1, act, True),
    ) + _P133 + (
        ("mix", "3b", act, True), ("mix", "3c", act, True),
    ) + _P333 + (
        ("mix", "4b", act, True), ("mix", "4c", act, True),
        ("mix", "4d", act, True), ("mix", "4e", act, True),
        ("mix", "4f", act, True),
    ) + _P222 + (
        ("mix", "5b", act, True), ("mix", "5c", act, True),
    )


def ca_s3d_spec() -> Tuple:
    act = "relu"
    ctx = ("ctx", 1.0 / 16.0, "avg")
    return (
        ("sep", 64, 7, 2, 3, act, True),
    ) + _P133 + (
        ("basic", 64, 1, 1, 0, act),
        ("sep", 192, 3, 1, 1, act, True),
    ) + _P133 + (
        ("mix", "3b", act, True), ctx, ("mix", "3c", act, True),
    ) + _P333 + (
        ("mix", "4b", act, True), ctx, ("mix", "4c", act, True), ctx,
        ("mix", "4d", act, True), ctx, ("mix", "4e", act, True), ctx,
        ("mix", "4f", act, True),
    ) + _P222 + (
        ("mix", "5b", act, True), ctx, ("mix", "5c", act, True),
    )


def msca_spec(stem_mscan: bool = False, all_full: bool = False) -> Tuple:
    """msca_S3D layer plans. Default (`msca_S3D.py:85-115`/`msca_S3Dv1.py`):
    light-light-full triplets at 320ch; `all_full` is the v2 re-plan
    (`msca_S3Dv2.py:85-104`: two full blocks per ratio, none light);
    `stem_mscan` adds the v1-SRM stem MSCAN_half (`msca_S3Dv1.py:31`)."""
    act = "relu6"
    spec: Tuple = (("sep", 64, 7, 2, 3, act, True),) + _P133
    if stem_mscan:
        spec += (("mscan_half", 1),)
    spec += (
        ("basic", 64, 1, 1, 0, act),
        ("sep", 192, 3, 1, 1, act, True),
    ) + _P133
    if all_full:
        spec += (("iformer", 0.25, 1, False),) * 2
        spec += (("basic", 320, 1, 1, 0, act),) + _P333
        for ratio in (1 / 3, 1 / 2, 2 / 3):
            spec += (("iformer", ratio, 3, False),) * 2
    else:
        spec += (("iformer", 0.25, 1, True), ("iformer", 0.25, 1, False),
                 ("basic", 320, 1, 1, 0, act)) + _P333
        for ratio in (1 / 3, 1 / 2, 2 / 3):
            spec += (("iformer", ratio, 3, True),) * 2 \
                + (("iformer", ratio, 3, False),)
    spec += _P222 + (
        ("mix", "m5b", act, False),   # SepConv3dV2 branches (no spatial BN)
        ("mix", "m5c", act, True),
    )
    return spec


class S3DNet(nn.Module):
    spec: Tuple
    num_class: int = 1
    srm: str = "none"      # none | concat30 (HPF) | residual3 (HPF_3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, clips: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = clips.astype(self.dtype)
        if self.srm == "concat30":
            x = srm_filter(x, full=True)
        elif self.srm == "residual3":
            x = x + srm_filter(x, full=False)

        for i, op in enumerate(self.spec):
            kind = op[0]
            name = f"l{i}"
            if kind == "sep":
                _, out, k, s, p, act, sbn = op
                x = SepConv3d(out, (k, k, k), s, (p, p, p), act=act,
                              spatial_bn=sbn, spatial_act=sbn,
                              dtype=self.dtype, name=name)(x, train)
            elif kind == "basic":
                _, out, k, s, p, act = op
                x = BasicConv3d(out, (k, k, k), (s, s, s), (p, p, p), act=act,
                                dtype=self.dtype, name=name)(x, train)
            elif kind == "pool":
                x = max_pool3d(x, op[1], op[2], op[3])
            elif kind == "mix":
                x = InceptionMix(INCEPTION_PLANS[op[1]], act=op[2],
                                 sep_spatial_bn=op[3], dtype=self.dtype,
                                 name=name)(x, train)
            elif kind == "ctx":
                x = ContextBlock3d(op[1], op[2], dtype=self.dtype,
                                   name=name)(x, train)
            elif kind == "mscan_half":
                x = MSCANHalf(op[1], dtype=self.dtype, name=name)(x, train)
            elif kind == "iformer":
                x = IFormerBlock(op[1], op[2], light=op[3], dtype=self.dtype,
                                 name=name)(x, train)
            else:
                raise ValueError(kind)

        # head: avg over (2, H, W) stride 1, 1×1×1 conv, temporal mean
        x = avg_pool3d(x, (2, x.shape[2], x.shape[3]))
        x = nn.Conv(self.num_class, (1, 1, 1), use_bias=True,
                    dtype=self.dtype, name="fc")(x)
        return jnp.mean(x.reshape(x.shape[0], x.shape[1], self.num_class),
                        axis=1).astype(jnp.float32)


def _dt(cfg):
    return jnp.bfloat16 if getattr(cfg, "dtype", "float32") == "bfloat16" \
        else jnp.float32


@register("model", "s3d")
def build_s3d(cfg):
    return S3DNet(spec=s3d_spec(), num_class=cfg.num_class,
                  srm="concat30" if cfg.srm_net else "none", dtype=_dt(cfg))


@register("model", "ca_s3d")
def build_ca_s3d(cfg):
    """CA_S3D_v3 — the default `--model_type 0` (`S3D-train.py:169-171`)."""
    return S3DNet(spec=ca_s3d_spec(), num_class=cfg.num_class,
                  srm="concat30" if cfg.srm_net else "none", dtype=_dt(cfg))


@register("model", "msca_s3d")
def build_msca_s3d(cfg):
    return S3DNet(spec=msca_spec(), num_class=cfg.num_class,
                  srm="concat30" if cfg.srm_net else "none", dtype=_dt(cfg))


@register("model", "msca_s3d_srm")
def build_msca_s3d_srm(cfg):
    """v1 residual-SRM hybrid: y = x + HPF_3(x) (`msca_S3Dv1.py:61-63`)."""
    return S3DNet(spec=msca_spec(stem_mscan=True), num_class=cfg.num_class,
                  srm="residual3" if cfg.srm_net else "none", dtype=_dt(cfg))


@register("model", "msca_s3d_v2")
def build_msca_s3d_v2(cfg):
    """v2 re-plan: all-full iFormer blocks (`msca_S3Dv2.py:85-104`)."""
    return S3DNet(spec=msca_spec(all_full=True), num_class=cfg.num_class,
                  srm="concat30" if cfg.srm_net else "none", dtype=_dt(cfg))


@register("model", "msca_s3d_srm_v2")
def build_msca_s3d_srm_v2(cfg):
    """v2 residual-SRM: v1 structure minus the stem MSCAN_half
    (`msca_S3Dv2.py` msca_S3D_SRM, diff-verified)."""
    return S3DNet(spec=msca_spec(stem_mscan=False), num_class=cfg.num_class,
                  srm="residual3" if cfg.srm_net else "none", dtype=_dt(cfg))
