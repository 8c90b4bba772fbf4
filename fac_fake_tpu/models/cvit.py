"""CViT — Convolutional Vision Transformer, TPU-native.

One configurable skeleton replaces the reference's base model
(`/root/reference/CViT-main/model/cvit.py:80-179`) and its ~30 copy-pasted
variants (SURVEY.md §2.2): stem spec + optional GGCA + FFN-norm choice.

Quirks preserved (SURVEY.md §8):
  * `pos_mode='legacy'` keeps the (32, 1, dim) *batch-indexed* positional
    embedding — `x += pos_embedding[0:batch]` adds one learned vector per
    batch *row* (`model/cvit.py:154,174-175`), capping batches at 32. The
    `pos_indices` argument lets the inference pipeline replicate the
    reference's 0:32/32:64/64:90 chunk-boundary row assignment in ONE padded
    forward instead of three chunked ones (`cvit_prediction.py:224-238`).
  * `pos_mode='patch'` is the sane per-position mode for new training runs.

Input is NHWC float (B, H, W, 3) — TPU/XLA's preferred conv layout.
"""
from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from fac_fake_tpu.core.registry import register
from fac_fake_tpu.models.blocks.ggca import GGCA
from fac_fake_tpu.models.layers import MLPHead, TransformerEncoder
from fac_fake_tpu.models.stems import (Stem, StemSpec, repbn8_stem1,
                                       repbn8_stem2, vgg_stem)

LEGACY_POS_ROWS = 32


def patchify(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """NHWC (b, h·p, w·p, c) → (b, h·w, p·p·c), token layout matching the
    reference's `rearrange('b c (h p1) (w p2) -> b (h w) (p1 p2 c)')`."""
    b, hh, ww, c = x.shape
    h, w = hh // p, ww // p
    x = x.reshape(b, h, p, w, p, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h * w, p * p * c)


class CViT(nn.Module):
    stem_spec: StemSpec
    stem2_spec: Optional[StemSpec] = None
    patch_size: int = 7
    num_classes: int = 2
    dim: int = 1024
    depth: int = 6
    heads: int = 8
    mlp_dim: int = 2048
    pos_mode: str = "legacy"          # legacy | patch
    use_ggca: bool = False
    ffn_norm: str = "ln"              # ln | linearnorm
    feature_hw: int = 7               # stem output spatial extent
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img: jnp.ndarray, train: bool = False,
                 mask: Optional[jnp.ndarray] = None,
                 pos_indices: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        x = Stem(self.stem_spec, dtype=self.dtype, name="stem")(img, train)
        if self.stem2_spec is not None:
            x = Stem(self.stem2_spec, dtype=self.dtype, name="stem2")(x, train)
        if self.use_ggca:
            # flagship applies x · GGCA(x) — GGCA itself already returns
            # x · gates, so the net effect is x² · gates (RepBn8.py:438-439)
            x = x * GGCA(x.shape[-1], dtype=self.dtype, name="ggca")(x, train)

        y = patchify(x, self.patch_size)
        y = nn.Dense(self.dim, dtype=self.dtype, name="patch_to_embedding")(y)

        b, n = y.shape[0], y.shape[1]
        cls = self.param("cls_token", nn.initializers.normal(1.0), (1, 1, self.dim))
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(y.dtype), (b, 1, self.dim)), y], axis=1)

        if self.pos_mode == "legacy":
            pos = self.param("pos_embedding", nn.initializers.normal(1.0),
                             (LEGACY_POS_ROWS, 1, self.dim))
            if pos_indices is None:
                pe = pos[:b]
            else:
                pe = pos[pos_indices]
            tokens = tokens + pe.astype(tokens.dtype)
        else:
            pos = self.param("pos_embedding", nn.initializers.normal(0.02),
                             (1, n + 1, self.dim))
            tokens = tokens + pos.astype(tokens.dtype)

        tokens = TransformerEncoder(self.dim, self.depth, self.heads, self.mlp_dim,
                                    ffn_norm=self.ffn_norm, dtype=self.dtype,
                                    name="transformer")(tokens, mask, train)
        return MLPHead(self.mlp_dim, self.num_classes, dtype=self.dtype,
                       name="mlp_head")(tokens[:, 0]).astype(jnp.float32)


def _dtype(cfg) -> Any:
    return jnp.bfloat16 if getattr(cfg, "dtype", "float32") == "bfloat16" else jnp.float32


@register("model", "cvit")
def build_cvit(cfg) -> CViT:
    """Canonical CViT(224, 7, 2, 512, 1024, 6, 8, 2048) — `cvit_prediction.py:62-63`."""
    return CViT(stem_spec=vgg_stem(), patch_size=cfg.patch_size,
                num_classes=cfg.num_classes, dim=cfg.dim, depth=cfg.depth,
                heads=cfg.heads, mlp_dim=cfg.mlp_dim,
                pos_mode=cfg.pos_embedding_mode, dtype=_dtype(cfg))


@register("model", "cvit_repbn8")
def build_cvit_repbn8(cfg) -> CViT:
    """Flagship variant `cvit_GGCA_ADD_DEConv_RepBn8.py` (SURVEY.md §2.2):
    DEConv-heavy stem, GGCA at 512×7×7, RepBN-blended FFN pre-norm."""
    return CViT(stem_spec=repbn8_stem1(), stem2_spec=repbn8_stem2(),
                patch_size=cfg.patch_size, num_classes=cfg.num_classes,
                dim=cfg.dim, depth=cfg.depth, heads=cfg.heads,
                mlp_dim=cfg.mlp_dim, pos_mode=cfg.pos_embedding_mode,
                use_ggca=True, ffn_norm="linearnorm", dtype=_dtype(cfg))
