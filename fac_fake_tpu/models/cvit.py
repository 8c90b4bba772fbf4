"""CViT — Convolutional Vision Transformer, TPU-native.

ONE configurable skeleton replaces the reference's base model
(`/root/reference/CViT-main/model/cvit.py:80-179`) and its ~30 copy-pasted
variant files (SURVEY.md §2.2). A variant is data: up to three stem specs
(`models/stems.py` DSL), a block slot after each stem, an embedding-space
block, and a token-space block. Placements/modes were extracted from each
reference file's forward (cited per registration below).

Quirks preserved (SURVEY.md §8):
  * `pos_mode='legacy'` keeps the (32, 1, dim) *batch-indexed* positional
    embedding — `x += pos_embedding[0:batch]` adds one learned vector per
    batch *row* (`model/cvit.py:154,174-175`), capping batches at 32. The
    `pos_indices` argument lets the inference pipeline replicate the
    reference's 0:32/32:64/64:90 chunk-boundary row assignment in ONE padded
    forward (`cvit_prediction.py:224-238`).
  * `pos_mode='patch'` is the sane per-position mode for new training runs.
  * file-name vs math mismatches are kept: e.g. `cvit_GGCA_ADD` actually
    *multiplies* (`cvit_GGCA_ADD.py` forward: `x = x * x1`).

Input is NHWC float (B, H, W, 3) — TPU/XLA's preferred conv layout.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from fac_fake_tpu.core.registry import register
from fac_fake_tpu.models.blocks.attention2d import BFM, MDFA
from fac_fake_tpu.models.blocks.ggca import GGCA
from fac_fake_tpu.models.blocks.glu import ConvolutionalGLU
from fac_fake_tpu.models.blocks.moga import MultiOrderGatedAggregation
from fac_fake_tpu.models.blocks.odconv import ODConv2d
from fac_fake_tpu.models.blocks.sla import SimplifiedLinearAttention
from fac_fake_tpu.models.blocks.smfa import SMFA
from fac_fake_tpu.models.blocks.uffc import FourierUnitModified
from fac_fake_tpu.models.layers import MLPHead, TransformerEncoder, dense
from fac_fake_tpu.models.stems import (Stem, StemSpec, repbn8_stem1,
                                       repbn8_stem2, vgg_stem)

LEGACY_POS_ROWS = 32

# (kind, mode, channels) — mode ∈ replace | add | mul
BlockRef = Tuple[str, str, int]


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
    stem3_spec: Optional[StemSpec] = None
    # block applied after stem1 / stem2 / stem3 (torch attr name == kind)
    slot1: Optional[BlockRef] = None
    slot2: Optional[BlockRef] = None
    slot3: Optional[BlockRef] = None
    embed_block: Optional[Tuple] = None   # ('sla', feat_dim) | ('glu', dim, h, w)
    token_block: Optional[Tuple] = None   # ('mdfa', 2) | ('bfm', 2) on (B,2,32,32)
    patch_size: int = 7
    num_classes: int = 2
    dim: int = 1024
    depth: int = 6
    heads: int = 8
    mlp_dim: int = 2048
    pos_mode: str = "legacy"          # legacy | patch
    ffn_norm: str = "ln"              # ln | linearnorm
    use_ggca: bool = False            # legacy shorthand: GGCA 'mul' after last stem
    quant_dense: bool = False         # PTQ int8 patch-embedding + transformer
    dtype: Any = jnp.float32

    def _apply_block(self, x, blk: BlockRef, train: bool):
        kind, mode, arg = blk
        if kind == "ggca":
            y = GGCA(x.shape[-1], dtype=self.dtype, name="ggca")(x, train)
        elif kind == "bfm":
            y = BFM(arg, dtype=self.dtype, name="bfm")(x, x, train)
        elif kind == "mdfa":
            y = MDFA(arg, dtype=self.dtype, name="mdfa")(x, train)
        elif kind == "odconv":
            y = ODConv2d(arg, arg, 3, dtype=self.dtype, name="odconv")(x, train)
        elif kind == "moga":
            y = MultiOrderGatedAggregation(arg, dtype=self.dtype,
                                           name="moga")(x, train)
        elif kind == "smfa":
            y = SMFA(arg, dtype=self.dtype, name="smfa")(x, train)
        elif kind == "uffc":
            y = FourierUnitModified(arg, image_size=x.shape[1],
                                    dtype=self.dtype, name="uffc")(x, train)
        else:
            raise ValueError(kind)
        if mode == "replace":
            return y
        if mode == "add":
            return x + y
        return x * y  # 'mul'

    @nn.compact
    def __call__(self, img: jnp.ndarray, train: bool = False,
                 mask: Optional[jnp.ndarray] = None,
                 pos_indices: Optional[jnp.ndarray] = None,
                 features_override: Optional[jnp.ndarray] = None,
                 embed_override: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if features_override is not None:
            # GradCAM hook: differentiate the head w.r.t. post-stem features
            x = features_override
        else:
            x = Stem(self.stem_spec, dtype=self.dtype, name="stem")(img, train)
            if self.slot1 is not None:
                x = self._apply_block(x, self.slot1, train)
            if self.stem2_spec is not None:
                # sown for PTQ calibration (`compat/quantize.py` reads each
                # stem's input activations); no-op unless capturing
                self.sow("intermediates", "stem2_input", x)
                x = Stem(self.stem2_spec, dtype=self.dtype, name="stem2")(x, train)
                if self.slot2 is not None:
                    x = self._apply_block(x, self.slot2, train)
            if self.stem3_spec is not None:
                self.sow("intermediates", "stem3_input", x)
                x = Stem(self.stem3_spec, dtype=self.dtype, name="stem3")(x, train)
            if self.slot3 is not None:
                x = self._apply_block(x, self.slot3, train)
            if self.use_ggca:
                # flagship shorthand: x · GGCA(x) — GGCA already returns
                # x · gates, so the net effect is x² · gates (RepBn8.py:438-439)
                x = x * GGCA(x.shape[-1], dtype=self.dtype, name="ggca")(x, train)
        self.sow("intermediates", "stem_features", x)

        y = patchify(x, self.patch_size)
        # PTQ calibration tap + int8 swap (`compat/quantize.py`): the
        # patchify→dim projection is the model's single largest matmul
        self.sow("intermediates", "pe_input", y)
        y = dense(self.dim, quant=self.quant_dense, dtype=self.dtype,
                  name="patch_to_embedding")(y)
        if embed_override is not None:
            # GradCAM token hook (gradcam_transformer.py equivalent)
            y = embed_override
        self.sow("intermediates", "patch_tokens", y)

        if self.embed_block is not None:
            if self.embed_block[0] == "sla":
                # SLA treats embedding channels as tokens (`cvit_GGCA_SLA.py`
                # forward: y.permute(0,2,1) → attention over the dim axis)
                yt = jnp.swapaxes(y, 1, 2)
                yt = yt + SimplifiedLinearAttention(
                    self.embed_block[1], dtype=self.dtype, name="sla")(yt, train)
                y = jnp.swapaxes(yt, 1, 2)
            elif self.embed_block[0] == "glu":
                _, d, gh, gw = self.embed_block
                y = ConvolutionalGLU(d, dtype=self.dtype, name="glu")(
                    y, gh, gw, train)

        b, n = y.shape[0], y.shape[1]
        cls = self.param("cls_token", nn.initializers.normal(1.0), (1, 1, self.dim))
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(y.dtype), (b, 1, self.dim)), y], axis=1)

        if self.pos_mode == "legacy":
            if pos_indices is None and b > LEGACY_POS_ROWS:
                raise ValueError(
                    f"legacy pos-embedding caps batch at {LEGACY_POS_ROWS} "
                    f"(got {b}) — the reference's (32,1,dim) quirk "
                    "(model/cvit.py:154). Use pos_embedding_mode='patch' for "
                    "larger batches, or pass pos_indices.")
            pos = self.param("pos_embedding", nn.initializers.normal(1.0),
                             (LEGACY_POS_ROWS, 1, self.dim))
            pe = pos[:b] if pos_indices is None else pos[pos_indices]
            tokens = tokens + pe.astype(tokens.dtype)
        else:
            pos = self.param("pos_embedding", nn.initializers.normal(0.02),
                             (1, n + 1, self.dim))
            tokens = tokens + pos.astype(tokens.dtype)

        if self.token_block is not None:
            # tokens (B, 2, 1024) viewed as a (B, 32, 32, 2) map
            # (`cvit_BFM_GGCA_MDFA.py:484-489`)
            kind, arg = self.token_block
            tb = tokens.reshape(b, 2, 32, 32).transpose(0, 2, 3, 1)
            if kind == "mdfa":
                tb = MDFA(arg, dtype=self.dtype, name="mdfa_tok")(tb, train)
            else:
                tb = BFM(arg, dtype=self.dtype, name="bfm_tok")(tb, tb, train)
            tokens = tb.transpose(0, 3, 1, 2).reshape(b, 2, self.dim)

        tokens = TransformerEncoder(self.dim, self.depth, self.heads, self.mlp_dim,
                                    ffn_norm=self.ffn_norm, quant=self.quant_dense,
                                    dtype=self.dtype,
                                    name="transformer")(tokens, mask, train)
        return MLPHead(self.mlp_dim, self.num_classes, quant=self.quant_dense,
                       dtype=self.dtype,
                       name="mlp_head")(tokens[:, 0]).astype(jnp.float32)


# ---------------------------------------------------------------------------
# variant registry — placements extracted from each reference file's forward
# ---------------------------------------------------------------------------

def _dtype(cfg) -> Any:
    return jnp.bfloat16 if getattr(cfg, "dtype", "float32") == "bfloat16" else jnp.float32


def _common(cfg) -> dict:
    return dict(patch_size=cfg.patch_size, num_classes=cfg.num_classes,
                dim=cfg.dim, depth=cfg.depth, heads=cfg.heads,
                mlp_dim=cfg.mlp_dim, pos_mode=cfg.pos_embedding_mode,
                dtype=_dtype(cfg))


def _reg(name: str, doc: str, **fixed):
    @register("model", name)
    def build(cfg, _fixed=fixed):
        return CViT(**_common(cfg), **_fixed)
    build.__doc__ = doc
    return build


from fac_fake_tpu.models.stems import (deconv_stem1, deconv_stem2,
                                       glu_stem, idw_stem, odconv_stem1,
                                       repbn_stem1, repbn3_stems,
                                       repbn4_stem2, scconv_stem1, sla_stems,
                                       vgg_split, wtconv_stem)

_VGG1, _VGG2 = vgg_split()          # split after the 256-ch stage (14×14)

_reg("cvit", "canonical CViT(224,7,2,512,1024,6,8,2048) — model/cvit.py",
     stem_spec=vgg_stem())
_reg("cvit_repbn8", "flagship cvit_GGCA_ADD_DEConv_RepBn8.py",
     stem_spec=repbn8_stem1(), stem2_spec=repbn8_stem2(),
     use_ggca=True, ffn_norm="linearnorm")
_reg("cvit_ggca", "other/cvit_GGCA.py: GGCA replace post-stem",
     stem_spec=vgg_stem(), slot1=("ggca", "replace", 512))
_reg("cvit_ggca_add", "cvit_GGCA_ADD.py: x·GGCA(x) post-stem (name says add, "
     "code multiplies)", stem_spec=vgg_stem(), slot1=("ggca", "mul", 512))
_reg("cvit_ggca_add_repbn", "cvit_GGCA_ADD_RepBn.py: GGCA add + LinearNorm FFN",
     stem_spec=vgg_stem(), slot1=("ggca", "add", 512), ffn_norm="linearnorm")
_reg("cvit_ggca4", "other/cvit_GGCA4.py: GGCA replace at 256ch/14²",
     stem_spec=_VGG1, stem2_spec=_VGG2, slot1=("ggca", "replace", 256))
_reg("cvit_ggca_add3", "other/cvit_GGCA_ADD3.py: GGCA add at 256ch/14²",
     stem_spec=_VGG1, stem2_spec=_VGG2, slot1=("ggca", "add", 256))
_reg("cvit_deconv", "cvit_DEConv.py: DEConv stems + LinearNorm FFN, no GGCA",
     stem_spec=deconv_stem1(), stem2_spec=deconv_stem2(), ffn_norm="linearnorm")
_reg("cvit_ggca_add_deconv", "cvit_GGCA_ADD_DEConv.py: DEConv stems, GGCA mul",
     stem_spec=deconv_stem1(), stem2_spec=deconv_stem2(), use_ggca=True)
_reg("cvit_repbn", "cvit_GGCA_ADD_DEConv_RepBn.py: sparse-DEConv stem, GGCA "
     "add, LinearNorm", stem_spec=repbn_stem1(), stem2_spec=vgg_split()[1],
     slot2=("ggca", "add", 512), ffn_norm="linearnorm")
_reg("cvit_repbn3", "cvit_GGCA_ADD_DEConv_RepBn3.py: GGCA add at 64ch/56²",
     **repbn3_stems(), ffn_norm="linearnorm")
_reg("cvit_repbn4", "cvit_GGCA_ADD_DEConv_RepBn4.py",
     stem_spec=deconv_stem1(tail_deconv=False), stem2_spec=repbn4_stem2(),
     slot2=("ggca", "add", 512), ffn_norm="linearnorm")
_reg("cvit_repbn5", "cvit_GGCA_ADD_DEConv_RepBn5.py (RepBn8 stems, GGCA add)",
     stem_spec=repbn8_stem1(), stem2_spec=repbn8_stem2(),
     slot2=("ggca", "add", 512), ffn_norm="linearnorm")
_reg("cvit_ggca_add_dconv", "cvit_GGCA_ADD_DConv.py: InceptionDW stem, GGCA add",
     stem_spec=idw_stem(), slot1=("ggca", "add", 512))
_reg("cvit_ggca_add_scconv", "other/cvit_GGCA_ADD_ScConv.py",
     stem_spec=scconv_stem1(), stem2_spec=vgg_split()[1],
     slot2=("ggca", "add", 512))
_reg("cvit_ggca_add_wtconv", "other/cvit_GGCA_ADD_WTConv.py",
     stem_spec=wtconv_stem(), slot1=("ggca", "add", 512))
_reg("cvit_ggca_add_odconv", "other/cvit_GGCA_ADD_ODConv.py: ODConv stem ops",
     stem_spec=odconv_stem1(), stem2_spec=vgg_split()[1],
     slot2=("ggca", "add", 512))
_reg("cvit_ggca_odconv", "other/cvit_GGCA_ODConv.py: ODConv block at 256ch",
     stem_spec=_VGG1, stem2_spec=_VGG2, slot1=("odconv", "replace", 256),
     slot2=("ggca", "replace", 512))
_reg("cvit_ggca_add_moga", "other/cvit_GGCA_ADD_MOGA.py: MOGA at 64ch/56²",
     **{"stem_spec": vgg_split(2)[0], "stem2_spec": vgg_split(2)[1]},
     slot1=("moga", "replace", 64), slot2=("ggca", "add", 512))
_reg("cvit_ggca_smfa", "other/cvit_GGCA_SMFA.py: SMFA residual at 256ch",
     stem_spec=_VGG1, stem2_spec=_VGG2, slot1=("smfa", "add", 256),
     slot2=("ggca", "add", 512))
_reg("cvit_ggca_uffc", "other/cvit_GGCA_UFFC.py: Fourier unit at 256ch/14²",
     stem_spec=_VGG1, stem2_spec=_VGG2, slot1=("uffc", "replace", 256),
     slot2=("ggca", "replace", 512))
_reg("cvit_ggca_sla", "other/cvit_GGCA_SLA.py: 28² stems + linear attention "
     "over the embedding axis (16 patches act as features)",
     **sla_stems(), embed_block=("sla", 16))
_reg("cvit_ggca_add_glu", "other/cvit_GGCA_ADD_GLUconv.py: 56² stem + "
     "ConvGLU on 64 tokens", stem_spec=glu_stem(),
     slot1=("ggca", "add", 512), embed_block=("glu", 1024, 8, 8))
_reg("cvit_ggca4_bfm5", "other/cvit_GGCA4_BFM5.py",
     stem_spec=_VGG1, stem2_spec=_VGG2, slot1=("ggca", "replace", 256),
     slot2=("bfm", "replace", 512))
_reg("cvit_ggca4_mdfa5", "other/cvit_GGCA4_MDFA5.py",
     stem_spec=_VGG1, stem2_spec=_VGG2, slot1=("mdfa", "replace", 256),
     slot2=("ggca", "replace", 512))
_reg("cvit_bfm_ggca_mdfa", "other/cvit_BFM_GGCA_MDFA.py: BFM mid, GGCA post, "
     "MDFA on tokens", stem_spec=_VGG1, stem2_spec=_VGG2,
     slot1=("bfm", "replace", 256), slot2=("ggca", "replace", 512),
     token_block=("mdfa", 2))
_reg("cvit_bfm_mdfa", "other/cvit_BFM_MDFA.py",
     stem_spec=_VGG1, stem2_spec=_VGG2, slot1=("bfm", "replace", 256),
     slot2=("mdfa", "replace", 512))
_reg("cvit_ggca_bfm_mdfa", "other/cvit_GGCA_BFM_MDFA.py",
     stem_spec=_VGG1, stem2_spec=_VGG2, slot1=("ggca", "replace", 256),
     slot2=("bfm", "replace", 512), token_block=("mdfa", 2))
_reg("cvit_ggca_mdfa_bfm", "other/cvit_GGCA_MDFA_BFM.py",
     stem_spec=_VGG1, stem2_spec=_VGG2, slot1=("ggca", "replace", 256),
     slot2=("mdfa", "replace", 512), token_block=("bfm", 2))
_reg("cvit_mdfa_bfm", "other/cvit_MDFA_BFM.py",
     stem_spec=_VGG1, stem2_spec=_VGG2, slot1=("mdfa", "replace", 256),
     slot2=("bfm", "replace", 512))
_reg("cvit_mdfa_ggca_bfm", "other/cvit_MDFA_GGCA_BFM.py",
     stem_spec=_VGG1, stem2_spec=_VGG2, slot1=("mdfa", "replace", 256),
     slot2=("ggca", "replace", 512), token_block=("bfm", 2))
