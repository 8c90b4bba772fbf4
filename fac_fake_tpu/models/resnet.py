"""ResNet stems + the ResKan / ResVitKan model family.

Re-designs the two vendored ResNet copies:
  * `ResKan/kan_resnet.py` — torchvision-style v1.5 ResNet (stride on the
    Bottleneck 3×3) with a KAN head `KAN([512·exp, 64, classes])`
    (`kan_resnet.py:132-256`);
  * `ResVitKan/ResVitKan.py:115-280` / `model/other/resvit.py` — vendored
    ResNet whose Bottleneck has an extra ReLU *before* the residual add
    (`ResVitKan.py:170-182`, quirk kept behind `relu_before_add`) and a
    2048→512 1×1 squeeze + BN tail for feeding the ViT (`:199,237-239`);
  * `ResVitKan/ResVitKan.py:284-330` — CViT skeleton with resnet50 features
    and a Linear→Dropout→ReLU→KAN head.

All NHWC. One ResNet module, flags select the variant.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from fac_fake_tpu.core.registry import register
from fac_fake_tpu.models.blocks.kan import KAN
from fac_fake_tpu.models.layers import TorchBatchNorm, TransformerEncoder

LAYER_PLANS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3),
               101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda n: TorchBatchNorm(use_running_average=not train,
                                      dtype=self.dtype, name=n)
        res = x
        y = nn.Conv(self.planes, (3, 3), (self.stride, self.stride),
                    ((1, 1), (1, 1)), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.relu(bn("bn1")(y))
        y = nn.Conv(self.planes, (3, 3), (1, 1), ((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = bn("bn2")(y)
        if self.downsample:
            res = nn.Conv(self.planes, (1, 1), (self.stride, self.stride),
                          use_bias=False, dtype=self.dtype, name="ds_conv")(x)
            res = bn("ds_bn")(res)
        return nn.relu(y + res)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    relu_before_add: bool = False  # ResVitKan quirk
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda n: TorchBatchNorm(use_running_average=not train,
                                      dtype=self.dtype, name=n)
        out_ch = self.planes * 4
        res = x
        y = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.relu(bn("bn1")(y))
        y = nn.Conv(self.planes, (3, 3), (self.stride, self.stride),
                    ((1, 1), (1, 1)), use_bias=False, dtype=self.dtype,
                    name="conv2")(y)
        y = nn.relu(bn("bn2")(y))
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = bn("bn3")(y)
        if self.relu_before_add:
            y = nn.relu(y)
        if self.downsample:
            res = nn.Conv(out_ch, (1, 1), (self.stride, self.stride),
                          use_bias=False, dtype=self.dtype, name="ds_conv")(x)
            res = bn("ds_bn")(res)
        return nn.relu(y + res)


class ResNet(nn.Module):
    depth: int = 34
    relu_before_add: bool = False
    squeeze_512: bool = False       # 2048→512 1×1 + BN tail (ResVitKan)
    dtype: Any = jnp.float32

    @property
    def bottleneck(self) -> bool:
        return self.depth >= 50

    @nn.compact
    def __call__(self, x, train: bool = False):
        """Returns the final feature map NHWC (pooling/heads live in the
        consuming model)."""
        x = nn.Conv(64, (7, 7), (2, 2), ((3, 3), (3, 3)), use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = TorchBatchNorm(use_running_average=not train, dtype=self.dtype,
                           name="bn1")(x)
        x = nn.relu(x)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))

        exp = 4 if self.bottleneck else 1
        in_ch = 64
        for li, (planes, blocks) in enumerate(zip((64, 128, 256, 512),
                                                  LAYER_PLANS[self.depth])):
            stride = 1 if li == 0 else 2
            for bi in range(blocks):
                s = stride if bi == 0 else 1
                need_ds = bi == 0 and (s != 1 or in_ch != planes * exp)
                cls = Bottleneck if self.bottleneck else BasicBlock
                kw = dict(planes=planes, stride=s, downsample=need_ds,
                          dtype=self.dtype, name=f"layer{li + 1}_{bi}")
                if self.bottleneck:
                    kw["relu_before_add"] = self.relu_before_add
                x = cls(**kw)(x, train)
                in_ch = planes * exp

        if self.squeeze_512:
            x = nn.Conv(512, (1, 1), use_bias=False, dtype=self.dtype,
                        name="channel")(x)
            x = TorchBatchNorm(use_running_average=not train,
                               dtype=self.dtype, name="bn2")(x)
        return x


class ResKan(nn.Module):
    """ResNet + global-avg-pool + KAN head (`kan_resnet.py:132-256`)."""
    depth: int = 34
    num_classes: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = ResNet(self.depth, dtype=self.dtype, name="resnet")(x, train)
        pooled = jnp.mean(feats, axis=(1, 2))
        exp = 4 if self.depth >= 50 else 1
        return KAN((512 * exp, 64, self.num_classes), dtype=self.dtype,
                   name="kan")(pooled).astype(jnp.float32)


class ResVitKan(nn.Module):
    """ResNet stem → CViT transformer → head.

    head='kan': Linear+Dropout+ReLU+KAN (`ResVitKan/ResVitKan.py:284-330`).
    head='mlp': Linear+Dropout+ReLU+Linear — the plain `resvit` variant
    (`model/other/resvit.py:284-322`, resnet18 stem, no channel squeeze).
    Keeps the 32-row batch-indexed pos-embedding quirk (`:294`)."""
    patch_size: int = 7
    num_classes: int = 2
    dim: int = 1024
    depth: int = 6
    heads: int = 8
    mlp_dim: int = 2048
    pos_mode: str = "legacy"
    resnet_depth: int = 50
    head: str = "kan"              # kan | mlp
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img, train: bool = False, mask=None, pos_indices=None):
        from fac_fake_tpu.models.cvit import LEGACY_POS_ROWS, patchify

        x = ResNet(self.resnet_depth, relu_before_add=self.resnet_depth >= 50,
                   squeeze_512=self.resnet_depth >= 50,
                   dtype=self.dtype, name="features")(img, train)
        y = patchify(x, self.patch_size)
        y = nn.Dense(self.dim, dtype=self.dtype, name="patch_to_embedding")(y)
        b, n = y.shape[0], y.shape[1]
        cls = self.param("cls_token", nn.initializers.normal(1.0),
                         (1, 1, self.dim))
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(y.dtype), (b, 1, self.dim)), y], axis=1)
        if self.pos_mode == "legacy":
            pos = self.param("pos_embedding", nn.initializers.normal(1.0),
                             (LEGACY_POS_ROWS, 1, self.dim))
            pe = pos[:b] if pos_indices is None else pos[pos_indices]
            tokens = tokens + pe.astype(tokens.dtype)
        else:
            pos = self.param("pos_embedding", nn.initializers.normal(0.02),
                             (1, n + 1, self.dim))
            tokens = tokens + pos.astype(tokens.dtype)
        tokens = TransformerEncoder(self.dim, self.depth, self.heads,
                                    self.mlp_dim, dtype=self.dtype,
                                    name="transformer")(tokens, mask, train)
        h = tokens[:, 0]
        h = nn.Dense(self.mlp_dim, dtype=self.dtype, name="head_fc")(h)
        h = nn.Dropout(0.5, deterministic=not train)(h)
        h = nn.relu(h)
        if self.head == "kan":
            out = KAN((self.mlp_dim, 64, self.num_classes), dtype=self.dtype,
                      name="head_kan")(h)
        else:
            out = nn.Dense(self.num_classes, dtype=self.dtype, name="head_out")(h)
        return out.astype(jnp.float32)


def _dt(cfg):
    return jnp.bfloat16 if getattr(cfg, "dtype", "float32") == "bfloat16" \
        else jnp.float32


@register("model", "reskan")
def build_reskan(cfg):
    return ResKan(depth=34, num_classes=cfg.num_classes, dtype=_dt(cfg))


@register("model", "resvitkan")
def build_resvitkan(cfg):
    return ResVitKan(patch_size=cfg.patch_size, num_classes=cfg.num_classes,
                     dim=cfg.dim, depth=cfg.depth, heads=cfg.heads,
                     mlp_dim=cfg.mlp_dim, pos_mode=cfg.pos_embedding_mode,
                     dtype=_dt(cfg))


@register("model", "resvit")
def build_resvit(cfg):
    """`model/other/resvit.py`: resnet18 stem + ViT + Dropout-MLP head."""
    return ResVitKan(patch_size=cfg.patch_size, num_classes=cfg.num_classes,
                     dim=cfg.dim, depth=cfg.depth, heads=cfg.heads,
                     mlp_dim=cfg.mlp_dim, pos_mode=cfg.pos_embedding_mode,
                     resnet_depth=18, head="mlp", dtype=_dt(cfg))
