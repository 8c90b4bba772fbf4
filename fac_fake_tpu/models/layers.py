"""Shared model building blocks (Flax linen, NHWC, TPU-native layouts).

Re-designs the transformer/stem pieces shared by the reference's CViT family
(`/root/reference/CViT-main/model/cvit.py:5-78` and every variant file) as a
single parameterized implementation. All convolutions run NHWC (XLA's
preferred TPU layout); checkpoint ingestion transposes torch OIHW → HWIO.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# torch BatchNorm defaults: eps=1e-5, momentum=0.1 (flax decay = 0.9)
BN_EPS = 1e-5
BN_MOMENTUM = 0.9


class Bf16FastBatchNorm(nn.BatchNorm):
    """flax BatchNorm with a bandwidth-lean bfloat16 path.

    bf16 fast path: stock flax BN promotes the ENTIRE activation to float32
    around the statistics (`flax/linen/normalization.py _compute_stats` /
    `_normalize`), so at (256,224,224,32) every train step materializes
    multi-GB f32 tensors through the normalize and its backward — profiled
    at ~25% of the whole CViT train step. When ``dtype`` is bfloat16 we
    instead keep every full-tensor op in bf16 and pay fp32 only where it
    matters numerically: the mean/E[x²] reductions accumulate in fp32 (the
    convert fuses into the reduce, so HBM reads stay bf16) and the
    per-channel ``w = scale·rsqrt(var+eps)`` / ``b = bias − mean·w`` are
    folded in fp32, making the normalize a single fused bf16 multiply-add
    (torch-AMP semantics). The fp32 path is untouched — golden tests remain
    bit-exact against stock flax. Works for any rank with features last
    (NHWC and NDHWC both reduce over all-but-last), so the S3D family's
    `BN3D` shares it.

    Cross-replica sync (the SyncBatchNorm equivalent,
    `S3D-train-GPUs.py:330`) comes for free from `axis_name`: batch stats
    are `lax.pmean`-ed over the data axis when set.
    """

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 use_running_average: Optional[bool] = None,
                 *, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if self.dtype != jnp.bfloat16 or mask is not None or self.axis != -1:
            return super().__call__(x, use_running_average, mask=mask)

        use_ra = nn.merge_param(
            "use_running_average", self.use_running_average,
            use_running_average)
        feat = x.shape[-1]
        red = tuple(range(x.ndim - 1))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32), (feat,))
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32), (feat,))
        scale = jnp.asarray(self.param(
            "scale", nn.initializers.ones, (feat,), self.param_dtype),
            jnp.float32) if self.use_scale else jnp.ones((feat,), jnp.float32)
        bias = jnp.asarray(self.param(
            "bias", nn.initializers.zeros, (feat,), self.param_dtype),
            jnp.float32) if self.use_bias else jnp.zeros((feat,), jnp.float32)

        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)  # feeds reduces only; convert fuses
            mean = jnp.mean(xf, axis=red)
            mean2 = jnp.mean(jnp.square(xf), axis=red)
            if self.axis_name is not None and not self.is_initializing():
                # one pmean for both stats (flax's concat trick)
                mean, mean2 = jnp.split(jax.lax.pmean(
                    jnp.concatenate([mean, mean2]), self.axis_name), 2)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * var)

        w = scale * jax.lax.rsqrt(var + self.epsilon)
        b = bias - mean * w
        return x * w.astype(jnp.bfloat16) + b.astype(jnp.bfloat16)


class TorchBatchNorm(Bf16FastBatchNorm):
    """BatchNorm with torch-default hyperparameters (eps=1e-5, momentum=0.1
    → flax decay 0.9) and the bf16 fast path."""

    use_running_average: Optional[bool] = None
    momentum: float = BN_MOMENTUM
    epsilon: float = BN_EPS


def conv3x3(features: int, dtype: Dtype = jnp.float32, name: Optional[str] = None,
            use_bias: bool = True) -> nn.Conv:
    return nn.Conv(features, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                   use_bias=use_bias, dtype=dtype, name=name)


class QuantConv3x3(nn.Module):
    """Post-training-quantized 3×3 conv (inference only).

    int8 symmetric weights (per-output-channel scale) × int8 symmetric
    activations (per-tensor scale, calibrated offline by
    `compat/quantize.py`), int32 accumulation on the MXU — the v5e MXU runs
    int8 at 2× its bf16 rate, which matters most for the early stem convs
    whose ≤64-channel contractions can only quarter-fill the systolic array
    in bf16. Dequant + bias fold into one scale-add epilogue. Params are
    produced by the quantizer, never trained; `param_dtype` tricks are
    avoided by declaring the int8 kernel explicitly.
    """
    features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        kernel_q = self.param(
            "kernel_q", lambda k, s: jnp.zeros(s, jnp.int8),
            (3, 3, cin, self.features))
        w_scale = self.param("w_scale", nn.initializers.ones,
                             (self.features,), jnp.float32)
        x_scale = self.param("x_scale", nn.initializers.ones, (), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / x_scale),
                      -127, 127).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            xq, kernel_q, window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        out = y.astype(jnp.float32) * (x_scale * w_scale) + bias
        return out.astype(self.dtype)


class QuantDense(nn.Module):
    """Post-training-quantized Dense (inference only).

    int8 symmetric weights (per-output-channel scale) × int8 symmetric
    activations (per-tensor scale, calibrated offline by
    `compat/quantize.py`), int32 accumulation on the MXU. This is where
    int8's 2× MXU rate actually buys throughput: the CViT's FLOPs
    concentrate in the 25088→1024 patch embedding and the dim-1024/2048
    transformer matmuls (`model/cvit.py:167-179` is the reference forward
    this serves), all large, dense, and MXU-shaped at serving batch sizes.
    Dequant (`· s_x·s_w[o] + b`) fuses into the matmul epilogue.
    """
    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        kernel_q = self.param(
            "kernel_q", lambda k, s: jnp.zeros(s, jnp.int8),
            (cin, self.features))
        w_scale = self.param("w_scale", nn.initializers.ones,
                             (self.features,), jnp.float32)
        x_scale = self.param("x_scale", nn.initializers.ones, (), jnp.float32)
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / x_scale),
                      -127, 127).astype(jnp.int8)
        y = jax.lax.dot_general(
            xq, kernel_q, (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        out = y.astype(jnp.float32) * (x_scale * w_scale)
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros,
                                   (self.features,), jnp.float32)
        return out.astype(self.dtype)


def dense(features: int, *, quant: bool, use_bias: bool = True,
          dtype: Dtype, name: str):
    """nn.Dense, or its PTQ int8 twin under the SAME name — the quantizer
    (`compat/quantize.py`) rewrites the kernel leaf in place, so parameter
    tree paths stay identical either way."""
    if quant:
        return QuantDense(features, use_bias=use_bias, dtype=dtype, name=name)
    return nn.Dense(features, use_bias=use_bias, dtype=dtype, name=name)


class MultiHeadSelfAttention(nn.Module):
    """Reference CViT attention (`model/cvit.py:34-62`), vectorized.

    Quirk preserved: the softmax scale is ``dim ** -0.5`` on the *model*
    dimension, not the per-head dimension (`model/cvit.py:38`).
    """
    dim: int
    heads: int = 8
    quant: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        b, n, d = x.shape
        h = self.heads
        head_dim = self.dim // h
        scale = self.dim ** -0.5

        # PTQ calibration taps (`compat/quantize.py`): no-ops unless the
        # caller captures 'intermediates'
        self.sow("intermediates", "qkv_in", x)
        qkv = dense(self.dim * 3, quant=self.quant, use_bias=False,
                    dtype=self.dtype, name="to_qkv")(x)
        # layout (b, n, 3, h, head_dim) matches torch's '(qkv h d)' packing
        qkv = qkv.reshape(b, n, 3, h, head_dim)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))  # (b,h,n,hd)

        dots = jnp.einsum("bhid,bhjd->bhij", q, k,
                          preferred_element_type=jnp.float32) * scale
        if mask is not None:
            # reference pads a True for the cls token then outer-products
            pad = jnp.ones((b, 1), dtype=bool)
            m = jnp.concatenate([pad, mask.reshape(b, -1)], axis=1)
            m2 = m[:, None, :] & m[:, :, None]
            dots = jnp.where(m2[:, None, :, :], dots, jnp.finfo(dots.dtype).min)
        attn = jax.nn.softmax(dots, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, self.dim)
        self.sow("intermediates", "out_in", out)
        return dense(self.dim, quant=self.quant, dtype=self.dtype,
                     name="to_out")(out)


class FeedForward(nn.Module):
    """dim → hidden (GELU) → dim (`model/cvit.py:22-32`)."""
    dim: int
    hidden_dim: int
    quant: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        self.sow("intermediates", "fc1_in", x)
        x = dense(self.hidden_dim, quant=self.quant, dtype=self.dtype,
                  name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        self.sow("intermediates", "fc2_in", x)
        return dense(self.dim, quant=self.quant, dtype=self.dtype,
                     name="fc2")(x)


class RepBN(nn.Module):
    """Re-parameterizable BatchNorm over the token sequence:
    ``BN1d(x^T)^T + alpha * x`` (`cvit_GGCA_ADD_DEConv_RepBn8.py:9-19`).

    The BatchNorm treats the model dim as channels, normalizing each channel
    over (batch, tokens).
    """
    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        alpha = self.param("alpha", nn.initializers.ones, (1,), jnp.float32)
        bn = TorchBatchNorm(use_running_average=not train, dtype=self.dtype, name="bn")
        return bn(x) + alpha * x


class LinearNorm(nn.Module):
    """Schedule-blended LayerNorm→RepBN (`cvit_GGCA_ADD_DEConv_RepBn8.py:22-46`).

    Buffers ``warm``/``iter`` live in the ``schedule`` collection and tick
    down once per *training* forward, matching the reference's in-place buffer
    mutation. Eval path is pure LayerNorm.
    """
    dim: int
    warm: int = 0
    step: int = 300000
    r0: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        # LayerNorm eps matches the reference's partial(nn.LayerNorm, eps=1e-6)
        ln = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")
        if not train:
            # eval path never touches norm2 or the counters, so
            # inference-only variable sets (no 'schedule' collection) work
            return ln(x)
        repbn = RepBN(self.dim, dtype=self.dtype, name="norm2")
        warm = self.variable("schedule", "warm",
                             lambda: jnp.asarray(self.warm, jnp.int32))
        it = self.variable("schedule", "iter",
                           lambda: jnp.asarray(self.step, jnp.int32))

        in_warmup = warm.value > 0
        lamda = (self.r0 * it.value.astype(jnp.float32) / float(self.step))
        x1 = ln(x)
        x2 = repbn(x, train=True)
        blended = lamda * x1 + (1.0 - lamda) * x2
        out = jnp.where(in_warmup, x1, blended)
        if not self.is_initializing():
            warm.value = jnp.where(in_warmup, warm.value - 1, warm.value)
            it.value = jnp.where(jnp.logical_and(~in_warmup, it.value > 0),
                                 it.value - 1, it.value)
        return out


class TransformerEncoder(nn.Module):
    """depth × (PreNorm-Attention + PreNorm-FFN) with residuals
    (`model/cvit.py:64-78`). ``ffn_norm`` selects 'ln' (base) or 'linearnorm'
    (RepBN variants, `cvit_GGCA_ADD_DEConv_RepBn8.py:126-134` — attention keeps
    plain LN, only the FFN pre-norm is re-parameterized)."""
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    ffn_norm: str = "ln"
    quant: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                 train: bool = False) -> jnp.ndarray:
        for i in range(self.depth):
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"attn_norm{i}")(x)
            x = x + MultiHeadSelfAttention(self.dim, self.heads, quant=self.quant,
                                           dtype=self.dtype,
                                           name=f"attn{i}")(h, mask)
            if self.ffn_norm == "linearnorm":
                h = LinearNorm(self.dim, dtype=self.dtype, name=f"ffn_norm{i}")(x, train)
            else:
                h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"ffn_norm{i}")(x)
            x = x + FeedForward(self.dim, self.mlp_dim, quant=self.quant,
                                dtype=self.dtype, name=f"ffn{i}")(h)
        return x


class MLPHead(nn.Module):
    """dim → mlp_dim (ReLU) → num_classes (`model/cvit.py:161-165`).

    Under PTQ only fc1 (dim→mlp_dim, the big matmul) quantizes; fc2's
    2-logit output stays fp for final-score precision."""
    mlp_dim: int
    num_classes: int
    quant: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        self.sow("intermediates", "fc1_in", x)
        x = dense(self.mlp_dim, quant=self.quant, dtype=self.dtype,
                  name="fc1")(x)
        x = nn.relu(x)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc2")(x)
