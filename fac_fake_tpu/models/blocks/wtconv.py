"""WTConv2d — wavelet-domain depthwise convolution (NHWC).

Re-designs `other/cvit_GGCA_ADD_WTConv.py:167-329`: per-level Haar (db1)
decomposition (stride-2 depthwise conv with the 4 outer-product filters),
a depthwise 5×5 conv + learned scale on the 4 subbands, recursive low-band
descent, then inverse transform accumulation; plus a base depthwise conv
path with its own scale. The variant uses wt_levels=1 and 'db1' only, so the
Haar filters are hardcoded (pywt not required — it isn't in this image).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

_S = 1.0 / np.sqrt(2.0)
# pywt db1: dec_lo = [s, s], dec_hi = [-s, s]; the reference reverses dec_*
# ([::-1]) and flips rec_* — net effect for Haar below.
_DEC_LO = np.array([_S, _S], np.float32)
_DEC_HI = np.array([_S, -_S], np.float32)
_REC_LO = np.array([_S, _S], np.float32)
_REC_HI = np.array([_S, -_S], np.float32)


def _wavelet_filters():
    """(4, 2, 2) dec and rec filter stacks: LL, LH, HL, HH (torch order:
    lo⊗lo, lo(h)·hi(w)... matching `create_wavelet_filter`)."""
    dec = np.stack([
        np.outer(_DEC_LO, _DEC_LO), np.outer(_DEC_HI, _DEC_LO),
        np.outer(_DEC_LO, _DEC_HI), np.outer(_DEC_HI, _DEC_HI)])
    rec = np.stack([
        np.outer(_REC_LO, _REC_LO), np.outer(_REC_HI, _REC_LO),
        np.outer(_REC_LO, _REC_HI), np.outer(_REC_HI, _REC_HI)])
    return dec.astype(np.float32), rec.astype(np.float32)


def wavelet_transform(x: jnp.ndarray) -> jnp.ndarray:
    """(B,H,W,C) → (B,H/2,W/2,C,4) Haar subbands (grouped stride-2 conv).
    With feature_group_count=C, output channel j = group j//4 with band
    filter j%4 — matching the torch layout reshape (b,c,4,h',w')."""
    dec, _ = _wavelet_filters()
    c = x.shape[-1]
    k = jnp.asarray(dec.transpose(1, 2, 0))[:, :, None, :]      # (2,2,1,4)
    k = jnp.tile(k, (1, 1, 1, c))                               # out j ↔ band j%4
    y = jax.lax.conv_general_dilated(
        x, k, (2, 2), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    b, h2, w2, _ = y.shape
    return y.reshape(b, h2, w2, c, 4)


def inverse_wavelet_transform(y: jnp.ndarray) -> jnp.ndarray:
    """(B,H/2,W/2,C,4) → (B,H,W,C): grouped transposed conv, realized as a
    zero-dilated regular conv with the spatially flipped kernel."""
    _, rec = _wavelet_filters()
    b, h2, w2, c, _ = y.shape
    x = y.reshape(b, h2, w2, c * 4)
    # kernel (2,2,4,c): group g maps input channels [4g,4g+4) → out channel g
    k = jnp.asarray(rec.transpose(1, 2, 0))                     # (2,2,4)
    k = k[::-1, ::-1]                                           # spatial flip
    k = jnp.tile(k[:, :, :, None], (1, 1, 1, c))                # (2,2,4,c)
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


class _Scale(nn.Module):
    channels: int
    init_scale: float = 1.0

    @nn.compact
    def __call__(self, x):
        w = self.param("weight",
                       lambda k, s: jnp.full(s, self.init_scale, jnp.float32),
                       (self.channels,))
        return x * w


class WTConv2d(nn.Module):
    channels: int
    kernel_size: int = 5
    wt_levels: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.kernel_size // 2
        base = nn.Conv(self.channels, (self.kernel_size,) * 2,
                       padding=((p, p), (p, p)), feature_group_count=self.channels,
                       use_bias=True, dtype=self.dtype, name="base_conv")(x)
        base = _Scale(self.channels, 1.0, name="base_scale")(base)

        lls, highs, shapes = [], [], []
        cur = x
        for i in range(self.wt_levels):
            shapes.append(cur.shape)
            if cur.shape[1] % 2 or cur.shape[2] % 2:
                cur = jnp.pad(cur, ((0, 0), (0, cur.shape[1] % 2),
                                    (0, cur.shape[2] % 2), (0, 0)))
            sub = wavelet_transform(cur)                     # (B,h,w,C,4)
            cur = sub[..., 0]
            b, h2, w2, c, _ = sub.shape
            flat = sub.reshape(b, h2, w2, c * 4)
            flat = nn.Conv(c * 4, (self.kernel_size,) * 2,
                           padding=((p, p), (p, p)), feature_group_count=c * 4,
                           use_bias=False, dtype=self.dtype,
                           name=f"wavelet_conv{i}")(flat)
            flat = _Scale(c * 4, 0.1, name=f"wavelet_scale{i}")(flat)
            sub = flat.reshape(b, h2, w2, c, 4)
            lls.append(sub[..., 0])
            highs.append(sub[..., 1:])

        next_ll = 0.0
        for i in range(self.wt_levels - 1, -1, -1):
            ll = lls.pop() + next_ll
            sub = jnp.concatenate([ll[..., None], highs.pop()], axis=-1)
            next_ll = inverse_wavelet_transform(sub)
            sh = shapes.pop()
            next_ll = next_ll[:, :sh[1], :sh[2]]

        return base + next_ll
