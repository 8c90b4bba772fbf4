"""UFFC — modified Fourier unit (NHWC).

Re-designs `other/cvit_GGCA_UFFC.py:387-482`: rFFT over (H, W) → [real‖imag]
channels + learned location map → 1×1 conv → fftshift(H) → ReLU → dilated
3×3 reflect-pad conv → fftshift(H) → λ-blend with the raw spectrum → irFFT,
then output re-centered to the input mean and clipped to the input range
±0.5. FFTs lower to XLA's native FFT on TPU.

Channel layout note: the torch view produces per-channel interleaved
[c0_re, c0_im, c1_re, ...]; the first/second "halves" the reference
concatenates are therefore just the identity arrangement — we keep the
interleaved layout throughout.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn


class FourierUnitModified(nn.Module):
    channels: int
    image_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        wf = w // 2 + 1
        loc = self.param("locMap", nn.initializers.uniform(1.0),
                         (self.image_size, self.image_size // 2 + 1))
        lam = self.param("lambda_base", nn.initializers.zeros, ())

        f = jnp.fft.rfftn(x.astype(jnp.float32), axes=(1, 2), norm="ortho")
        ff = jnp.stack([f.real, f.imag], axis=-1).reshape(b, h, wf, c * 2)
        ff_copy = ff

        loc_b = jnp.broadcast_to(loc[None, :h, :wf, None], (b, h, wf, 1))
        cat = jnp.concatenate([ff, loc_b], axis=-1)
        ff = nn.Conv(self.channels * 2, (1, 1), use_bias=False,
                     dtype=self.dtype, name="conv_down")(cat)
        ff = jnp.fft.fftshift(ff, axes=1)
        ff = nn.relu(ff)

        loc_shift = jnp.fft.fftshift(loc_b, axes=1)
        cat = jnp.concatenate([ff, loc_shift], axis=-1)
        pad = jnp.pad(cat, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="reflect")
        ff = nn.Conv(self.channels * 2, (3, 3), padding="VALID",
                     kernel_dilation=(2, 2), use_bias=False, dtype=self.dtype,
                     name="conv_down_shift")(pad)
        ff = jnp.fft.fftshift(ff, axes=1)

        lb = nn.sigmoid(lam)
        ff = ff_copy * lb + ff * (1.0 - lb)

        ff = ff.reshape(b, h, wf, c, 2)
        comp = ff[..., 0] + 1j * ff[..., 1]
        out = jnp.fft.irfftn(comp, s=(h, w), axes=(1, 2), norm="ortho")

        out = out - jnp.mean(out) + jnp.mean(x)
        eps = 0.5
        return jnp.clip(out, x.min() - eps, x.max() + eps).astype(x.dtype)
