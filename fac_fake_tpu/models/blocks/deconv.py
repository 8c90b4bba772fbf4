"""DEConv: detail-enhanced convolution, composed in weight space.

Re-designs `cvit_GGCA_ADD_DEConv_RepBn8.py:214-340`: five difference-operator
branches (center-diff, angular-diff, horizontal-diff, vertical-diff, vanilla)
whose 3×3 kernels are *summed into one weight tensor* and applied as a single
convolution — exactly the reference's re-parameterization, but as pure
functional weight composition (trivially jittable, XLA folds it at inference;
no `torch.cuda.FloatTensor` CPU-incompatibility, SURVEY.md §8.9).

Weight layout is HWIO (NHWC conv). Spatial positions flatten row-major:
idx = 3*row + col.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn
from jax import lax

# angular-diff permutation of the 9 kernel taps (`Conv2d_ad.get_weight`,
# cvit_GGCA_ADD_DEConv_RepBn8.py:246)
_AD_PERM = (3, 0, 1, 6, 4, 2, 7, 8, 5)


def _kernel_init(key, shape, dtype=jnp.float32):
    # torch Conv2d default: kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), ..)
    fan_in = shape[0] * shape[1] * shape[2] if len(shape) == 4 else shape[0]
    bound = 1.0 / jnp.sqrt(fan_in)
    import jax
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class DEConv(nn.Module):
    """y = conv(x, w_cd + w_hd + w_vd + w_ad + w_std, b_sum), stride 1 pad 1."""
    dim: int
    theta: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = self.dim
        k33 = (3, 3, d, d)
        w_cd = self.param("w_cd", _kernel_init, k33)
        b_cd = self.param("b_cd", nn.initializers.zeros, (d,))
        w_hd = self.param("w_hd", _kernel_init, (3, d, d))  # 1D taps
        b_hd = self.param("b_hd", nn.initializers.zeros, (d,))
        w_vd = self.param("w_vd", _kernel_init, (3, d, d))
        b_vd = self.param("b_vd", nn.initializers.zeros, (d,))
        w_ad = self.param("w_ad", _kernel_init, k33)
        b_ad = self.param("b_ad", nn.initializers.zeros, (d,))
        w_std = self.param("w_std", _kernel_init, k33)
        b_std = self.param("b_std", nn.initializers.zeros, (d,))

        w = compose_deconv_weight(w_cd, w_hd, w_vd, w_ad, w_std, self.theta)
        b = b_cd + b_hd + b_vd + b_ad + b_std

        y = lax.conv_general_dilated(
            x.astype(self.dtype), w.astype(self.dtype),
            window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + b.astype(self.dtype)


def compose_deconv_weight(w_cd, w_hd, w_vd, w_ad, w_std, theta: float = 1.0):
    """Sum the five difference-operator kernels into one HWIO 3×3 weight."""
    w_cd, w_hd, w_vd, w_ad, w_std = map(jnp.asarray, (w_cd, w_hd, w_vd, w_ad, w_std))
    d_in, d_out = w_cd.shape[2], w_cd.shape[3]

    flat = lambda w: w.reshape(9, d_in, d_out)
    # center-difference: identity except center tap subtracts the full sum
    cd9 = flat(w_cd)
    cd9 = cd9.at[4].set(cd9[4] - cd9.sum(axis=0))
    # angular-difference: w - theta * w[perm]
    ad9 = flat(w_ad)
    ad9 = ad9 - theta * ad9[jnp.array(_AD_PERM)]
    # horizontal-difference: left column +w, right column -w
    hd9 = jnp.zeros((9, d_in, d_out), w_hd.dtype)
    hd9 = hd9.at[jnp.array([0, 3, 6])].set(w_hd)
    hd9 = hd9.at[jnp.array([2, 5, 8])].set(-w_hd)
    # vertical-difference: top row +w, bottom row -w
    vd9 = jnp.zeros((9, d_in, d_out), w_vd.dtype)
    vd9 = vd9.at[jnp.array([0, 1, 2])].set(w_vd)
    vd9 = vd9.at[jnp.array([6, 7, 8])].set(-w_vd)

    w9 = cd9 + ad9 + hd9 + vd9 + flat(w_std)
    return w9.reshape(3, 3, d_in, d_out)
