"""On-device (jitted) image augmentation.

Replaces the reference's CPU albumentations pipelines — `strong_aug`
(`CViT-main/helpers/augmentation.py:9-26`: rot90/transpose/flips/GaussNoise/
ShiftScaleRotate/Sharpen/Emboss/BrightnessContrast/HSV) plus the loader's
ColorJitter/flip/±17° rotation (`helpers/loader.py:17-29`) and the S3D train
transform (`S3D/deepfakes_dataset.py:32-48`) — with a vmapped, jittable
pipeline that runs on the TPU *inside the train step*: augmentation rides the
MXU/VPU instead of stalling host workers, and batches stay uint8 on the wire.

Known approximations (randomized training augs, not bit-parity surfaces):
CLAHE is omitted; ImageCompression (S3D) is host-side via cv2 when enabled.

All ops take/return float32 images in [0,1], HWC.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from fac_fake_tpu.core.config import AugmentConfig


# --- geometry ---------------------------------------------------------------
#
# TPU note: per-pixel gather warps (map_coordinates) are ~10× the cost of the
# whole model step on TPU. Rotation decomposes into three shears
# (Sx(-tan θ/2) · Sy(sin θ) · Sx(-tan θ/2)), and a shear with a row-dependent
# shift is a stack of small 1-D interpolation matrices — so the entire affine
# (rotate+scale+shift) becomes a handful of batched matmuls that ride the
# MXU. The geometry params are sampled once per *batch* (per-image coin flips
# still decide who gets warped), which is the price of sharing the matrices.


def _shift_matrix(n: int, shifts: jnp.ndarray) -> jnp.ndarray:
    """(rows, n, n) bilinear 1-D translation matrices: out[v] = in[v + t_r],
    zero fill outside (the reference warp's constant padding)."""
    v = jnp.arange(n, dtype=jnp.float32)[None, :, None]       # out index
    w = jnp.arange(n, dtype=jnp.float32)[None, None, :]       # in index
    src = v + shifts[:, None, None]                           # (rows, n, 1)
    d = 1.0 - jnp.abs(w - src)
    return jnp.clip(d, 0.0, 1.0)


def _scale_matrix(n: int, scale: jnp.ndarray) -> jnp.ndarray:
    """(n, n) bilinear center-anchored 1-axis zoom by 1/scale."""
    c = (n - 1) / 2.0
    v = jnp.arange(n, dtype=jnp.float32)[:, None]
    w = jnp.arange(n, dtype=jnp.float32)[None, :]
    src = (v - c) / scale + c
    d = 1.0 - jnp.abs(w - src)
    return jnp.clip(d, 0.0, 1.0)


def batch_affine_matmul(imgs: jnp.ndarray, angle: jnp.ndarray,
                        scale: jnp.ndarray, tx: jnp.ndarray,
                        ty: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) affine warp with shared per-batch params, as matmuls."""
    b, h, w, c = imgs.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    a = -jnp.tan(angle / 2.0)
    s = jnp.sin(angle)

    rows = jnp.arange(h, dtype=jnp.float32) - cy
    cols = jnp.arange(w, dtype=jnp.float32) - cx
    # shear-x: row-dependent x-shift a·(y−cy) (+ tx folded into first pass)
    sx1 = _shift_matrix(w, a * rows - tx)                 # (h, w, w)
    sy = _shift_matrix(h, s * cols - ty)                  # (w, h, h)
    sx2 = _shift_matrix(w, a * rows)                      # (h, w, w)
    zy = _scale_matrix(h, scale)
    zx = _scale_matrix(w, scale)

    x = imgs
    x = jnp.einsum("hvw,bhwc->bhvc", sx1, x)              # shear x
    x = jnp.einsum("wvh,bhwc->bvwc", sy, x)               # shear y
    x = jnp.einsum("hvw,bhwc->bhvc", sx2, x)              # shear x
    x = jnp.einsum("vh,bhwc->bvwc", zy, x)                # zoom y
    x = jnp.einsum("uw,bhwc->bhuc", zx, x)                # zoom x
    return x


# --- color ------------------------------------------------------------------

def _rgb_to_hsv_vec(img):
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    d = mx - mn + 1e-12
    h = jnp.where(mx == r, (g - b) / d % 6.0,
                  jnp.where(mx == g, (b - r) / d + 2.0, (r - g) / d + 4.0)) / 6.0
    s = d / (mx + 1e-12)
    return jnp.stack([h, s, mx], axis=-1)


def _hsv_to_rgb_vec(hsv):
    h, s, v = hsv[..., 0] % 1.0, hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1 - s)
    q = v * (1 - f * s)
    t = v * (1 - (1 - f) * s)
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def _conv3x3(img, kernel):
    k = jnp.asarray(kernel, jnp.float32)[:, :, None, None]
    k = jnp.tile(k, (1, 1, 1, img.shape[-1]))
    out = jax.lax.conv_general_dilated(
        img[None], k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=img.shape[-1])
    return out[0]


# --- the pipeline -------------------------------------------------------------

def augment_image(key: jax.Array, img: jnp.ndarray, cfg: AugmentConfig) -> jnp.ndarray:
    """Apply the configured augmentations to one image with per-op coin flips
    (albumentations-style outer p plus per-op p≈0.5 group behavior)."""
    # one key per random draw: parameters and their apply-coins must be
    # independent, otherwise conditioning on the coin silently truncates the
    # parameter distribution (e.g. a shared key makes brightness==contrast
    # and the coin<p region maps to the lower half of the range)
    keys = jax.random.split(key, 21)
    p = cfg.prob

    def coin(k):
        return jax.random.uniform(k) < p

    if cfg.rot90:
        k4 = jax.random.randint(keys[0], (), 0, 4)
        img = jnp.where(coin(keys[1])[None, None, None],
                        jax.lax.switch(k4, [lambda x: x,
                                            lambda x: jnp.rot90(x, 1),
                                            lambda x: jnp.rot90(x, 2),
                                            lambda x: jnp.rot90(x, 3)], img),
                        img)
    if cfg.transpose:
        img = jnp.where(coin(keys[2])[None, None, None],
                        jnp.swapaxes(img, 0, 1), img)
    if cfg.hflip:
        img = jnp.where(coin(keys[3])[None, None, None], img[:, ::-1], img)
    if cfg.vflip:
        img = jnp.where(coin(keys[4])[None, None, None], img[::-1], img)
    if cfg.gauss_noise:
        sigma = jax.random.uniform(keys[5], (), minval=0.01, maxval=0.05)
        noise = sigma * jax.random.normal(keys[6], img.shape)
        img = jnp.where(coin(keys[7])[None, None, None],
                        jnp.clip(img + noise, 0, 1), img)
    if cfg.sharpen:
        # albumentations Sharpen: blend with a laplacian-sharpened image
        alpha = jax.random.uniform(keys[8], (), minval=0.2, maxval=0.5)
        lightness = jax.random.uniform(keys[13], (), minval=0.5, maxval=1.0)
        k = jnp.array([[-1, -1, -1], [-1, 8 + lightness, -1], [-1, -1, -1]],
                      jnp.float32) * alpha + \
            jnp.array([[0, 0, 0], [0, 1 - alpha, 0], [0, 0, 0]], jnp.float32) \
            * jnp.float32(1.0)
        sharpened = jnp.clip(_conv3x3(img, k), 0, 1)
        img = jnp.where(coin(keys[12])[None, None, None], sharpened, img)
    if cfg.emboss:
        alpha = jax.random.uniform(keys[14], (), minval=0.2, maxval=0.5)
        strength = jax.random.uniform(keys[15], (), minval=0.2, maxval=0.7)
        emb = jnp.array([[-1 - strength, 0, 0], [0, 1, 0], [0, 0, 1 + strength]],
                        jnp.float32)
        embossed = jnp.clip(_conv3x3(img, emb) * alpha + img * (1 - alpha), 0, 1)
        img = jnp.where(coin(keys[16])[None, None, None], embossed, img)
    if cfg.brightness_contrast:
        a = jax.random.uniform(keys[9], (), minval=-0.2, maxval=0.2)
        b = jax.random.uniform(keys[17], (), minval=-0.2, maxval=0.2)
        img = jnp.where(coin(keys[18])[None, None, None],
                        jnp.clip((img - 0.5) * (1 + a) + 0.5 + b, 0, 1), img)
    if cfg.hue_saturation or cfg.color_jitter:
        hsv = _rgb_to_hsv_vec(img)
        dh = jax.random.uniform(keys[10], (), minval=-0.05, maxval=0.05)
        ds = jax.random.uniform(keys[19], (), minval=-0.15, maxval=0.15)
        dv = jax.random.uniform(keys[20], (), minval=-0.15, maxval=0.15)
        shifted = _hsv_to_rgb_vec(jnp.stack(
            [hsv[..., 0] + dh, jnp.clip(hsv[..., 1] + ds, 0, 1),
             jnp.clip(hsv[..., 2] + dv, 0, 1)], axis=-1))
        img = jnp.where(coin(keys[11])[None, None, None],
                        jnp.clip(shifted, 0, 1), img)
    if cfg.to_gray:
        gray = (0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2])
        img = jnp.broadcast_to(gray[..., None], img.shape)
    return img


def augment_batch(key: jax.Array, batch_u8: jnp.ndarray,
                  cfg: AugmentConfig) -> jnp.ndarray:
    """uint8 (B,H,W,3) or clips (B,T,H,W,3) → float32 [0,1] augmented batch;
    one key per image (clips: per frame, like the reference's per-frame
    albumentations calls in `deepfakes_dataset.py`)."""
    imgs = batch_u8.astype(jnp.float32) / 255.0
    if not cfg.enabled:
        return imgs
    shape = imgs.shape
    flat = imgs.reshape(-1, *shape[-3:])
    n = flat.shape[0]
    key, gk = jax.random.split(key)
    keys = jax.random.split(key, n)
    out = jax.vmap(lambda k, im: augment_image(k, im, cfg))(keys, flat)

    if cfg.rotation_deg > 0:
        # affine (rotate/scale/shift) with per-batch params as MXU matmuls;
        # per-image coin decides who gets warped (see geometry note above)
        k1, k2, k3, k4 = jax.random.split(gk, 4)
        ang = jax.random.uniform(k1, (), minval=-1.0, maxval=1.0) \
            * cfg.rotation_deg * jnp.pi / 180.0
        scale = jax.random.uniform(k2, (), minval=0.9, maxval=1.1)
        shift = jax.random.uniform(k3, (2,), minval=-0.0625, maxval=0.0625) \
            * shape[-3]
        warped = jnp.clip(batch_affine_matmul(out, ang, scale,
                                              shift[0], shift[1]), 0, 1)
        apply = jax.random.uniform(k4, (n,)) < cfg.prob
        out = jnp.where(apply[:, None, None, None], warped, out)
    return out.reshape(shape)
