"""Bilinear crop-resize as matmuls (TPU-first).

The reference crops faces with cv2 on the host, one `cv2.resize` per face
(`cvit_prediction.py:114`, `helpers_face_extract_1.py:301-317`). On TPU,
gather-style resampling is slow — but separable bilinear resize is exactly
two small matrix multiplies: `out = R_h @ img @ R_wᵀ` per channel, where R
holds each output pixel's two source weights. Cropping folds into R by
shifting the sample coordinates, so crop+resize from a full frame is ONE
batched einsum that rides the MXU — no per-face host round trips.

Weight convention matches cv2/torch `align_corners=False` half-pixel
sampling; exact agreement with bilinear resamplers, and within normal
antialias tolerance of cv2's INTER_AREA for the ~2-4× downscales the face
pipeline sees (SURVEY.md §7.3: fast path uses tolerance, parity mode stays
on cv2).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _interp_matrix(out_size: int, start: jnp.ndarray, stop: jnp.ndarray,
                   src_size: int) -> jnp.ndarray:
    """(out_size, src_size) bilinear weights sampling [start, stop) of the
    source axis with half-pixel centers. start/stop may be traced scalars."""
    scale = (stop - start) / out_size
    centers = start + (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5
    centers = jnp.clip(centers, 0.0, src_size - 1.0)
    lo = jnp.floor(centers)
    frac = centers - lo
    src = jnp.arange(src_size, dtype=jnp.float32)[None, :]
    w_lo = (src == lo[:, None]) * (1.0 - frac[:, None])
    w_hi = (src == jnp.minimum(lo + 1, src_size - 1)[:, None]) * frac[:, None]
    return w_lo + w_hi


@functools.partial(jax.jit, static_argnames=("out_hw",))
def crop_resize_bilinear(frame: jnp.ndarray, boxes: jnp.ndarray,
                         out_hw: Tuple[int, int] = (224, 224)) -> jnp.ndarray:
    """frame (H, W, C) float/uint8, boxes (N, 4) [ymin, xmin, ymax, xmax] in
    pixels → (N, out_h, out_w, C) float32. One vmapped pair of matmuls."""
    h, w, _ = frame.shape
    fr = frame.astype(jnp.float32)

    def one(box):
        ry = _interp_matrix(out_hw[0], box[0], box[2], h)   # (oh, H)
        rx = _interp_matrix(out_hw[1], box[1], box[3], w)   # (ow, W)
        tmp = jnp.einsum("oh,hwc->owc", ry, fr,
                         preferred_element_type=jnp.float32)
        return jnp.einsum("pw,owc->opc", rx, tmp,
                          preferred_element_type=jnp.float32)

    return jax.vmap(one)(boxes.astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("out_hw",))
def resize_bilinear(images: jnp.ndarray,
                    out_hw: Tuple[int, int]) -> jnp.ndarray:
    """(B, H, W, C) → (B, oh, ow, C) full-image resize via shared matrices."""
    b, h, w, c = images.shape
    ry = _interp_matrix(out_hw[0], jnp.float32(0), jnp.float32(h), h)
    rx = _interp_matrix(out_hw[1], jnp.float32(0), jnp.float32(w), w)
    x = images.astype(jnp.float32)
    tmp = jnp.einsum("oh,bhwc->bowc", ry, x, preferred_element_type=jnp.float32)
    return jnp.einsum("pw,bowc->bopc", rx, tmp,
                      preferred_element_type=jnp.float32)


def isotropic_resize(img, max_side: int, interpolation="linear"):
    """Aspect-preserving longest-side resize (`S3D/transforms/albu.py:9-45`
    IsotropicResize), host-side cv2 (dataset preprocessing path)."""
    import cv2
    import numpy as np
    h, w = img.shape[:2]
    if max(h, w) == max_side:
        return img
    scale = max_side / max(h, w)
    interp = cv2.INTER_AREA if scale < 1 and interpolation == "area" \
        else (cv2.INTER_LINEAR if interpolation == "linear" else cv2.INTER_CUBIC)
    return cv2.resize(img, (int(w * scale), int(h * scale)),
                      interpolation=interp)


def random_sized_crop_non_empty_mask(img, mask, min_max_height,
                                     w2h_ratio=(0.7, 1.3), rng=None):
    """`RandomSizedCropNonEmptyMaskIfExists` (`S3D/transforms/albu.py:60-101`):
    sample a random-sized crop placed so a randomly chosen nonzero mask
    pixel falls inside it; an empty mask degrades to a uniform random crop.
    Host-side numpy (data-dependent crop shapes don't jit; the op is a
    dataset-preprocessing transform, unused by the reference's shipped
    pipelines but part of its S8 transform set).

    Sampling matches the reference: crop_h ~ U[min,max]·H, crop_w =
    min(crop_h·U[w2h_ratio], W−1), anchor = a random nonzero (y, x),
    top-left = anchor − U{0..crop−1} clipped into bounds. Two reference
    bugs fixed + documented (SURVEY §8 policy): its final bounds swap
    width/height (`albu.py:96-97`, `x_max = x_min + crop_HEIGHT`), which
    returns transposed crop dims; and the empty-mask branch's inclusive
    `random.randint(0, W−crop_w+1)` can start a crop one pixel out of
    bounds. Returns (img_crop, mask_crop, (x_min, y_min, x_max, y_max))."""
    import numpy as np
    rng = np.random.default_rng() if rng is None else rng
    h, w = mask.shape[:2]
    crop_h = min(int(h * rng.uniform(*min_max_height)), h)
    crop_w = max(min(int(crop_h * rng.uniform(*w2h_ratio)), w - 1), 1)
    crop_h = max(crop_h, 1)
    if mask.sum() == 0:
        x_min = int(rng.integers(0, w - crop_w + 1))
        y_min = int(rng.integers(0, h - crop_h + 1))
    else:
        flat = mask.sum(axis=-1) if mask.ndim == 3 else mask
        nz = np.argwhere(flat)
        y, x = (int(v) for v in nz[rng.integers(0, len(nz))])
        x_min = int(np.clip(x - rng.integers(0, crop_w), 0, w - crop_w))
        y_min = int(np.clip(y - rng.integers(0, crop_h), 0, h - crop_h))
    x_max = min(w, x_min + crop_w)
    y_max = min(h, y_min + crop_h)
    return (img[y_min:y_max, x_min:x_max],
            mask[y_min:y_max, x_min:x_max],
            (x_min, y_min, x_max, y_max))


@functools.partial(jax.jit, static_argnames=("factor",))
def resize_4x_and_back(images: jnp.ndarray, factor: int = 4) -> jnp.ndarray:
    """Quality-degradation aug (`S3D/transforms/albu.py:48-58`
    Resize4xAndBack): downscale by `factor` and back up — on device, as two
    pairs of interpolation matmuls."""
    b, h, w, c = images.shape
    small = resize_bilinear(images, (h // factor, w // factor))
    return resize_bilinear(small, (h, w))
