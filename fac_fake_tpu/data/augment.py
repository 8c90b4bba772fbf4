"""On-device (jitted) image augmentation.

Replaces the reference's CPU albumentations pipelines — `strong_aug`
(`CViT-main/helpers/augmentation.py:9-26`: rot90/transpose/flips/GaussNoise/
ShiftScaleRotate/Sharpen/Emboss/BrightnessContrast/HSV) plus the loader's
ColorJitter/flip/±17° rotation (`helpers/loader.py:17-29`) and the S3D train
transform (`S3D/deepfakes_dataset.py:32-48`) — with a vmapped, jittable
pipeline that runs on the TPU *inside the train step*: augmentation rides the
MXU/VPU instead of stalling host workers, and batches stay uint8 on the wire.

Probabilities mirror the reference pipelines: the strong_aug chain is an
outer Compose(p=.9) (`Aug.__call__`, `augmentation.py:47-50`) over per-op
coins (rot90/transpose/noise/SSR/HSV at .2, flips at .5) with the
OneOf([CLAHE, Sharpen, Emboss, BrightnessContrast], p=.2) group; the S3D
transform has no outer p, GaussNoise(p=.3), SSR(shift .1, scale .2, rot 5°,
p=.5) and the OneOf(bc/pca/hsv, p=.4) group (plans.py configures these).

Known approximations (randomized training augs, not bit-parity surfaces):
CLAHE (`helpers/augmentation.py:20`, clip_limit=2, 8×8 tiles) equalizes the
YCbCr luma channel instead of LAB-L; ImageCompression
(`S3D/deepfakes_dataset.py:34`, quality 60–100) is a real 8×8 block-DCT
JPEG quantization with 4:2:0 chroma subsampling, expressed as matmuls so it
rides the MXU (no cv2 round trip); the ShiftScaleRotate *parameters* (not
the apply-coins) are drawn once per batch — the price of shared
interpolation matrices; the loader's extra ColorJitter/flip/±rotation
(`helpers/loader.py:19-26`) fold into the single hsv/hflip/affine ops. The
S3D-transform extras: GaussianBlur (cv2 k=3 taps), FancyPCA (per-image RGB
eigen-shift), random ToGray, and the OneOf(bc/pca/hsv, p=.4) exclusivity.
The p=1 *eval* degradation keeps the bit-exact cv2 path
(`evaluate/s3d_eval.py`).

All ops take/return float32 images in [0,1], HWC.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

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
    dt = imgs.dtype  # bf16 pipeline: interpolation weights ride the MXU in
    # the image dtype (fp32 accumulation is the MXU default)
    x = jnp.einsum("hvw,bhwc->bhvc", sx1.astype(dt), x)   # shear x
    x = jnp.einsum("wvh,bhwc->bvwc", sy.astype(dt), x)    # shear y
    x = jnp.einsum("hvw,bhwc->bhvc", sx2.astype(dt), x)   # shear x
    x = jnp.einsum("vh,bhwc->bvwc", zy.astype(dt), x)     # zoom y
    x = jnp.einsum("uw,bhwc->bhuc", zx.astype(dt), x)     # zoom x
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


def _conv3x3_per_image(x: jnp.ndarray, kern: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) × per-image (B, 3, 3) kernels → depthwise 3×3 conv (same
    kernel on every channel), zero padding. Expressed as 9 weighted shifted
    adds — per-image kernels would otherwise force a grouped conv with B·C
    groups, which XLA lowers terribly; this form fuses into one VPU pass."""
    h, w = x.shape[1], x.shape[2]
    kern = kern.astype(x.dtype)   # keep the pass in the pipeline dtype
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = jnp.zeros_like(x)
    for dy in range(3):
        for dx in range(3):
            out = out + kern[:, dy, dx, None, None, None] * \
                xp[:, dy:dy + h, dx:dx + w, :]
    return out


_IDENT3 = jnp.asarray([[0, 0, 0], [0, 1, 0], [0, 0, 0]], jnp.float32)
_GAUSS3 = (lambda g: g[:, None] * g[None, :])(
    jnp.asarray([0.25, 0.5, 0.25], jnp.float32))  # cv2 k=3 auto-sigma taps


def _sharpen_kernel(alpha, lightness):
    """albumentations Sharpen: blend of the lightness-weighted laplacian and
    identity — one 3×3 kernel (used by both the per-image reference chain and
    the batched fused-conv pass; broadcast over trailing () or (B,) params)."""
    lap = jnp.asarray([[-1, -1, -1], [-1, 8, -1], [-1, -1, -1]], jnp.float32)
    a = alpha[..., None, None] if jnp.ndim(alpha) else alpha
    li = lightness[..., None, None] if jnp.ndim(lightness) else lightness
    return a * (lap + li * _IDENT3) + (1.0 - a) * _IDENT3


def _emboss_kernel(alpha, strength):
    """albumentations Emboss as a single kernel: alpha·emboss + (1−alpha)·I."""
    a = alpha[..., None, None] if jnp.ndim(alpha) else alpha
    s = strength[..., None, None] if jnp.ndim(strength) else strength
    base = jnp.asarray([[-1, 0, 0], [0, 1, 0], [0, 0, 1]], jnp.float32)
    sgn = jnp.asarray([[-1, 0, 0], [0, 0, 0], [0, 0, 1]], jnp.float32)
    return a * (base + s * sgn) + (1.0 - a) * _IDENT3


# --- dihedral group (rot90 × transpose × flips in ONE pass) -------------------
#
# RandomRotate90/Transpose/HorizontalFlip/VerticalFlip are all elements of the
# dihedral group D4, so their composition is again one of 8 square symmetries:
# four sequential where-passes (each reading+writing the whole batch) collapse
# into a single 8-way select whose operands are *views* of the input — XLA
# fuses the reverses/transposes into the select's operand indexing, one pass.
# Elements are indexed (swap, flip_y, flip_x) → s·4 + fy·2 + fx, where the
# transform applies transpose first, then row flip, then column flip.

def _dihedral_cayley() -> np.ndarray:
    """CAYLEY[a, b] = index of (a ∘ b) — apply b first, then a. Built
    numerically on a probe grid so there is no sign-convention algebra to get
    wrong."""
    probe = np.arange(16).reshape(4, 4)

    def apply(e, m):
        s, fy, fx = e >> 2 & 1, e >> 1 & 1, e & 1
        if s:
            m = m.T
        if fy:
            m = m[::-1]
        if fx:
            m = m[:, ::-1]
        return m

    table = np.zeros((8, 8), np.int32)
    for a in range(8):
        for b in range(8):
            target = apply(a, apply(b, probe))
            matches = [c for c in range(8)
                       if np.array_equal(apply(c, probe), target)]
            assert len(matches) == 1
            table[a, b] = matches[0]
    return table


_CAYLEY = _dihedral_cayley()
# np.rot90(m, k) as an element index: rot90¹ = flip_y ∘ transpose, etc.
_ROT90_ELEM = np.asarray([0, 6, 3, 5], np.int32)
for _k in range(4):  # self-check against numpy's convention
    _p = np.arange(16).reshape(4, 4)
    _e = int(_ROT90_ELEM[_k])
    _m = _p.T if _e & 4 else _p
    _m = _m[::-1] if _e & 2 else _m
    _m = _m[:, ::-1] if _e & 1 else _m
    assert np.array_equal(_m, np.rot90(_p, _k)), _k
del _k, _p, _e, _m


def _apply_dihedral(imgs: jnp.ndarray, elem: jnp.ndarray,
                    reach=tuple(range(8))) -> jnp.ndarray:
    """(B, H, W, C) × per-image element index (B,) → transformed batch in one
    fused select. `reach` statically lists the elements `elem` can take, so
    the select only materializes those views — and flip-only configs (no
    element with the swap bit) never transpose, which keeps non-square
    images legal."""
    reach = tuple(sorted(set(reach) | {0}))
    xt = jnp.swapaxes(imgs, 1, 2) if any(e & 4 for e in reach) else None
    views = []
    for e in reach:
        v = xt if e & 4 else imgs
        if e & 2:
            v = v[:, ::-1]
        if e & 1:
            v = v[:, :, ::-1]
        views.append(v)
    if len(views) == 1:
        return views[0]
    conds = [(elem == e)[:, None, None, None] for e in reach[1:]]
    return jnp.select(conds, views[1:], views[0])


# --- CLAHE ------------------------------------------------------------------

def _rgb_to_ycbcr(img):
    """[0,1] RGB → (Y, Cb, Cr) each in [0,255] (JFIF full-range)."""
    r, g, b = img[..., 0] * 255.0, img[..., 1] * 255.0, img[..., 2] * 255.0
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return y, cb, cr


def _ycbcr_to_rgb(y, cb, cr):
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return jnp.clip(jnp.stack([r, g, b], axis=-1) / 255.0, 0.0, 1.0)


def clahe_luma(img: jnp.ndarray, clip_limit: float = 2.0,
               grid: int = 8) -> jnp.ndarray:
    """CLAHE on the luma channel (`albumentations.CLAHE(clip_limit=2)`,
    8×8 tile grid — `helpers/augmentation.py:20`), exact cv2 LUT math.

    TPU formulation — no per-pixel gathers (a gather-LUT version measured
    1.9 ms/image, ~4× a whole CViT train step):
      * per-tile 256-bin histograms as a fused compare-reduce;
      * clip at `clip_limit·tile_px/256` with cv2's redistribution (uniform
        batch + the residual +1 at bins 0, step, 2·step… in closed form);
      * application is block-structured: every pixel between four adjacent
        tile centers blends the SAME four LUTs, so padding by half a tile
        makes a uniform (grid+1)² block partition whose corner-tile indices
        and bilinear weights are static — the lookup becomes a batched
        one-hot × LUT matmul, and the blend a static weighted sum.
    H and W must divide by `grid` with even-sized tiles; otherwise (tiny
    inputs, odd tiles) it falls back to global (1-tile) equalization.
    """
    h, w = img.shape[0], img.shape[1]
    th, tw = h // grid, w // grid
    if grid > 1 and (th < 2 or tw < 2 or th % 2 or tw % 2):
        return clahe_luma(img, clip_limit, grid=1)
    y, cb, cr = _rgb_to_ycbcr(img)
    bins = jnp.round(jnp.clip(y, 0.0, 255.0)).astype(jnp.int32)

    # (grid² , tile_px) tile-major pixel bins → fused compare-reduce hist
    tiled = bins.reshape(grid, th, grid, tw).transpose(0, 2, 1, 3)
    tiled = tiled.reshape(grid * grid, th * tw)
    hist = jnp.sum(tiled[:, :, None] == jnp.arange(256), axis=1,
                   dtype=jnp.float32)              # (G², 256)

    tile_px = float(th * tw)
    limit = jnp.maximum(jnp.floor(clip_limit * tile_px / 256.0), 1.0)
    clipped = jnp.minimum(hist, limit)
    excess = (hist - clipped).sum(axis=1, keepdims=True)
    # cv2's redistribution: +excess//256 to every bin, then the residual
    # +1 at bins 0, step, 2·step, … (step = max(256//resid, 1)) — the
    # residual's cumsum contribution has the closed form
    # min(b//step + 1, resid), so no loop is needed
    batch = jnp.floor(excess / 256.0)
    resid = excess - batch * 256.0
    step = jnp.maximum(jnp.floor(256.0 / jnp.maximum(resid, 1.0)), 1.0)
    b = jnp.arange(256, dtype=jnp.float32)[None, :]
    resid_cum = jnp.where(resid > 0,
                          jnp.minimum(jnp.floor(b / step) + 1.0, resid), 0.0)
    cdf = jnp.cumsum(clipped, axis=1) + batch * (b + 1.0) + resid_cum
    lut = jnp.round(cdf * (255.0 / tile_px))                # (G², 256)

    if grid == 1:   # global equalization: one LUT, no blending
        onehot = (bins[:, :, None] == jnp.arange(256)).astype(jnp.float32)
        return _ycbcr_to_rgb(onehot @ lut[0], cb, cr)

    # block-structured application: pad by half a tile so pixels form a
    # uniform (grid+1)² partition of blocks, each blending 4 fixed tiles
    py, px = th // 2, tw // 2
    nb = grid + 1
    binsp = jnp.pad(bins, ((py, py), (px, px)), mode="edge")
    blocks = binsp.reshape(nb, th, nb, tw).transpose(0, 2, 1, 3)
    blocks = blocks.reshape(nb * nb, th * tw)

    # static per-block corner-tile indices and bilinear weights: band k
    # blends tiles clamp(k-1) and clamp(k); interior fractional weight is
    # r/tile, edge bands collapse to a single tile (cv2 clamped centers)
    t0 = np.clip(np.arange(nb) - 1, 0, grid - 1)
    t1 = np.clip(np.arange(nb), 0, grid - 1)
    corners = np.stack([t0[:, None] * grid + t0[None, :],
                        t0[:, None] * grid + t1[None, :],
                        t1[:, None] * grid + t0[None, :],
                        t1[:, None] * grid + t1[None, :]],
                       axis=-1).reshape(nb * nb, 4)
    fy = np.zeros((nb, th), np.float32)
    fy[1:grid] = np.arange(th, dtype=np.float32) / th
    fx = np.zeros((nb, tw), np.float32)
    fx[1:grid] = np.arange(tw, dtype=np.float32) / tw
    wy = np.broadcast_to(fy[:, None, :, None], (nb, nb, th, tw))
    wx = np.broadcast_to(fx[None, :, None, :], (nb, nb, th, tw))
    wy = jnp.asarray(wy.reshape(nb * nb, th * tw))
    wx = jnp.asarray(wx.reshape(nb * nb, th * tw))

    lut4 = jnp.take(lut, jnp.asarray(corners), axis=0)      # (K, 4, 256)
    # bf16 operands halve the one-hot's HBM traffic; one-hot is exact in
    # bf16 and LUT values ≤255 round to ≤0.5 — accumulate in f32
    onehot = (blocks[:, :, None] == jnp.arange(256)).astype(jnp.bfloat16)
    vals = jnp.einsum("kpb,kcb->kpc", onehot, lut4.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)   # (K, P, 4)
    out = (vals[..., 0] * (1 - wy) * (1 - wx) + vals[..., 1] * (1 - wy) * wx
           + vals[..., 2] * wy * (1 - wx) + vals[..., 3] * wy * wx)

    out = out.reshape(nb, nb, th, tw).transpose(0, 2, 1, 3)
    out = out.reshape(h + th, w + tw)[py:py + h, px:px + w]
    return _ycbcr_to_rgb(out, cb, cr)


# --- JPEG compression (block DCT) -------------------------------------------

# ITU-T T.81 Annex K base quantization tables
_JPEG_LUMA_Q = jnp.asarray([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], jnp.float32)
_JPEG_CHROMA_Q = jnp.asarray([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99]], jnp.float32)


def _dct8():
    x = jnp.arange(8, dtype=jnp.float32)
    d = jnp.cos((2.0 * x[None, :] + 1.0) * x[:, None] * (jnp.pi / 16.0))
    c = jnp.where(jnp.arange(8) == 0, jnp.sqrt(1.0 / 8.0), jnp.sqrt(2.0 / 8.0))
    return d * c[:, None]


def _jpeg_quality_table(base: jnp.ndarray, quality: jnp.ndarray) -> jnp.ndarray:
    """libjpeg quality scaling (what cv2.imencode applies)."""
    q = jnp.clip(quality, 1.0, 100.0)
    scale = jnp.where(q < 50.0, 5000.0 / q, 200.0 - 2.0 * q)
    return jnp.clip(jnp.floor((base * scale + 50.0) / 100.0), 1.0, 255.0)


def _dct_quantize(plane: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
    """plane (H, W) in [0,255] → blockwise DCT-quantized reconstruction."""
    h, w = plane.shape
    d = _dct8()
    blocks = (plane - 128.0).reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
    coef = jnp.einsum("ux,hwxy,vy->hwuv", d, blocks, d)
    coef = jnp.round(coef / table) * table
    rec = jnp.einsum("ux,hwuv,vy->hwxy", d, coef, d)
    return (rec.transpose(0, 2, 1, 3).reshape(h, w) + 128.0)


def jpeg_compress(img: jnp.ndarray, quality: jnp.ndarray) -> jnp.ndarray:
    """On-device JPEG artifact simulation (8×8 block DCT quantization,
    4:2:0 chroma subsampling) matching `albumentations.ImageCompression`
    (`S3D/deepfakes_dataset.py:34`) without a host round trip — the whole
    op is reshapes + four 8×8 einsums, so it fuses into the train step.
    `quality` may be a traced scalar (sampled per image)."""
    y, cb, cr = _rgb_to_ycbcr(img)
    lq = _jpeg_quality_table(_JPEG_LUMA_Q, quality)
    cq = _jpeg_quality_table(_JPEG_CHROMA_Q, quality)
    y = _dct_quantize(y, lq)

    def chroma(c):
        h, w = c.shape
        sub = c.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
        rec = _dct_quantize(sub, cq)
        return jnp.repeat(jnp.repeat(rec, 2, axis=0), 2, axis=1)

    return _ycbcr_to_rgb(y, chroma(cb), chroma(cr))


# --- the pipeline -------------------------------------------------------------

def draw_sharpen_oneof(key: jax.Array, cfg: AugmentConfig, outer):
    """strong_aug's OneOf([CLAHE, Sharpen, Emboss, BC], p=.2) coins
    (`augmentation.py:19-24`): group coin at sharpen_oneof_prob, uniform
    4-way pick. Shapes follow `outer` (scalar per image, or (B,) when drawn
    batch-level so `augment_batch` can gather the rare CLAHE takers)."""
    k1, k2 = jax.random.split(key)
    shape = jnp.shape(outer)
    sgroup = (jax.random.uniform(k1, shape) < cfg.sharpen_oneof_prob) & outer
    spick = jax.random.randint(k2, shape, 0, 4)
    return (sgroup & (spick == 0), sgroup & (spick == 1),
            sgroup & (spick == 2), sgroup & (spick == 3))


def augment_image(key: jax.Array, img: jnp.ndarray, cfg: AugmentConfig,
                  outer=None, sharpen_gates=None,
                  clahe_inline: bool = True) -> jnp.ndarray:
    """Apply the configured augmentations to one image with per-op coin flips
    at the reference's per-op probabilities (`augmentation.py:11-26`,
    `deepfakes_dataset.py:33-48`). `outer` is the Compose(p=…) coin — the
    whole chain no-ops when it misses (strong_aug is built with p=0.9); pass
    it in from `augment_batch` so the batch affine shares the same coin.
    `sharpen_gates` optionally injects pre-drawn OneOf coins (take_clahe,
    take_sharpen, take_emboss, take_bc) so `augment_batch` can hoist the
    group draw to batch level; `clahe_inline=False` skips the CLAHE apply
    (the batch path runs it on a gathered subset instead — computing CLAHE
    for a full batch when the group fires ~5% of images is pure waste)."""
    # one key per random draw: parameters and their apply-coins must be
    # independent, otherwise conditioning on the coin silently truncates the
    # parameter distribution (e.g. a shared key makes brightness==contrast
    # and the coin<p region maps to the lower half of the range)
    keys = jax.random.split(key, 36)
    if outer is None:
        outer = jax.random.uniform(keys[33]) < cfg.compose_prob

    def coin(k, p=cfg.prob):
        return (jax.random.uniform(k) < p) & outer

    # color-op gating, three reference shapes:
    #  * S3D: OneOf([RandomBrightnessContrast, FancyPCA, HSV], p=.4)
    #    (`deepfakes_dataset.py:44`) — group coin, uniform 3-way pick;
    #  * CViT strong_aug: OneOf([CLAHE, Sharpen, Emboss, BC], p=.2)
    #    (`augmentation.py:19-24`) — uniform 4-way pick (members' default
    #    p=.5 normalize to 1/4), HSV independent at hsv_prob;
    #  * legacy independent coins when both groups are off.
    if cfg.color_oneof:
        group = (jax.random.uniform(keys[29]) < cfg.color_oneof_prob) & outer
        pick = jax.random.randint(keys[30], (), 0, 3)
        take_bc = group & (pick == 0)
        take_pca = group & (pick == 1)
        take_hsv = group & (pick == 2)
    else:
        take_pca = coin(keys[27])
        take_hsv = coin(keys[11], cfg.hsv_prob)
        take_bc = coin(keys[18])
    if cfg.sharpen_oneof and not cfg.color_oneof:
        if sharpen_gates is None:
            sharpen_gates = draw_sharpen_oneof(keys[31], cfg, outer)
        take_clahe, take_sharpen, take_emboss, take_bc = sharpen_gates
    else:
        take_clahe = coin(keys[23])
        take_sharpen = coin(keys[12])
        take_emboss = coin(keys[16])

    if cfg.image_compression:
        # S3D order: ImageCompression runs before the geometric/color ops
        # (`deepfakes_dataset.py:33-48`), its own p (default 0.2)
        q = jax.random.uniform(keys[21], (),
                               minval=float(cfg.compression_quality[0]),
                               maxval=float(cfg.compression_quality[1]))
        compressed = jpeg_compress(img, jnp.floor(q))
        take = (jax.random.uniform(keys[22]) < cfg.compression_prob) & outer
        img = jnp.where(take[None, None, None], compressed, img)
    if cfg.rot90:
        k4 = jax.random.randint(keys[0], (), 0, 4)
        img = jnp.where(coin(keys[1], cfg.rot90_prob)[None, None, None],
                        jax.lax.switch(k4, [lambda x: x,
                                            lambda x: jnp.rot90(x, 1),
                                            lambda x: jnp.rot90(x, 2),
                                            lambda x: jnp.rot90(x, 3)], img),
                        img)
    if cfg.transpose:
        img = jnp.where(coin(keys[2], cfg.transpose_prob)[None, None, None],
                        jnp.swapaxes(img, 0, 1), img)
    if cfg.hflip:
        img = jnp.where(coin(keys[3], cfg.hflip_prob)[None, None, None],
                        img[:, ::-1], img)
    if cfg.vflip:
        img = jnp.where(coin(keys[4], cfg.vflip_prob)[None, None, None],
                        img[::-1], img)
    if cfg.gauss_noise:
        sigma = jax.random.uniform(keys[5], (), minval=0.01, maxval=0.05)
        noise = sigma * jax.random.normal(keys[6], img.shape)
        img = jnp.where(coin(keys[7], cfg.noise_prob)[None, None, None],
                        jnp.clip(img + noise, 0, 1), img)
    if cfg.gaussian_blur:
        # albumentations GaussianBlur(blur_limit=(1,3), p=.05)
        # (`deepfakes_dataset.py:36`): ksize 1 (identity) or 3 with cv2's
        # default sigma for k=3 (0.8)
        g = jnp.asarray([0.25, 0.5, 0.25], jnp.float32)  # cv2 k=3 auto-sigma taps
        blurred = jnp.clip(_conv3x3(img, g[:, None] * g[None, :]), 0, 1)
        k3 = jax.random.bernoulli(keys[24])
        take = (jax.random.uniform(keys[25]) < cfg.blur_prob) & k3 & outer
        img = jnp.where(take[None, None, None], blurred, img)
    if cfg.fancy_pca:
        # albumentations FancyPCA(alpha=.1) (`deepfakes_dataset.py:44`
        # OneOf): per-image RGB covariance eigendecomposition, shift along
        # eigenvectors by N(0, .1)-weighted eigenvalues (AlexNet aug)
        flat = img.reshape(-1, 3)
        centered = flat - flat.mean(axis=0)
        cov = centered.T @ centered / flat.shape[0]
        evals, evecs = jnp.linalg.eigh(cov)
        alphas = 0.1 * jax.random.normal(keys[26], (3,))
        delta = evecs @ (alphas * evals)
        shifted = jnp.clip(img + delta[None, None, :], 0, 1)
        img = jnp.where(take_pca[None, None, None], shifted, img)
    if cfg.clahe and clahe_inline:
        # strong_aug CLAHE(clip_limit=2) — first member of the OneOf group
        # (`helpers/augmentation.py:19-24`)
        eq = clahe_luma(img, cfg.clahe_clip_limit)
        img = jnp.where(take_clahe[None, None, None], eq, img)
    if cfg.sharpen:
        # albumentations Sharpen: blend with a laplacian-sharpened image
        alpha = jax.random.uniform(keys[8], (), minval=0.2, maxval=0.5)
        lightness = jax.random.uniform(keys[13], (), minval=0.5, maxval=1.0)
        sharpened = jnp.clip(_conv3x3(img, _sharpen_kernel(alpha, lightness)),
                             0, 1)
        img = jnp.where(take_sharpen[None, None, None], sharpened, img)
    if cfg.emboss:
        alpha = jax.random.uniform(keys[14], (), minval=0.2, maxval=0.5)
        strength = jax.random.uniform(keys[15], (), minval=0.2, maxval=0.7)
        embossed = jnp.clip(_conv3x3(img, _emboss_kernel(alpha, strength)),
                            0, 1)
        img = jnp.where(take_emboss[None, None, None], embossed, img)
    if cfg.brightness_contrast:
        a = jax.random.uniform(keys[9], (), minval=-0.2, maxval=0.2)
        b = jax.random.uniform(keys[17], (), minval=-0.2, maxval=0.2)
        img = jnp.where(take_bc[None, None, None],
                        jnp.clip((img - 0.5) * (1 + a) + 0.5 + b, 0, 1), img)
    if cfg.hue_saturation or cfg.color_jitter:
        hsv = _rgb_to_hsv_vec(img)
        dh = jax.random.uniform(keys[10], (), minval=-0.05, maxval=0.05)
        ds = jax.random.uniform(keys[19], (), minval=-0.15, maxval=0.15)
        dv = jax.random.uniform(keys[20], (), minval=-0.15, maxval=0.15)
        shifted = _hsv_to_rgb_vec(jnp.stack(
            [hsv[..., 0] + dh, jnp.clip(hsv[..., 1] + ds, 0, 1),
             jnp.clip(hsv[..., 2] + dv, 0, 1)], axis=-1))
        img = jnp.where(take_hsv[None, None, None],
                        jnp.clip(shifted, 0, 1), img)
    if cfg.to_gray_prob > 0:
        # ToGray(p=.2) as a *random* aug (`deepfakes_dataset.py:45`);
        # distinct from the deterministic gray-plan conversion below
        gray = (0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2])
        take = (jax.random.uniform(keys[28]) < cfg.to_gray_prob) & outer
        img = jnp.where(take[None, None, None],
                        jnp.broadcast_to(gray[..., None], img.shape), img)
    if cfg.to_gray:
        gray = (0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2])
        img = jnp.broadcast_to(gray[..., None], img.shape)
    return img


def _subset_budget(n: int, p: float) -> int:
    """Fixed gather size for an op firing with probability p: mean + 4σ of
    Binomial(n, p), rounded up to a multiple of 8. P(overflow) ≲ 1e-7; the
    overflow case simply leaves the extra takers untransformed — a no-op for
    a randomized training augmentation."""
    mu = n * p
    k = int(mu + 4.0 * (mu * max(1.0 - p, 0.0)) ** 0.5) + 1
    return min(n, max(8, (k + 7) // 8 * 8))


def _subset_apply(x: jnp.ndarray, take: jnp.ndarray, k_budget: int,
                  fn, *extras) -> jnp.ndarray:
    """Apply `fn` only to the ≤k_budget images whose `take` coin fired:
    stable-sort gathers takers to the front, fn transforms the fixed-size
    sub-batch, scatter writes it back (non-takers get their own bits back,
    bit-exact). `extras` are per-image params gathered alongside."""
    idx = jnp.argsort(jnp.logical_not(take), stable=True)[:k_budget]
    sel = jnp.take(take, idx)
    sub = jnp.take(x, idx, axis=0)
    new = fn(sub, *(jnp.take(e, idx, axis=0) for e in extras))
    return x.at[idx].set(jnp.where(sel[:, None, None, None], new, sub))


def augment_batch(key: jax.Array, batch_u8: jnp.ndarray,
                  cfg: AugmentConfig) -> jnp.ndarray:
    """uint8 (B,H,W,3) or clips (B,T,H,W,3) → [0,1] augmented batch in
    ``cfg.compute_dtype`` (float32 unless a bf16 trainer resolves "auto").

    Batch-vectorized re-expression of the per-image chain `augment_image`
    documents (same ops, same per-op probabilities — clips draw per *frame*
    like the reference's per-frame albumentations calls): the reference's
    sequential where-passes are reorganized around the TPU's memory system,
    because at b256/224² every image-sized pass moves ~300 MB of HBM traffic:

      * rot90/transpose/flips — all dihedral-group elements — compose into
        ONE 8-way select of input *views* (`_apply_dihedral`) instead of four
        read-modify-write passes;
      * Sharpen/Emboss/GaussianBlur/BrightnessContrast/FancyPCA collapse into
        ONE depthwise 3×3 conv with per-image kernel k·scale and bias: the
        OneOf groups make the kernel ops mutually exclusive per image, and
        bc (affine map) and pca (channel bias) compose exactly with any
        kernel. Composition-order caveats only arise for co-firing ops that
        the reference's shipped pipelines never enable together (legacy
        independent-coin mode falls back to sequential passes);
      * CLAHE (~5% effective) and HSV (~18%) run on fixed-K gathered subsets
        (`_subset_apply`) instead of equalizing/converting the whole batch;
      * the ShiftScaleRotate affine stays the per-batch shear-matmul form.

    Op order matches `augment_image` except that the OneOf color stage sits
    after noise and before HSV as one fused stage — exclusivity makes the
    intra-stage order unobservable; see the module header for the affine-last
    approximation note.

    ``cfg.compute_dtype`` picks the element type the full-batch passes run
    in ("auto" resolves to float32 here; the Trainer rewrites it to match a
    bf16 model — the chain is HBM-bandwidth-bound, so halving the element
    size halves its cost). Sub-pixel-exact ops keep fp32 math regardless:
    CLAHE/HSV cast their gathered subsets up and back, JPEG's DCT einsums
    promote to fp32 internally, FancyPCA's covariance accumulates fp32.
    """
    dt = (jnp.float32 if cfg.compute_dtype == "auto"
          else jnp.dtype(cfg.compute_dtype))
    imgs = batch_u8.astype(dt) / 255.0
    if not cfg.enabled:
        return imgs
    shape = imgs.shape
    flat = imgs.reshape(-1, *shape[-3:])
    n, h, w = flat.shape[0], flat.shape[1], flat.shape[2]
    # one key per independent draw — a coin and its op's parameters must not
    # share a key (a shared key correlates "applied" with the parameter range)
    ks = jax.random.split(key, 34)
    gk = ks[33]
    # one Compose(p=…) coin per image, shared by every op incl. the affine
    outer = jax.random.uniform(ks[0], (n,)) < cfg.compose_prob

    def coin(k, p=cfg.prob):
        return (jax.random.uniform(k, (n,)) < p) & outer

    # --- gates: the three reference shapes (see augment_image) -------------
    if cfg.color_oneof:
        group = (jax.random.uniform(ks[1], (n,)) < cfg.color_oneof_prob) & outer
        pick = jax.random.randint(ks[2], (n,), 0, 3)
        take_bc = group & (pick == 0)
        take_pca = group & (pick == 1)
        take_hsv = group & (pick == 2)
        p_hsv = cfg.compose_prob * cfg.color_oneof_prob / 3.0
    else:
        take_pca = coin(ks[3])
        take_hsv = coin(ks[4], cfg.hsv_prob)
        take_bc = coin(ks[5])
        p_hsv = cfg.compose_prob * cfg.hsv_prob
    exclusive = cfg.sharpen_oneof and not cfg.color_oneof
    if exclusive:
        take_clahe, take_sharpen, take_emboss, take_bc = \
            draw_sharpen_oneof(ks[6], cfg, outer)
        p_clahe = cfg.compose_prob * cfg.sharpen_oneof_prob / 4.0
    else:
        take_clahe = coin(ks[7])
        take_sharpen = coin(ks[8])
        take_emboss = coin(ks[9])
        p_clahe = cfg.compose_prob * cfg.prob

    x = flat
    if cfg.image_compression:
        # S3D order: ImageCompression first (`deepfakes_dataset.py:33-48`)
        q = jnp.floor(jax.random.uniform(
            ks[10], (n,), minval=float(cfg.compression_quality[0]),
            maxval=float(cfg.compression_quality[1])))
        take = (jax.random.uniform(ks[11], (n,)) < cfg.compression_prob) & outer
        comp = jax.vmap(jpeg_compress)(x, q).astype(x.dtype)
        x = jnp.where(take[:, None, None, None], comp, x)

    # --- dihedral stage (rot90 → transpose → hflip → vflip composed) -------
    if cfg.rot90 or cfg.transpose or cfg.hflip or cfg.vflip:
        cayley = jnp.asarray(_CAYLEY)
        elem = jnp.zeros((n,), jnp.int32)
        reach = {0}
        if cfg.rot90:
            if h != w:
                raise ValueError("rot90/transpose need square images")
            k4 = jax.random.randint(ks[12], (n,), 0, 4)
            elem = jnp.where(coin(ks[13], cfg.rot90_prob),
                             jnp.take(jnp.asarray(_ROT90_ELEM), k4), elem)
            reach = {int(e) for e in _ROT90_ELEM}
        for flag, e_op, kc, p_op in (
                (cfg.transpose, 4, 14, cfg.transpose_prob),
                (cfg.hflip, 1, 15, cfg.hflip_prob),
                (cfg.vflip, 2, 16, cfg.vflip_prob)):
            if flag:
                if e_op == 4 and h != w:
                    raise ValueError("rot90/transpose need square images")
                elem = jnp.where(coin(ks[kc], p_op),
                                 jnp.take(cayley[e_op], elem), elem)
                reach |= {int(_CAYLEY[e_op, e]) for e in reach}
        x = _apply_dihedral(x, elem, tuple(sorted(reach)))

    if cfg.gauss_noise:
        sigma = jax.random.uniform(ks[17], (n,), minval=0.01, maxval=0.05)
        noise = sigma[:, None, None, None].astype(x.dtype) \
            * jax.random.normal(ks[18], x.shape, x.dtype)
        x = jnp.where(coin(ks[19], cfg.noise_prob)[:, None, None, None],
                      jnp.clip(x + noise, 0, 1), x)

    # --- fused depthwise-conv stage -----------------------------------------
    # kernel = scale_bc · (sharpen | emboss | blur | identity), bias = bc + pca
    blur_in_conv = cfg.gaussian_blur and not (cfg.sharpen or cfg.emboss)
    emboss_in_conv = cfg.emboss and (exclusive or not cfg.sharpen)
    kern = jnp.broadcast_to(_IDENT3, (n, 3, 3))
    take_conv = jnp.zeros((n,), bool)
    if blur_in_conv:
        k3 = jax.random.bernoulli(ks[20], 0.5, (n,))
        tb = (jax.random.uniform(ks[21], (n,)) < cfg.blur_prob) & k3 & outer
        kern = jnp.where(tb[:, None, None], _GAUSS3, kern)
        take_conv |= tb
    if cfg.sharpen:
        a = jax.random.uniform(ks[25], (n,), minval=0.2, maxval=0.5)
        li = jax.random.uniform(ks[22], (n,), minval=0.5, maxval=1.0)
        kern = jnp.where(take_sharpen[:, None, None],
                         _sharpen_kernel(a, li), kern)
        take_conv |= take_sharpen
    if emboss_in_conv:
        a = jax.random.uniform(ks[26], (n,), minval=0.2, maxval=0.5)
        s = jax.random.uniform(ks[23], (n,), minval=0.2, maxval=0.7)
        kern = jnp.where(take_emboss[:, None, None],
                         _emboss_kernel(a, s), kern)
        take_conv |= take_emboss
    bias = jnp.zeros((n, 3), jnp.float32)
    if cfg.fancy_pca:
        # per-image RGB eigen-shift (AlexNet aug): a pure per-channel bias,
        # exact through any kernel whose taps sum to 1 (all of the above);
        # covariance/eigh stay fp32 (eigh needs it, and the cast fuses into
        # the mean/cov reduces so the HBM reads stay in the pipeline dtype)
        flatpx = x.reshape(n, -1, 3).astype(jnp.float32)
        centered = flatpx - flatpx.mean(axis=1, keepdims=True)
        cov = jnp.einsum("npc,npd->ncd", centered, centered) / flatpx.shape[1]
        evals, evecs = jnp.linalg.eigh(cov)
        alphas = 0.1 * jax.random.normal(ks[24], (n, 3))
        delta = jnp.einsum("ncd,nd->nc", evecs, alphas * evals)
        bias = bias + jnp.where(take_pca[:, None], delta, 0.0)
        take_conv |= take_pca
    if cfg.brightness_contrast:
        a = jax.random.uniform(ks[27], (n,), minval=-0.2, maxval=0.2)
        b = jax.random.uniform(ks[28], (n,), minval=-0.2, maxval=0.2)
        scale = jnp.where(take_bc, 1.0 + a, 1.0)
        kern = kern * scale[:, None, None]
        bias = scale[:, None] * bias + jnp.where(take_bc, b - 0.5 * a, 0.0)[:, None]
        take_conv |= take_bc
    if (blur_in_conv or cfg.sharpen or emboss_in_conv or cfg.fancy_pca
            or cfg.brightness_contrast):
        conv = _conv3x3_per_image(x, kern) + bias.astype(x.dtype)[:, None, None, :]
        x = jnp.where(take_conv[:, None, None, None],
                      jnp.clip(conv, 0, 1), x)
    # legacy-mode stragglers that can co-fire (never in the reference's
    # shipped OneOf pipelines): sequential passes, reference order
    if cfg.gaussian_blur and not blur_in_conv:
        k3 = jax.random.bernoulli(ks[20], 0.5, (n,))
        tb = (jax.random.uniform(ks[21], (n,)) < cfg.blur_prob) & k3 & outer
        blurred = jnp.clip(_conv3x3_per_image(
            x, jnp.broadcast_to(_GAUSS3, (n, 3, 3))), 0, 1)
        x = jnp.where(tb[:, None, None, None], blurred, x)
    if cfg.emboss and not emboss_in_conv:
        a = jax.random.uniform(ks[26], (n,), minval=0.2, maxval=0.5)
        s = jax.random.uniform(ks[23], (n,), minval=0.2, maxval=0.7)
        emb = jnp.clip(_conv3x3_per_image(x, _emboss_kernel(a, s)), 0, 1)
        x = jnp.where(take_emboss[:, None, None, None], emb, x)

    if cfg.clahe:
        def eq_fn(sub):
            # CLAHE's histogram bins are integer-exact only in fp32
            return jax.vmap(lambda im: clahe_luma(
                im, cfg.clahe_clip_limit))(
                sub.astype(jnp.float32)).astype(sub.dtype)
        kb = _subset_budget(n, p_clahe)
        if kb <= n // 2 and n >= 16:
            x = _subset_apply(x, take_clahe, kb, eq_fn)
        else:
            x = jnp.where(take_clahe[:, None, None, None], eq_fn(x), x)

    if cfg.hue_saturation or cfg.color_jitter:
        dh = jax.random.uniform(ks[29], (n,), minval=-0.05, maxval=0.05)
        dsat = jax.random.uniform(ks[30], (n,), minval=-0.15, maxval=0.15)
        dv = jax.random.uniform(ks[31], (n,), minval=-0.15, maxval=0.15)

        def hsv_fn(sub, sdh, sds, sdv):
            # hue arithmetic (mod-1 wraparound) is fp32-sensitive
            hsv = _rgb_to_hsv_vec(sub.astype(jnp.float32))
            shifted = _hsv_to_rgb_vec(jnp.stack(
                [hsv[..., 0] + sdh[:, None, None],
                 jnp.clip(hsv[..., 1] + sds[:, None, None], 0, 1),
                 jnp.clip(hsv[..., 2] + sdv[:, None, None], 0, 1)], axis=-1))
            return jnp.clip(shifted, 0, 1).astype(sub.dtype)

        kb = _subset_budget(n, p_hsv)
        if kb <= n // 2 and n >= 16:
            x = _subset_apply(x, take_hsv, kb, hsv_fn, dh, dsat, dv)
        else:
            x = jnp.where(take_hsv[:, None, None, None],
                          hsv_fn(x, dh, dsat, dv), x)

    if cfg.to_gray_prob > 0:
        gray = (0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2])
        take = (jax.random.uniform(ks[32], (n,)) < cfg.to_gray_prob) & outer
        x = jnp.where(take[:, None, None, None], gray[..., None], x)
    if cfg.to_gray:
        gray = (0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2])
        x = jnp.broadcast_to(gray[..., None], x.shape)

    out = x
    if cfg.rotation_deg > 0:
        # ShiftScaleRotate with per-batch params as MXU matmuls; per-image
        # coin (affine_prob, ANDed with the Compose coin) decides who gets
        # warped (see geometry note above). Limits are configured —
        # strong_aug uses albumentations' defaults (.0625/.1), the S3D
        # transform .1/.2 (`deepfakes_dataset.py:46`). Approximation: params
        # are shared per batch (per-image coins), the price of shared
        # interpolation matrices.
        k1, k2, k3, k4 = jax.random.split(gk, 4)
        ang = jax.random.uniform(k1, (), minval=-1.0, maxval=1.0) \
            * cfg.rotation_deg * jnp.pi / 180.0
        scale = jax.random.uniform(k2, (), minval=1.0 - cfg.scale_limit,
                                   maxval=1.0 + cfg.scale_limit)
        shift = jax.random.uniform(k3, (2,), minval=-cfg.shift_limit,
                                   maxval=cfg.shift_limit) * shape[-3]
        warped = jnp.clip(batch_affine_matmul(out, ang, scale,
                                              shift[0], shift[1]), 0, 1)
        apply = (jax.random.uniform(k4, (n,)) < cfg.affine_prob) & outer
        out = jnp.where(apply[:, None, None, None], warped, out)
    return out.reshape(shape)
