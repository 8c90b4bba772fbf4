"""On-device CLAHE and JPEG-compression augs vs their cv2 ground truths.

These are randomized *training* augmentations, not bit-parity surfaces
(SURVEY.md §8): the tests pin the math — CLAHE against cv2.createCLAHE on
the same channel, the block-DCT JPEG against cv2.imencode at the same
quality — with tolerances that fail if the op drifts from "the same
transform" to "a different transform".
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _face_like(rng, low_contrast=False):
    """A smooth synthetic image (blocky gradients + blobs), uint8 RGB."""
    yy, xx = np.mgrid[0:224, 0:224].astype(np.float32) / 224.0
    base = 0.3 + 0.4 * yy + 0.2 * np.sin(xx * 9.0)
    img = np.stack([base, base * 0.9 + 0.05, base * 0.8 + 0.1], -1)
    img += rng.normal(0, 0.02, img.shape)
    if low_contrast:
        img = 0.45 + (img - img.mean()) * 0.2
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


# --- CLAHE -------------------------------------------------------------------

def test_clahe_matches_cv2_on_luma():
    import cv2
    from fac_fake_tpu.data.augment import clahe_luma, _rgb_to_ycbcr

    rng = np.random.default_rng(0)
    img_u8 = _face_like(rng, low_contrast=True)
    img = jnp.asarray(img_u8.astype(np.float32) / 255.0)

    ours = np.asarray(clahe_luma(img, clip_limit=2.0))
    y_ours = np.asarray(_rgb_to_ycbcr(jnp.asarray(ours))[0])

    y_ref, _, _ = (np.asarray(v) for v in _rgb_to_ycbcr(img))
    clahe = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8))
    y_cv = clahe.apply(np.round(np.clip(y_ref, 0, 255)).astype(np.uint8))

    # same transform up to interpolation details: tight mean error, and the
    # equalization actually happened (contrast up on a low-contrast input)
    err = np.abs(y_ours - y_cv.astype(np.float32))
    assert float(err.mean()) < 3.0, float(err.mean())
    # clip_limit=2 bounds the gain; still must visibly raise contrast
    assert y_ours.std() > 1.15 * y_ref.std()


def test_clahe_identity_regions_unchanged_chroma():
    from fac_fake_tpu.data.augment import clahe_luma, _rgb_to_ycbcr
    rng = np.random.default_rng(1)
    img = jnp.asarray(_face_like(rng).astype(np.float32) / 255.0)
    out = clahe_luma(img)
    _, cb0, cr0 = _rgb_to_ycbcr(img)
    _, cb1, cr1 = _rgb_to_ycbcr(out)
    # luma-only op: chroma survives the round trip (up to RGB clipping)
    assert float(jnp.abs(cb1 - cb0).mean()) < 2.5
    assert float(jnp.abs(cr1 - cr0).mean()) < 2.5


# --- JPEG --------------------------------------------------------------------

def test_dct_roundtrip_identity_without_quantization():
    from fac_fake_tpu.data.augment import _dct_quantize
    rng = np.random.default_rng(2)
    plane = jnp.asarray(rng.uniform(0, 255, (32, 32)).astype(np.float32))
    out = _dct_quantize(plane, jnp.ones((8, 8), jnp.float32) * 1e-6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(plane), atol=1e-2)


def test_jpeg_quality_table_matches_libjpeg_formula():
    from fac_fake_tpu.data.augment import _jpeg_quality_table, _JPEG_LUMA_Q
    t100 = np.asarray(_jpeg_quality_table(_JPEG_LUMA_Q, jnp.float32(100.0)))
    assert (t100 == 1.0).all()                       # q=100 → all-ones table
    t50 = np.asarray(_jpeg_quality_table(_JPEG_LUMA_Q, jnp.float32(50.0)))
    np.testing.assert_allclose(t50, np.asarray(_JPEG_LUMA_Q))  # q=50 → base


@pytest.mark.parametrize("quality", [60, 90])
def test_jpeg_compress_tracks_cv2(quality):
    import cv2
    from fac_fake_tpu.data.augment import jpeg_compress

    rng = np.random.default_rng(3)
    img_u8 = _face_like(rng)
    ours = np.asarray(jpeg_compress(
        jnp.asarray(img_u8.astype(np.float32) / 255.0), jnp.float32(quality)))
    ours_u8 = np.round(ours * 255).astype(np.int32)

    ok, enc = cv2.imencode(".jpg", cv2.cvtColor(img_u8, cv2.COLOR_RGB2BGR),
                           [cv2.IMWRITE_JPEG_QUALITY, quality])
    assert ok
    ref = cv2.cvtColor(cv2.imdecode(enc, cv2.IMREAD_COLOR),
                       cv2.COLOR_BGR2RGB).astype(np.int32)

    err_ref = np.abs(ref - img_u8.astype(np.int32)).mean()
    err_ours_vs_cv2 = np.abs(ours_u8 - ref).mean()
    # our reconstruction stays closer to cv2's JPEG than the JPEG is to the
    # original: same artifact, not a different op
    assert err_ours_vs_cv2 < max(1.5 * err_ref, 2.0), \
        (err_ours_vs_cv2, err_ref)


def test_jpeg_degrades_monotonically_with_quality():
    from fac_fake_tpu.data.augment import jpeg_compress
    rng = np.random.default_rng(4)
    img = jnp.asarray(_face_like(rng).astype(np.float32) / 255.0)
    errs = [float(jnp.abs(jpeg_compress(img, jnp.float32(q)) - img).mean())
            for q in (95, 75, 40)]
    assert errs[0] < errs[1] < errs[2], errs


# --- pipeline integration ----------------------------------------------------

def test_augment_batch_with_new_ops_jits():
    from fac_fake_tpu.core.config import AugmentConfig
    from fac_fake_tpu.data.augment import augment_batch
    cfg = AugmentConfig(clahe=True, image_compression=True)
    batch = np.random.default_rng(5).integers(
        0, 255, (2, 224, 224, 3), dtype=np.uint8)
    out = jax.jit(lambda k, b: augment_batch(k, b, cfg))(
        jax.random.key(0), jnp.asarray(batch))
    assert out.shape == batch.shape
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


# --- S3D train-transform extras ---------------------------------------------

def test_gaussian_blur_kernel_matches_cv2():
    import cv2
    from fac_fake_tpu.data.augment import _conv3x3
    rng = np.random.default_rng(6)
    img_u8 = _face_like(rng)
    img = jnp.asarray(img_u8.astype(np.float32) / 255.0)
    g = jnp.asarray([0.25, 0.5, 0.25], jnp.float32)
    ours = np.asarray(_conv3x3(img, g[:, None] * g[None, :])) * 255.0
    ref = cv2.GaussianBlur(img_u8.astype(np.float32), (3, 3), 0)  # sigma auto=0.8
    # interior only (border handling differs: zero-pad vs reflect)
    np.testing.assert_allclose(ours[2:-2, 2:-2], ref[2:-2, 2:-2], atol=0.35)


def test_fancy_pca_matches_reference_algorithm():
    from fac_fake_tpu.data.augment import augment_image
    from fac_fake_tpu.core.config import AugmentConfig

    rng = np.random.default_rng(7)
    img_u8 = _face_like(rng)
    img01 = img_u8.astype(np.float32) / 255.0

    # reference math (albumentations fancy_pca): eigendecompose the RGB
    # covariance, shift every pixel by evecs @ (alpha * evals)
    flat = img01.reshape(-1, 3)
    c = flat - flat.mean(0)
    evals, evecs = np.linalg.eigh(c.T @ c / flat.shape[0])

    cfg = AugmentConfig(enabled=True, prob=1.0, compose_prob=1.0,
                        fancy_pca=True, sharpen_oneof=False,
                        hflip=False, vflip=False, rot90=False, transpose=False,
                        gauss_noise=False, sharpen=False, emboss=False,
                        brightness_contrast=False, hue_saturation=False,
                        color_jitter=False, clahe=False, rotation_deg=0.0)
    out = np.asarray(augment_image(jax.random.key(3), jnp.asarray(img01), cfg))
    delta = out - img01
    # the shift is a single global RGB vector (before clipping)
    interior = np.abs(out - 1.0) > 1e-6
    d = delta.reshape(-1, 3)[interior.reshape(-1, 3).all(axis=1)]
    assert d.shape[0] > 1000
    np.testing.assert_allclose(d.std(axis=0), 0.0, atol=1e-5)  # constant shift
    # and that vector lies in the span scaled by eigenvalues: reconstruct
    # alphas and check plausibility |alpha| < 5 sigma
    vec = d.mean(axis=0)
    alphas = vec @ evecs / np.maximum(evals, 1e-12)
    assert np.all(np.abs(alphas) < 0.5), alphas


def test_to_gray_prob_is_random():
    from fac_fake_tpu.data.augment import augment_image
    from fac_fake_tpu.core.config import AugmentConfig
    rng = np.random.default_rng(8)
    img = jnp.asarray(_face_like(rng).astype(np.float32) / 255.0)
    cfg = AugmentConfig(enabled=True, prob=0.0, compose_prob=1.0,
                        to_gray_prob=0.5, sharpen_oneof=False,
                        clahe=False, rotation_deg=0.0)
    grays = 0
    for i in range(20):
        out = np.asarray(augment_image(jax.random.key(i), img, cfg))
        if np.allclose(out[..., 0], out[..., 1]):
            grays += 1
    assert 3 <= grays <= 17   # ~Binomial(20, .5)


def test_color_oneof_mutual_exclusion():
    """OneOf(bc, pca, hsv) p=.4: at most one color op fires per draw, and
    ~40% of draws fire at all (`deepfakes_dataset.py:44`)."""
    from fac_fake_tpu.data.augment import augment_image
    from fac_fake_tpu.core.config import AugmentConfig
    rng = np.random.default_rng(9)
    img = jnp.asarray(_face_like(rng).astype(np.float32) / 255.0)
    base = AugmentConfig(enabled=True, prob=1.0, compose_prob=1.0,
                         color_oneof=True, fancy_pca=True,
                         hflip=False, vflip=False, rot90=False,
                         transpose=False, gauss_noise=False, sharpen=False,
                         emboss=False, clahe=False, rotation_deg=0.0,
                         hue_saturation=True, color_jitter=False,
                         brightness_contrast=True)
    fired = 0
    for i in range(30):
        out = np.asarray(augment_image(jax.random.key(100 + i), img, base))
        if not np.allclose(out, np.asarray(img), atol=1e-6):
            fired += 1
    # ~Binomial(30, .4): loose 3-sigma band
    assert 4 <= fired <= 21, fired


def test_sharpen_oneof_group_rate():
    """strong_aug's OneOf([CLAHE, Sharpen, Emboss, BrightnessContrast], p=.2)
    (`augmentation.py:19-24`): the group fires ~20% of draws — each member
    effectively ~5%, NOT an independent coin per op (which at the old
    cfg.prob=.5 fired ~94% of draws and applied CLAHE 10× too often)."""
    from fac_fake_tpu.data.augment import augment_image
    from fac_fake_tpu.core.config import AugmentConfig
    rng = np.random.default_rng(10)
    img = jnp.asarray(_face_like(rng).astype(np.float32) / 255.0)
    cfg = AugmentConfig(enabled=True, compose_prob=1.0,
                        sharpen_oneof=True, clahe=True, sharpen=True,
                        emboss=True, brightness_contrast=True,
                        hflip=False, vflip=False, rot90=False, transpose=False,
                        gauss_noise=False, hue_saturation=False,
                        color_jitter=False, rotation_deg=0.0)
    fired = 0
    for i in range(60):
        out = np.asarray(augment_image(jax.random.key(500 + i), img, cfg))
        if not np.allclose(out, np.asarray(img), atol=1e-6):
            fired += 1
    # ~Binomial(60, .2): loose band — and far below the 4-independent-coin
    # rate (~56/60)
    assert 4 <= fired <= 24, fired


def test_subset_clahe_matches_inline_semantics():
    """The batch path gathers the rare CLAHE takers into a fixed-K subset
    (OneOf fires ~5%; equalizing all B images is pure waste). Semantics must
    be unchanged: takers get exactly `clahe_luma`, everyone else is
    bit-identical to the non-CLAHE pipeline."""
    from fac_fake_tpu.data.augment import augment_batch, clahe_luma
    from fac_fake_tpu.core.config import AugmentConfig
    rng = np.random.default_rng(12)
    batch = rng.integers(0, 255, (64, 32, 32, 3), dtype=np.uint8)
    base = batch.astype(np.float32) / 255.0
    kw = dict(enabled=True, compose_prob=1.0, sharpen_oneof=True,
              sharpen_oneof_prob=1.0, hflip=False, vflip=False, rot90=False,
              transpose=False, gauss_noise=False, sharpen=False, emboss=False,
              brightness_contrast=False, hue_saturation=False,
              color_jitter=False, rotation_deg=0.0)
    out = np.asarray(augment_batch(jax.random.key(7), jnp.asarray(batch),
                                   AugmentConfig(clahe=True, **kw)))
    changed = ~np.isclose(out, base, atol=1e-6).all(axis=(1, 2, 3))
    # group fires 100%, pick==clahe 1/4 → ~16 takers of 64
    assert 5 <= changed.sum() <= 30, changed.sum()
    for i in np.where(changed)[0]:
        eq = np.asarray(clahe_luma(jnp.asarray(base[i]), 2.0))
        np.testing.assert_allclose(out[i], eq, atol=1e-5)
    np.testing.assert_allclose(out[~changed], base[~changed], atol=1e-7)


def test_compose_prob_gates_everything():
    """The outer Compose(p=…) coin (strong_aug is built with p=0.9,
    `augmentation.py:49`): at compose_prob=0 the chain is an exact no-op
    even with every per-op prob forced to 1."""
    from fac_fake_tpu.data.augment import augment_batch
    from fac_fake_tpu.core.config import AugmentConfig
    rng = np.random.default_rng(11)
    batch = rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8)
    cfg = AugmentConfig(enabled=True, compose_prob=0.0, prob=1.0,
                        hflip_prob=1.0, vflip_prob=1.0, rot90_prob=1.0,
                        transpose_prob=1.0, noise_prob=1.0, hsv_prob=1.0,
                        affine_prob=1.0, to_gray_prob=1.0,
                        image_compression=True, compression_prob=1.0)
    out = np.asarray(augment_batch(jax.random.key(0), jnp.asarray(batch), cfg))
    np.testing.assert_allclose(out, batch.astype(np.float32) / 255.0,
                               atol=1e-6)
