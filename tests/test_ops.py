"""Device-side ops: input normalize, matmul bilinear crop-resize."""
import numpy as np
import pytest


def test_normalize_matches_reference_formula():
    import jax.numpy as jnp
    from fac_fake_tpu.ops.preprocess import (IMAGENET_MEAN, IMAGENET_STD,
                                             normalize_imagenet)

    rng = np.random.default_rng(0)
    x = rng.integers(0, 255, (2, 32, 16, 3), dtype=np.uint8)
    out = np.asarray(normalize_imagenet(jnp.asarray(x)))
    ref = (x.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)
    # odd shapes too (no tiling constraints on this path)
    y = rng.integers(0, 255, (1, 13, 7, 3), dtype=np.uint8)
    out = np.asarray(normalize_imagenet(jnp.asarray(y)))
    assert out.shape == y.shape and out.dtype == np.float32


def test_resize_bilinear_matches_jax_image():
    import jax
    import jax.numpy as jnp
    from fac_fake_tpu.ops.resize import resize_bilinear

    rng = np.random.default_rng(0)
    img = rng.random((2, 48, 64, 3)).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(img), (24, 32)))
    ref = np.asarray(jax.image.resize(jnp.asarray(img), (2, 24, 32, 3),
                                      "bilinear", antialias=False))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_crop_resize_full_box_equals_resize():
    import jax.numpy as jnp
    from fac_fake_tpu.ops.resize import crop_resize_bilinear, resize_bilinear

    rng = np.random.default_rng(1)
    frame = rng.random((60, 80, 3)).astype(np.float32)
    boxes = np.array([[0, 0, 60, 80], [10, 20, 50, 60]], np.float32)
    crops = np.asarray(crop_resize_bilinear(jnp.asarray(frame),
                                            jnp.asarray(boxes), (32, 32)))
    assert crops.shape == (2, 32, 32, 3)
    full = np.asarray(resize_bilinear(jnp.asarray(frame[None]), (32, 32)))[0]
    np.testing.assert_allclose(crops[0], full, rtol=1e-5, atol=1e-5)
    # sub-box crop equals resizing the numpy slice
    sub = np.asarray(resize_bilinear(
        jnp.asarray(frame[10:50, 20:60][None]), (32, 32)))[0]
    np.testing.assert_allclose(crops[1], sub, rtol=1e-5, atol=1e-5)


def test_random_sized_crop_non_empty_mask():
    """`RandomSizedCropNonEmptyMaskIfExists` semantics (albu.py:60-101): the
    crop always contains mask pixels when the mask is non-empty; sizes obey
    min_max_height x w2h_ratio; empty masks degrade to a uniform crop."""
    from fac_fake_tpu.ops.resize import random_sized_crop_non_empty_mask

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (80, 120, 3), dtype=np.uint8)
    mask = np.zeros((80, 120), np.uint8)
    mask[50:55, 100:108] = 1                      # small off-center blob

    for _ in range(50):
        ic, mc, (x0, y0, x1, y1) = random_sized_crop_non_empty_mask(
            img, mask, (0.3, 0.6), rng=rng)
        assert mc.sum() > 0                       # non-empty-mask guarantee
        assert ic.shape[:2] == mc.shape == (y1 - y0, x1 - x0)
        assert 0 <= y0 < y1 <= 80 and 0 <= x0 < x1 <= 120
        ch = y1 - y0
        assert int(80 * 0.3) - 1 <= ch <= int(80 * 0.6)
        # width respects the w2h ratio band around the sampled height
        assert (x1 - x0) <= int(ch * 1.3)
        np.testing.assert_array_equal(ic, img[y0:y1, x0:x1])

    empty = np.zeros((80, 120), np.uint8)
    ic, mc, (x0, y0, x1, y1) = random_sized_crop_non_empty_mask(
        img, empty, (0.5, 0.5), rng=rng)
    assert mc.sum() == 0 and ic.shape[:2] == (y1 - y0, x1 - x0)
    assert 0 <= y0 < y1 <= 80 and 0 <= x0 < x1 <= 120
