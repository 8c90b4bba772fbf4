"""Device-side ops: Pallas fused normalize, matmul bilinear crop-resize."""
import numpy as np
import pytest


def test_pallas_normalize_matches_reference_formula():
    import jax.numpy as jnp
    from fac_fake_tpu.ops.preprocess import (IMAGENET_MEAN, IMAGENET_STD,
                                             pallas_normalize)

    rng = np.random.default_rng(0)
    x = rng.integers(0, 255, (2, 32, 16, 3), dtype=np.uint8)
    out = np.asarray(pallas_normalize(jnp.asarray(x), interpret=True))
    ref = (x.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


def test_normalize_dispatch_fallback():
    import jax.numpy as jnp
    from fac_fake_tpu.ops.preprocess import normalize_imagenet
    x = np.random.randint(0, 255, (1, 13, 7, 3), np.uint8)  # odd shape
    out = np.asarray(normalize_imagenet(jnp.asarray(x)))
    assert out.shape == x.shape and out.dtype == np.float32


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
