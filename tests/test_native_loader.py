"""Native C++ batch JPEG decoder: build, decode parity vs cv2, dataset
integration. Skipped when the toolchain/libjpeg is unavailable (pure-Python
fallback covers those environments)."""
import os

import numpy as np
import pytest


def _native():
    from fac_fake_tpu.data import native_loader
    if not native_loader.available():
        pytest.skip("native decoder not buildable in this environment")
    return native_loader


def _write_jpgs(tmp_path, n=8, size=224):
    import cv2
    rng = np.random.default_rng(0)
    paths = []
    for i in range(n):
        p = str(tmp_path / f"{i}.jpg")
        cv2.imwrite(p, rng.integers(0, 255, (size, size, 3), np.uint8))
        paths.append(p)
    return paths


def test_decode_bit_exact_vs_cv2(tmp_path):
    import cv2
    nl = _native()
    paths = _write_jpgs(tmp_path)
    out, ok = nl.decode_batch(paths, 224)
    assert ok.all()
    for i in (0, 3, 7):
        ref = cv2.cvtColor(cv2.imread(paths[i]), cv2.COLOR_BGR2RGB)
        assert np.array_equal(out[i], ref)  # same libjpeg-turbo → bit-exact


def test_decode_resize_matches_cv2_linear(tmp_path):
    import cv2
    nl = _native()
    paths = _write_jpgs(tmp_path, n=2)
    out, ok = nl.decode_batch(paths, 112)
    ref = cv2.resize(cv2.cvtColor(cv2.imread(paths[0]), cv2.COLOR_BGR2RGB),
                     (112, 112), interpolation=cv2.INTER_LINEAR)
    assert np.abs(out[0].astype(int) - ref.astype(int)).max() <= 1


def test_decode_bad_paths(tmp_path):
    nl = _native()
    paths = _write_jpgs(tmp_path, n=1)
    out, ok = nl.decode_batch([str(tmp_path / "missing.jpg"), paths[0]], 224)
    assert ok.tolist() == [False, True]
    assert (out[0] == 0).all()


def test_folder_dataset_native_path(tmp_path):
    import cv2
    nl = _native()
    for label in ("fake", "real"):
        d = tmp_path / "train" / label
        d.mkdir(parents=True)
        for i in range(4):
            cv2.imwrite(str(d / f"{i}.jpg"),
                        np.full((224, 224, 3), 77, np.uint8))
    from fac_fake_tpu.data.folder import CropFolderDataset
    ds = CropFolderDataset(str(tmp_path / "train"))
    assert ds.use_native
    batch = next(ds.batches(4, shuffle=False))
    assert batch["image"].shape == (4, 224, 224, 3)
    # JPEG of a constant image decodes back to the constant
    assert abs(int(batch["image"][0, 0, 0, 0]) - 77) <= 2
