"""Offline preprocessing (data/preprocess.py) vs reference semantics.

Covers: DFDC part→split routing (`extractfaces.py:44-55`), one-fake-per-
original dedup (`:138-147`), 85/15 shuffled split (`shufft_image.py:10-46`),
constant-label metadata builder (`figure/video_to_label.py`), and a REAL
end-to-end crop-folder extraction from a reference sample video through the
actual BlazeFace detector (the sx two-stage equivalent,
`detect_faces.py` + `extract_crops.py`).
"""
import json
import os

import numpy as np
import pytest

SAMPLES = "/root/reference/CViT-main/sample__prediction_data"


def test_dfdc_part_split_routing():
    from fac_fake_tpu.data.preprocess import dfdc_part_split
    assert dfdc_part_split(0) == "train"
    assert dfdc_part_split(39) == "train"
    assert dfdc_part_split(40) == "validation"
    assert dfdc_part_split(44) == "validation"
    assert dfdc_part_split(45) == "test"
    assert dfdc_part_split(49) == "test"


def test_filter_unique_fakes_one_per_original():
    from fac_fake_tpu.data.preprocess import filter_unique_fakes
    meta = {
        "f1.mp4": {"label": "FAKE", "original": "o1.mp4"},
        "f2.mp4": {"label": "FAKE", "original": "o1.mp4"},   # dup original
        "f3.mp4": {"label": "FAKE", "original": "o2.mp4"},
        "r1.mp4": {"label": "REAL"},
        "r2.mp4": {"label": "REAL"},
    }
    kept = filter_unique_fakes(meta)
    assert "f1.mp4" in kept and "f3.mp4" in kept
    assert "f2.mp4" not in kept                  # second fake of o1 dropped
    assert {"r1.mp4", "r2.mp4"} <= set(kept)     # reals always kept


def test_shuffle_split_fraction_and_determinism(tmp_path):
    from fac_fake_tpu.data.preprocess import shuffle_split
    src = tmp_path / "src"
    src.mkdir()
    for i in range(20):
        (src / f"{i:02d}.jpg").write_bytes(b"x" * (i + 1))
    shuffle_split(str(src), str(tmp_path / "a"), str(tmp_path / "b"),
                  fraction=0.85, seed=0)
    a = sorted(os.listdir(tmp_path / "a"))
    b = sorted(os.listdir(tmp_path / "b"))
    assert len(a) == 17 and len(b) == 3          # 85/15 of 20
    assert set(a) | set(b) == {f"{i:02d}.jpg" for i in range(20)}
    assert not (set(a) & set(b))
    # deterministic under the same seed
    shuffle_split(str(src), str(tmp_path / "a2"), str(tmp_path / "b2"),
                  fraction=0.85, seed=0)
    assert sorted(os.listdir(tmp_path / "a2")) == a


def test_build_metadata_constant_label(tmp_path):
    from fac_fake_tpu.data.preprocess import build_metadata_for_folder
    for n in ("x.mp4", "y.mp4", "skip.txt"):
        (tmp_path / n).write_bytes(b"")
    out = tmp_path / "meta.json"
    meta = build_metadata_for_folder(str(tmp_path), "fake", str(out))
    assert meta == {"x.mp4": {"label": "FAKE"}, "y.mp4": {"label": "FAKE"}}
    assert json.load(open(out)) == meta


@pytest.mark.skipif(not os.path.isdir(SAMPLES), reason="reference not mounted")
def test_extract_video_crop_folders_end_to_end(tmp_path):
    import cv2
    from fac_fake_tpu.data.preprocess import extract_video_crop_folders

    # one small sample video into its own dir
    src = tmp_path / "videos"
    src.mkdir()
    import shutil
    shutil.copy2(os.path.join(SAMPLES, "sample_2.mp4"), src / "sample_2.mp4")

    out = tmp_path / "crops"
    extract_video_crop_folders(str(src), str(out), frames_per_video=4,
                               size=224)
    vid_dir = out / "sample_2"
    assert vid_dir.is_dir()
    crops = sorted(os.listdir(vid_dir))
    assert crops, "no crops written"
    # crop naming {frame}_{face}.png (`extract_crops.py:22-81` scheme)
    for c in crops:
        stem, ext = os.path.splitext(c)
        assert ext == ".png"
        f, j = stem.split("_")
        int(f), int(j)
    img = cv2.imread(str(vid_dir / crops[0]))
    assert img.shape == (224, 224, 3)
    assert img.std() > 5                          # actual face content
