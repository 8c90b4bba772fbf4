"""Offline face-crop dataset construction.

Re-designs the reference's preprocessing scripts:
  * `CViT-main/preprocessing/extractfaces.py` — DFDC part walking with
    part-number split routing (`:44-55`), one-fake-per-original dedup
    (`filter_unique_files`, `:138-147`), per-video BlazeFace extraction of 10
    random frames → best face → 224² JPEG q75 crops (`:100-135`);
  * `extractfaces_ff.py` — flat-folder FF++ variant;
  * `shufft_image.py` — 85/15 shuffled split copy;
  * the sx two-stage pipeline (`preprocessing/detect_faces.py` boxes-JSON
    pass + `extract_crops.py` crop pass) collapses into one device-batched
    detector call per video here — the JSON interchange only existed to split
    work across two CPU processes.
"""
from __future__ import annotations

import json
import os
import random
import shutil
from typing import Dict, List, Optional



def dfdc_part_split(part: int) -> str:
    """Part-number ranges → split (`extractfaces.py:44-55` routing)."""
    if part < 40:
        return "train"
    if part < 45:
        return "validation"
    return "test"


def filter_unique_fakes(metadata: Dict[str, dict]) -> List[str]:
    """Keep one fake per original plus all reals (`extractfaces.py:138-147`)."""
    seen = set()
    out = []
    for name, entry in sorted(metadata.items()):
        if str(entry.get("label", "")).upper() == "FAKE":
            orig = entry.get("original")
            if orig in seen:
                continue
            seen.add(orig)
        out.append(name)
    return out


def extract_faces_from_video(video_path: str, out_dir: str, prefix: str,
                             num_frames: int = 10, size: int = 224,
                             quality: int = 75, detector=None,
                             seed: Optional[int] = None) -> int:
    """BlazeFace over `num_frames` random frames → best face per frame →
    `size`² JPEG q`quality` crops. Returns number of crops written."""
    import cv2
    from fac_fake_tpu.data.video import VideoReader
    from fac_fake_tpu.detect.extractor import FaceExtractor

    reader = VideoReader()
    extractor = FaceExtractor(
        lambda p: reader.read_random_frames(p, num_frames, seed=seed), detector)
    frames = extractor.process_video(video_path)
    if not frames:
        return 0
    extractor.keep_only_best_face(frames)
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for fd in frames:
        for face in fd["faces"]:
            if face.size == 0:
                continue
            crop = cv2.resize(face, (size, size), interpolation=cv2.INTER_AREA)
            path = os.path.join(out_dir, f"{prefix}_{fd['frame_idx']}.jpg")
            cv2.imwrite(path, cv2.cvtColor(crop, cv2.COLOR_RGB2BGR),
                        [cv2.IMWRITE_JPEG_QUALITY, quality])
            n += 1
    return n


def extract_dfdc(parts_root: str, out_root: str, num_frames: int = 10,
                 size: int = 224, detector=None, verbose: bool = True):
    """Walk dfdc_train_part_* dirs, route splits, dedup fakes, extract."""
    if detector is None:
        from fac_fake_tpu.detect.blazeface import BlazeFace
        detector = BlazeFace.from_reference_assets()
    for d in sorted(os.listdir(parts_root)):
        if not d.startswith("dfdc_train_part_"):
            continue
        part = int(d.rsplit("_", 1)[1])
        split = dfdc_part_split(part)
        part_dir = os.path.join(parts_root, d)
        meta_path = os.path.join(part_dir, "metadata.json")
        if not os.path.isfile(meta_path):
            continue
        with open(meta_path) as f:
            metadata = json.load(f)
        for name in filter_unique_fakes(metadata):
            label = "fake" if str(metadata[name]["label"]).upper() == "FAKE" \
                else "real"
            out_dir = os.path.join(out_root, split, label)
            try:
                n = extract_faces_from_video(
                    os.path.join(part_dir, name), out_dir,
                    prefix=os.path.splitext(name)[0],
                    num_frames=num_frames, size=size, detector=detector)
                if verbose:
                    print(f"{split}/{label}/{name}: {n} crops")
            except Exception as e:  # per-video fault tolerance (:91-95)
                print(f"skip {name}: {e}")


def extract_flat(videos_dir: str, out_dir: str, label: str,
                 num_frames: int = 10, size: int = 224, detector=None):
    """FF++-style flat folder of mp4s, one label (`extractfaces_ff.py`)."""
    if detector is None:
        from fac_fake_tpu.detect.blazeface import BlazeFace
        detector = BlazeFace.from_reference_assets()
    target = os.path.join(out_dir, label)
    for name in sorted(os.listdir(videos_dir)):
        if not name.endswith(".mp4"):
            continue
        try:
            extract_faces_from_video(os.path.join(videos_dir, name), target,
                                     prefix=os.path.splitext(name)[0],
                                     num_frames=num_frames, size=size,
                                     detector=detector)
        except Exception as e:
            print(f"skip {name}: {e}")


def extract_video_crop_folders(videos_dir: str, out_root: str,
                               frames_per_video: int = 30, size: int = 224,
                               detector=None):
    """sx-pipeline equivalent: per-video crop FOLDERS for the S3D clip
    dataset (`detect_faces.py` + `extract_crops.py`, single pass)."""
    import cv2
    from fac_fake_tpu.data.video import VideoReader, evenly_spaced_indices
    from fac_fake_tpu.detect.extractor import FaceExtractor

    if detector is None:
        from fac_fake_tpu.detect.blazeface import BlazeFace
        detector = BlazeFace.from_reference_assets()
    reader = VideoReader()
    for name in sorted(os.listdir(videos_dir)):
        if not name.endswith(".mp4"):
            continue
        vid = os.path.splitext(name)[0]
        out_dir = os.path.join(out_root, vid)
        try:
            n = reader.frame_count(os.path.join(videos_dir, name))
            idxs = evenly_spaced_indices(n, min(frames_per_video, n))
            result = reader.read_frames_at_indices(
                os.path.join(videos_dir, name), list(idxs))
            if result is None:
                continue
            frames, read = result
            extractor = FaceExtractor(None, detector)
            data = extractor.process_frames(frames, read)
            extractor.keep_only_best_face(data)
            os.makedirs(out_dir, exist_ok=True)
            for i, fd in enumerate(data):
                for j, face in enumerate(fd["faces"]):
                    if face.size == 0:
                        continue
                    crop = cv2.resize(face, (size, size),
                                      interpolation=cv2.INTER_AREA)
                    cv2.imwrite(os.path.join(out_dir, f"{fd['frame_idx']}_{j}.png"),
                                cv2.cvtColor(crop, cv2.COLOR_RGB2BGR))
        except Exception as e:
            print(f"skip {name}: {e}")


def shuffle_split(src_dir: str, out_a: str, out_b: str,
                  fraction: float = 0.85, seed: int = 0):
    """85/15 shuffled copy (`shufft_image.py:10-46`)."""
    files = sorted(os.listdir(src_dir))
    random.Random(seed).shuffle(files)
    cut = int(len(files) * fraction)
    for dst, chunk in ((out_a, files[:cut]), (out_b, files[cut:])):
        os.makedirs(dst, exist_ok=True)
        for f in chunk:
            shutil.copy2(os.path.join(src_dir, f), os.path.join(dst, f))


def build_metadata_for_folder(videos_dir: str, label: str, out_path: str):
    """metadata.json with a constant label (`figure/video_to_label.py`)."""
    meta = {name: {"label": label.upper()}
            for name in sorted(os.listdir(videos_dir)) if name.endswith(".mp4")}
    with open(out_path, "w") as f:
        json.dump(meta, f, indent=1)
    return meta
