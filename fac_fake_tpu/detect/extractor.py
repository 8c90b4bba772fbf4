"""Face extraction orchestration: frames → tiles → batched BlazeFace →
frame-space detections → face crops.

Re-designs `/root/reference/CViT-main/helpers/helpers_face_extract_1.py`
(371 LoC of per-frame Python loops) into one device-side pipeline:

  * tiling geometry (`_tile_frames`, `:139-208`): square `min(H,W)` windows,
    3 across for landscape, 1 for portrait — host cv2 INTER_AREA resize to
    128×128 (tiles are small: detector upload is ~50 KB/tile);
  * detection + anchor decode run as ONE jitted batch over
    frames × tiles (`process_videos`' batch concat, `:23-131`);
  * tile→frame coordinate mapping (`_resize_detections`/`_untile_detections`,
    `:210-278`) is a vectorized affine: box coords scale by `split_size`,
    then per-tile offsets — boxes are (y,x) ordered, keypoints (x,y);
  * per-frame weighted NMS over all tiles' anchors in one vmapped scan;
  * margin expansion with 2× top margin for foreheads
    (`_add_margin_to_detections`, `:280-299`) fused into the same jit.

Crop pixel extraction stays on host (variable-size slices of the original
frames, parity with cv2 semantics).
"""
from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fac_fake_tpu.detect.blazeface import BlazeFace, weighted_nms

MAX_FACES = 8


def tile_geometry(h: int, w: int) -> Tuple[int, int, List[Tuple[int, int]]]:
    """split_size, num_tiles, [(y_off, x_off)] — `_tile_frames:187-191`."""
    split = min(h, w)
    x_step = (w - split) // 2
    num_h = 3 if w > h else 1
    offsets = [(0, x_step * i) for i in range(num_h)]
    return split, num_h, offsets


def make_tiles(frames: np.ndarray, target: int = 128) -> Tuple[np.ndarray, int, np.ndarray]:
    """(F, H, W, 3) uint8 → (F·T, 128, 128, 3) uint8 + split_size + offsets.

    One INTER_AREA resize per *frame* (so the `split`-sized window lands at
    `target` px), then the T overlapping tiles are contiguous crops of the
    downscaled frame. Per-tile resizes of large non-contiguous frame views
    were ~10 ms each (~3 s per 384-tile batch) — ~3× the work plus internal
    copies; tile windows shift by ≤ half a source pixel from rounding, well
    inside the detector's tolerance (boxes stay in original frame coords)."""
    import cv2
    f, h, w, _ = frames.shape
    split, num_t, offsets = tile_geometry(h, w)
    scale = target / split
    rh = max(target, int(round(h * scale)))
    rw = max(target, int(round(w * scale)))
    tiles = np.empty((f * num_t, target, target, 3), np.uint8)
    i = 0
    for fi in range(f):
        small = cv2.resize(frames[fi], (rw, rh),
                           interpolation=cv2.INTER_AREA)
        for (y, x) in offsets:
            ys = min(int(round(y * scale)), rh - target)
            xs = min(int(round(x * scale)), rw - target)
            tiles[i] = small[ys:ys + target, xs:xs + target]
            i += 1
    return tiles, split, np.asarray(offsets, np.float32)


@functools.partial(jax.jit, static_argnames=("num_tiles", "margin"))
def _frame_detections(dets: jnp.ndarray, valid: jnp.ndarray, split: jnp.ndarray,
                      offsets: jnp.ndarray, frame_hw: jnp.ndarray,
                      num_tiles: int, margin: float = 0.2):
    """(F·T, 896, 17) tile detections → per-frame (F, MAX_FACES, 17) in frame
    coordinates with margins applied, plus validity mask."""
    ft = dets.shape[0]
    f = ft // num_tiles
    dets = dets.reshape(f, num_tiles, -1, 17)
    valid = valid.reshape(f, num_tiles, -1)

    y_off = offsets[:, 0][None, :, None]
    x_off = offsets[:, 1][None, :, None]
    # boxes: even idx = y, odd = x (`_resize_detections:226-229` then
    # `_untile_detections:264-269`); keypoints: even = x, odd = y.
    box_y = dets[..., 0:4:2] * split + y_off[..., None]
    box_x = dets[..., 1:4:2] * split + x_off[..., None]
    kp_x = dets[..., 4:16:2] * split + x_off[..., None]
    kp_y = dets[..., 5:16:2] * split + y_off[..., None]

    out = jnp.zeros_like(dets)
    out = out.at[..., 0:4:2].set(box_y).at[..., 1:4:2].set(box_x)
    out = out.at[..., 4:16:2].set(kp_x).at[..., 5:16:2].set(kp_y)
    out = out.at[..., 16].set(dets[..., 16])

    flat = out.reshape(f, -1, 17)
    flat_valid = valid.reshape(f, -1)
    faces, mask = jax.vmap(functools.partial(weighted_nms, max_out=MAX_FACES))(
        flat, flat_valid)

    # margin expansion (2× above the forehead)
    off = jnp.round(margin * (faces[:, :, 2] - faces[:, :, 0]))
    fh, fw = frame_hw[0], frame_hw[1]
    faces = faces.at[:, :, 0].set(jnp.clip(faces[:, :, 0] - off * 2, 0))
    faces = faces.at[:, :, 1].set(jnp.clip(faces[:, :, 1] - off, 0))
    faces = faces.at[:, :, 2].set(jnp.minimum(faces[:, :, 2] + off, fh))
    faces = faces.at[:, :, 3].set(jnp.minimum(faces[:, :, 3] + off, fw))
    return faces, mask


class FaceExtractor:
    """frames → face crops. `video_read_fn` as in the reference
    (`helpers_face_extract_1.py:10-21`)."""

    def __init__(self, video_read_fn, detector: Optional[BlazeFace] = None):
        self.video_read_fn = video_read_fn
        self.detector = detector or BlazeFace.from_reference_assets()

    def process_video(self, video_path: str):
        result = self.video_read_fn(video_path)
        if result is None:
            return []
        frames, idxs = result
        return self.process_frames(frames, idxs)

    # pad the frame axis to one of these so the detection graph (including
    # the vmapped-NMS `_frame_detections`, whose scan is expensive to
    # compile through the remote compiler) sees only a handful of shapes.
    # A plain multiple-of-8 round-up recompiled on nearly every video
    # (~10-90 s each cold): the frame bucket must be as coarse as the
    # detector's BATCH_BUCKETS.
    FRAME_BUCKETS = (8, 16, 32, 64, 128)

    @staticmethod
    def _frame_bucket(f: int) -> int:
        for b in FaceExtractor.FRAME_BUCKETS:
            if f <= b:
                return b
        return -(-f // 128) * 128

    def process_frames(self, frames: np.ndarray, idxs=None):
        """Returns the reference's list-of-frame-dict structure
        (video_idx omitted): frame_idx, frame_w/h, faces, scores."""
        f, h, w, _ = frames.shape
        idxs = list(range(f)) if idxs is None else idxs
        fpad = self._frame_bucket(f)
        tiles, split, offsets = make_tiles(frames)
        num_tiles = len(offsets)
        if fpad != f:
            # pad the frame axis at TILE granularity (128² zeros, not
            # full-resolution zero frames — hundreds of MB on 1080p inputs)
            tiles = np.concatenate(
                [tiles, np.zeros(((fpad - f) * num_tiles, *tiles.shape[1:]),
                                 tiles.dtype)], axis=0)

        dets, valid = self.detector.predict_on_batch(tiles, apply_nms=False)
        faces, mask = _frame_detections(
            dets, valid, jnp.float32(split), jnp.asarray(offsets),
            jnp.asarray([h, w], jnp.float32), num_tiles)
        faces = np.asarray(faces)[:f]
        mask = np.asarray(mask)[:f]

        out = []
        for i in range(f):
            crops, scores, boxes = [], [], []
            for j in range(MAX_FACES):
                if not mask[i, j]:
                    continue
                ymin, xmin, ymax, xmax = faces[i, j, :4].astype(int)
                crop = frames[i, ymin:ymax, xmin:xmax]
                if crop.size:
                    crops.append(crop)
                    scores.append(float(faces[i, j, 16]))
                    boxes.append((int(ymin), int(xmin), int(ymax), int(xmax)))
            out.append({"frame_idx": idxs[i], "frame_w": w, "frame_h": h,
                        "faces": crops, "scores": scores, "boxes": boxes})
        return out

    @staticmethod
    def keep_only_best_face(crops):
        """`helpers_face_extract_1.py:347-360` (NMS order is score-desc, so
        face 0 is the most confident)."""
        for fd in crops:
            fd["faces"] = fd["faces"][:1]
            fd["scores"] = fd["scores"][:1]
            if "boxes" in fd:
                fd["boxes"] = fd["boxes"][:1]

    @staticmethod
    def remove_large_crops(crops, pct: float = 0.1):
        """`helpers_face_extract_1.py:319-345`."""
        for fd in crops:
            area = fd["frame_w"] * fd["frame_h"]
            boxes = fd.get("boxes") or [None] * len(fd["faces"])
            keep = [(f, s, b) for f, s, b
                    in zip(fd["faces"], fd["scores"], boxes)
                    if f.shape[0] * f.shape[1] / area < pct]
            fd["faces"] = [f for f, _, _ in keep]
            fd["scores"] = [s for _, s, _ in keep]
            if "boxes" in fd:
                fd["boxes"] = [b for _, _, b in keep]
