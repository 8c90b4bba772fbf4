"""Video decode and frame-sampling policies (host side).

Re-designs `/root/reference/CViT-main/helpers/helpers_read_video_1.py` plus
the ad-hoc sampling loops scattered through the predictors/trainers
(SURVEY.md §L1). Decoding is CPU work (cv2); everything downstream is
device-side. Index *policies* are pure functions so the exact frame choices
of every reference code path are reproducible:

  * `evenly_spaced_indices` — `read_frames` (`helpers_read_video_1.py:22-48`)
  * `random_indices`        — `read_random_frames` (`:50-69`)
  * `predict_indices`       — the CViT predictor's seek-by-5 loop, including
    its duplicated frame 0 (`cvit_prediction.py:160-198`; SURVEY.md §8.10 —
    replicate the indices, not the mechanism)
  * `first_n_indices` / `strided_indices` — S3D snippet policies
    (`S3D-train.py:133-148`, `S3D-train-GPUs.py:178-193`)
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np


def evenly_spaced_indices(frame_count: int, num_frames: int, jitter: int = 0,
                          seed: Optional[int] = None) -> np.ndarray:
    idxs = np.linspace(0, frame_count - 1, num_frames, endpoint=True).astype(np.int64)
    if jitter > 0:
        rng = np.random.RandomState(seed)
        idxs = np.clip(idxs + rng.randint(-jitter, jitter, len(idxs)), 0,
                       frame_count - 1)
    return idxs


def random_indices(frame_count: int, num_frames: int,
                   seed: Optional[int] = None) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return np.sort(rng.choice(np.arange(frame_count), num_frames))


def predict_indices(frame_count: int, fraction: float = 0.1,
                    jump: int = 5) -> List[int]:
    """The reference predictor reads the frame at the current position and
    *then* seeks, so iteration 1 and 2 both hit frame 0; afterwards the
    position advances by `jump`. Iterations = int(fraction · frame_count)."""
    n = int(frame_count * fraction)
    out: List[int] = []
    for k in range(n):
        idx = 0 if k == 0 else jump * (k - 1)
        if idx >= frame_count:
            break
        out.append(idx)
    return out


def first_n_indices(frame_count: int, n: int = 20) -> List[int]:
    return list(range(min(n, frame_count)))


def strided_indices(frame_count: int, limit: int = 200, stride: int = 10) -> List[int]:
    return list(range(0, min(limit, frame_count), stride))


class VideoReader:
    """Streaming decoder: grab/retrieve over the sorted index list
    (duplicates allowed — each duplicate re-emits the decoded frame), BGR→RGB,
    optional inset cropping. Returns (frames (N,H,W,3) uint8 RGB, indices) or
    None on failure — matching the reference's error contract."""

    def __init__(self, verbose: bool = False, insets: Tuple[float, float] = (0.0, 0.0)):
        self.verbose = verbose
        self.insets = insets

    def frame_count(self, path: str) -> int:
        import cv2
        cap = cv2.VideoCapture(path)
        n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        cap.release()
        return n

    def read_frames(self, path: str, num_frames: int, jitter: int = 0,
                    seed: Optional[int] = None):
        n = self.frame_count(path)
        if n <= 0:
            return None
        return self.read_frames_at_indices(
            path, evenly_spaced_indices(n, num_frames, jitter, seed))

    def read_random_frames(self, path: str, num_frames: int,
                           seed: Optional[int] = None):
        n = self.frame_count(path)
        if n <= 0:
            return None
        return self.read_frames_at_indices(path, random_indices(n, num_frames, seed))

    def read_middle_frame(self, path: str):
        n = self.frame_count(path)
        if n <= 0:
            return None
        return self.read_frames_at_indices(path, [n // 2])

    def read_frame_at_index(self, path: str, idx: int):
        return self.read_frames_at_indices(path, [idx])

    def read_frames_at_indices(self, path: str, frame_idxs: Sequence[int]):
        import cv2
        if len(frame_idxs) == 0:
            return None
        cap = cv2.VideoCapture(path)
        try:
            wanted = list(frame_idxs)
            frames, read_idxs = [], []
            decoded = None          # retrieved frame at decoded_idx, if any
            decoded_idx = -1        # index of the last grabbed frame
            failed = False
            for want in wanted:
                assert want >= decoded_idx, "frame indices must be sorted"
                while decoded_idx < want:
                    if not cap.grab():
                        failed = True
                        break
                    decoded_idx += 1
                    decoded = None
                if failed:
                    break
                if decoded is None:
                    ok, frame = cap.retrieve()
                    if not ok or frame is None:
                        break
                    decoded = self._postprocess(frame)
                frames.append(decoded)
                read_idxs.append(want)
            if frames:
                return np.stack(frames), read_idxs
            if self.verbose:
                print(f"No frames read from {path}")
            return None
        except Exception:
            if self.verbose:
                print(f"Exception while reading {path}")
            return None
        finally:
            cap.release()

    def _postprocess(self, frame: np.ndarray) -> np.ndarray:
        import cv2
        frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
        if self.insets[0] > 0:
            p = int(frame.shape[1] * self.insets[0])
            frame = frame[:, p:-p]
        if self.insets[1] > 0:
            q = int(frame.shape[0] * self.insets[1])
            frame = frame[q:-q]
        return frame
