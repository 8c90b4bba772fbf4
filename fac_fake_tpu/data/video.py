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

    # ffmpeg's many small, seeky reads interact terribly with high-latency
    # network mounts (here: the read-only reference mount — retrieve() was
    # observed to randomly take 10-40 s/video vs 0.1 s from local disk, a
    # ~100× penalty). Files at or below this size are spooled to local tmp
    # with ONE sequential copy before opening. LRU-cached so the usual
    # frame_count → read_frames_at_indices pair costs one copy.
    SPOOL_MAX_BYTES = 512 << 20
    _SPOOL_CACHE = 16

    def __init__(self, verbose: bool = False, insets: Tuple[float, float] = (0.0, 0.0),
                 spool: bool = True):
        self.verbose = verbose
        self.insets = insets
        self.spool = spool
        self._spooled: "dict[str, str]" = {}
        import threading
        self._spool_lock = threading.Lock()

    def _local(self, path: str) -> str:
        """A local filesystem path for `path` (spooled copy when enabled)."""
        if not self.spool:
            return path
        import os
        with self._spool_lock:
            hit = self._spooled.get(path)
        if hit is not None and os.path.exists(hit):
            return hit
        try:
            if os.path.getsize(path) > self.SPOOL_MAX_BYTES:
                return path
            import shutil
            import tempfile
            fd, tmp = tempfile.mkstemp(
                suffix=os.path.splitext(path)[1] or ".mp4",
                prefix="fac_spool_")
            os.close(fd)
            shutil.copyfile(path, tmp)
        except OSError:
            return path
        with self._spool_lock:
            self._spooled[path] = tmp
            while len(self._spooled) > self._SPOOL_CACHE:
                oldest = next(iter(self._spooled))   # dict keeps insert order
                old = self._spooled.pop(oldest)
                try:
                    os.unlink(old)
                except OSError:
                    pass
        return tmp

    def __del__(self):
        import os
        for tmp in getattr(self, "_spooled", {}).values():
            try:
                os.unlink(tmp)
            except OSError:
                pass

    def frame_count(self, path: str) -> int:
        import cv2
        cap = cv2.VideoCapture(self._local(path))
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

    def stream_frames_at_indices(self, path: str, frame_idxs: Sequence[int],
                                 chunk: int = 16, stop=None):
        """Yield `(frames (K,H,W,3) uint8 RGB, read_idxs)` in `chunk`-sized
        groups while keeping the decoder open between groups, so a caller
        can stop early — e.g. the predictor's 29-crop cap
        (`cvit_prediction.py:191-197`): frames past the cap can never affect
        the score, and on a 1-core host their decode dominated the latency
        tail. Closing the generator (break + `.close()`) releases the
        capture. Indices must be sorted; duplicates re-emit the decoded
        frame (the predict policy's doubled frame 0).

        `stop` (optional zero-arg callable) is checked per grab so a
        prefetching wrapper (`ChunkPrefetcher`) can abort a chunk decode
        mid-flight instead of paying for frames past the caller's cap."""
        import cv2
        if len(frame_idxs) == 0:
            return
        cap = cv2.VideoCapture(self._local(path))
        try:
            frames, read_idxs = [], []
            decoded = None          # retrieved frame at decoded_idx, if any
            decoded_idx = -1        # index of the last grabbed frame
            failed = False
            for want in frame_idxs:
                assert want >= decoded_idx, "frame indices must be sorted"
                while decoded_idx < want:
                    if stop is not None and stop():
                        return
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
                if len(frames) >= chunk:
                    yield np.stack(frames), list(read_idxs)
                    frames, read_idxs = [], []
            if frames:
                yield np.stack(frames), read_idxs
        except Exception:
            if self.verbose:
                print(f"Exception while reading {path}")
            return
        finally:
            cap.release()

    def read_frames_at_indices(self, path: str, frame_idxs: Sequence[int]):
        stacks, read_idxs = [], []
        for frames, idxs in self.stream_frames_at_indices(
                path, frame_idxs, chunk=1 << 30):
            stacks.append(frames)
            read_idxs.extend(idxs)
        if not stacks:
            if self.verbose:
                print(f"No frames read from {path}")
            return None
        return (stacks[0] if len(stacks) == 1 else np.concatenate(stacks),
                read_idxs)

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


class ChunkPrefetcher:
    """1-deep background prefetch over a chunk stream: chunk N+1 decodes on
    a worker thread (cv2 releases the GIL) while the consumer runs chunk N's
    detection/upload — through the axon relay those are mostly socket-write
    time, so decode and device work genuinely overlap on a 1-core host
    (measured: decode 58% / detect 34% / score 8% of component time,
    44.6 ms/frame decode; see PARITY.md "video-path breakdown").

    `make_gen(stop)` builds the underlying generator with a cooperative
    stop callable (``VideoReader.stream_frames_at_indices(..., stop=...)``)
    so `close()` aborts an in-flight chunk at frame granularity — the
    29-crop early exit must not pay for a speculative chunk's full decode.
    """

    def __init__(self, make_gen, item_frames=None):
        import queue
        import threading
        self._stop = threading.Event()
        self._q = queue.Queue(maxsize=1)
        self._gen = make_gen(self._stop.is_set)
        self.error = None
        # producer-side decode time (s): what the worker spent inside the
        # wrapped generator — the serial-resource cost the 1-core host pays
        # per video even with perfect overlap (PARITY "video-path breakdown")
        self.decode_s = 0.0
        # producer-side frame count via `item_frames(item)` (the predictor
        # passes `len(item[0])`). Must be counted where decode_s is: with the
        # 29-crop early exit the consumer never iterates the speculative
        # buffered chunk, so a consumer-side count would pair ~1 chunk of
        # decode seconds with zero frames and bias ms/frame high.
        self.frames = 0
        self._item_frames = item_frames
        self._thread = threading.Thread(target=self._work, daemon=True)
        self._thread.start()

    def _put(self, item) -> bool:
        """Blocking put that aborts when close() signals stop — a plain
        `Queue.put` here deadlocks close(): its drain can empty the queue
        *between* the worker's wake-up and re-acquire, so the worker's item
        lands after the drain exits and the final sentinel put then blocks
        forever on the refilled 1-slot queue (measured as close()'s 10 s
        join timeout on every early-exit video)."""
        import queue
        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.05)
                return True
            except queue.Full:
                continue
        return False

    def _work(self):
        import time
        gen = iter(self._gen)
        try:
            while True:
                t0 = time.perf_counter()
                try:
                    item = next(gen)
                except StopIteration:
                    break
                self.decode_s += time.perf_counter() - t0
                if self._item_frames is not None:
                    self.frames += self._item_frames(item)
                if not self._put(item):   # 1-deep queue: decode stays 1 ahead
                    break
        except Exception as e:
            # transparency contract: an exception in the wrapped generator is
            # stashed here and RE-RAISED by the consumer's __next__ at end of
            # stream — exactly what iterating the generator directly would do
            # (a worker-thread crash must not silently truncate the stream:
            # the video would score from partial crops with no signal)
            self.error = e
        finally:
            # end-of-stream sentinel must not outlive a close(): cooperative
            # put, skipped entirely once stop is set (the consumer is in
            # close() and will never read it)
            self._put(None)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is None:
            if self.error is not None:
                raise self.error       # the generator's own exception
            raise StopIteration
        return item

    def close(self):
        """Stop the worker (frame-granular via the reader's stop hook) and
        release the decoder. Must be called by the consuming thread (the
        predictor's contract): a concurrent __next__ during close() could
        miss the sentinel and block."""
        import queue
        self._stop.set()
        try:                        # discard anything already buffered
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=10)
