"""Video forgery scorer: videos → frames → face crops → batched CViT → prob.

Re-designs the reference's main inference path (`cvit_prediction.py:153-255`,
call stack SURVEY.md §3.1) TPU-first:

  * the reference's ≤32-crop chunk loop (0:32/32:64/64:90, forced by the
    batch-indexed pos-embedding) becomes ONE padded, jitted forward with a
    per-row pos-embedding gather `idx % 32` — bit-identical row assignment
    (tests/test_cvit_parity.py), no recompiles, full MXU batches;
  * crops upload as uint8 (4× fewer bytes than fp32 through the host link);
    /255 + ImageNet normalize (`cvit_prediction.py:41-45,214-215`) are fused
    into the jitted graph;
  * detection uses the in-repo BlazeFace (the reference's dlib path is an
    external C++ lib; BlazeFace is its own vendored detector —
    `cvit_prediction.py:124-147`), up to 5 faces/frame and 29/video matching
    `face_face_rec`'s caps (`:106-121,194`);
  * aggregation is `aggregate_probs` — exact reference semantics.

The per-video host work (decode + detect) overlaps device compute via a
thread pool (the reference's ThreadPoolExecutor, `:73-83`, kept but actually
safe here: JAX dispatch is thread-safe, the model is pure).
"""
from __future__ import annotations

import os
import time
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from fac_fake_tpu.core.config import Config
from fac_fake_tpu.infer.aggregate import aggregate_probs

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

CHUNK = 32          # reference transformer batch cap
UPPER_BOUND = 90    # crops beyond 90 are dropped (`cvit_prediction.py:236`)


class VideoScorer:
    def __init__(self, model, variables, cfg: Optional[Config] = None,
                 detector=None, reader=None, fold_bn: bool = True,
                 mesh=None):
        """`mesh`: optional `jax.sharding.Mesh` for multi-chip serving —
        crops shard over the 'data' axis (weights replicated), XLA inserts
        the collectives; scores are identical to single-chip. The padded
        capacities (batch_crops, VIDEO_BUCKETS) must divide the data-axis
        size (defaults do for 2/4/8-way)."""
        from fac_fake_tpu.core.config import Config as _C
        self.cfg = cfg or _C()
        if fold_bn and hasattr(model, "stem_spec"):
            # inference reparameterization (exact — tests/test_fold.py): BN
            # folds into conv weights, ~11% faster stems
            from fac_fake_tpu.compat.fold import fold_cvit
            model, variables = fold_cvit(model, variables)
        self.model = model
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            self._rep = NamedSharding(mesh, P())
            self._shard_crops = NamedSharding(mesh, P("data"))
            self.variables = jax.device_put(variables, self._rep)
        else:
            self._rep = self._shard_crops = None
            self.variables = jax.device_put(variables)
        self._detector = detector
        self._reader = reader
        # lazy construction guard: score_videos* fan gather_crops across a
        # thread pool, and an unsynchronized check-then-set would let several
        # threads race into building BlazeFace — launching concurrent cold
        # detector compiles, which the relay requires to be serialized
        import threading
        self._lazy_lock = threading.Lock()
        self.capacity = self.cfg.infer.batch_crops
        # int8 PTQ (TPU extension, no reference analogue): calibrated lazily
        # on the first real crop batch, see `quantize_int8`
        self._quant_pending = self.cfg.infer.quantize in ("int8", "int8_full")
        self._build_score()

    def _build_score(self):
        model = self.model
        legacy = getattr(model, "pos_mode", "legacy") == "legacy"

        def score_fn(v, crops_u8, count):
            from fac_fake_tpu.ops.preprocess import normalize_imagenet
            x = normalize_imagenet(crops_u8)
            if legacy:
                pos_idx = jnp.arange(self.capacity) % CHUNK
                logits = model.apply(v, x, train=False, pos_indices=pos_idx)
            else:
                logits = model.apply(v, x, train=False)
            return aggregate_probs(logits, jnp.minimum(count, UPPER_BOUND))

        self._score = jax.jit(score_fn,
                              out_shardings=self._rep) \
            if self.mesh is not None else jax.jit(score_fn)

    def quantize_int8(self, calib_crops_u8: np.ndarray) -> int:
        """Post-training int8 quantization of the (folded) stem
        (`compat/quantize.py`) — the v5e MXU runs int8 at 2× bf16. Scores
        shift within PTQ noise (`tests/test_quantize.py` pins the bound);
        returns the number of quantized convs and rebuilds the jitted
        scorers. Prefer calling with a representative crop batch; the
        `infer.quantize="int8"` config does this automatically with the
        first scored batch."""
        from fac_fake_tpu.compat.quantize import quantize_cvit
        from fac_fake_tpu.ops.preprocess import normalize_imagenet
        with self._lazy_lock:
            already = any(op[0] == "qconv" for op in
                          getattr(self.model, "stem_spec", ())) or \
                getattr(self.model, "quant_dense", False)
            if not self._quant_pending and already:
                # already quantized (racing callers, or a second explicit
                # call). The quant_dense check matters for int8_full on a
                # model whose stem prefix quantized zero convs: re-running
                # quantize_cvit on the rewritten tree would KeyError on the
                # now-missing fp 'kernel' leaves.
                return 0
            calib = normalize_imagenet(jnp.asarray(calib_crops_u8))
            # quantize_cvit is device-native: variables stay on device (a
            # device_get here costs ~100 s on the relay's ~3.5 MB/s downlink)
            model, variables = quantize_cvit(
                self.model, self.variables, calib,
                transformer=self.cfg.infer.quantize == "int8_full")
            n_q = sum(op[0] == "qconv"
                      for f in ("stem_spec", "stem2_spec", "stem3_spec")
                      for op in (getattr(model, f, None) or ()))
            self.model = model
            self.variables = jax.device_put(
                variables, self._rep) if self.mesh is not None \
                else jax.device_put(variables)
            self._quant_pending = False
            self._batched_cache = {}
            self._build_score()
            return n_q

    def _maybe_quantize(self, crops_u8: np.ndarray):
        if self._quant_pending and crops_u8.shape[0] >= 8:
            self.quantize_int8(crops_u8)

    def _put_crops(self, padded: np.ndarray):
        """Upload a padded crop stack, sharded over the mesh when present."""
        if self._shard_crops is not None:
            return jax.device_put(padded, self._shard_crops)
        return jnp.asarray(padded)

    # --- lazily built host-side helpers -------------------------------
    @property
    def detector(self):
        """Built per `cfg.infer.detector`. The reference's predict path used
        face_recognition/dlib (`cvit_prediction.py:106-121`) with dormant
        MTCNN/BlazeFace alternates (`:86-102,124-147`); here BlazeFace is the
        default (its weights ship with the reference), the MTCNN cascade is
        `detect/mtcnn.py` (supply converted facenet_pytorch weights), and
        "face_recognition" uses the external lib when installed."""
        if self._detector is None:
            with self._lazy_lock:
                if self._detector is not None:
                    return self._detector
                kind = self.cfg.infer.detector
                if kind == "mtcnn":
                    from fac_fake_tpu.detect.mtcnn import (MTCNN,
                                                           load_mtcnn_npz)
                    weights = self.cfg.infer.mtcnn_weights
                    self._detector = MTCNN(
                        variables=load_mtcnn_npz(weights) if weights else None,
                        thresholds=self.cfg.infer.mtcnn_thresholds)
                elif kind == "face_recognition":
                    import face_recognition  # noqa: F401 — external dlib lib
                    self._detector = kind
                else:
                    from fac_fake_tpu.detect.blazeface import BlazeFace
                    self._detector = BlazeFace.from_reference_assets()
        return self._detector

    @property
    def reader(self):
        if self._reader is None:
            with self._lazy_lock:
                if self._reader is None:
                    from fac_fake_tpu.data.video import VideoReader
                    self._reader = VideoReader()
        return self._reader

    # --- crop gathering ------------------------------------------------

    # streaming decode group: a cached detector FRAME_BUCKET, so every
    # chunk hits a warm detection graph. 16 frames usually carry ≥16 faces,
    # so the 29-crop cap exits after ~2 chunks instead of decoding every
    # sampled frame (~90 for a 900-frame video — the round-2 p90 tail).
    GATHER_CHUNK = 16

    def gather_crops(self, video_path: str) -> np.ndarray:
        """Sample frames with the reference policy and collect up to 29 face
        crops (≤5 per frame), 224×224 uint8 RGB.

        Decode and detection are interleaved in GATHER_CHUNK-frame groups
        and the stream stops at the 29-crop cap — score-identical by
        construction: the reference also discards crops past 29
        (`cvit_prediction.py:191-197`), so frames decoded after crop #29
        can never affect the score. The sampled *indices* for the frames
        actually read are unchanged."""
        import cv2
        from fac_fake_tpu.data.video import ChunkPrefetcher, predict_indices
        from fac_fake_tpu.detect.extractor import FaceExtractor

        size = self.cfg.data.image_size
        n = self.reader.frame_count(video_path)
        if n <= 0:
            return np.zeros((0, size, size, 3), np.uint8)
        idxs = predict_indices(n, self.cfg.data.sample_fraction,
                               self.cfg.data.frame_jump)
        kind = self.cfg.infer.detector
        extractor = None if kind in ("mtcnn", "face_recognition") \
            else FaceExtractor(None, self.detector)

        crops: List[np.ndarray] = []
        # 1-deep prefetch: chunk N+1 decodes (CPU, GIL released) while chunk
        # N's detection runs — through the relay that's mostly upload time,
        # so the two genuinely overlap even on the 1-core host (measured
        # decode 58% / detect 34% of component time; PARITY.md "video-path
        # breakdown"). Timing only: detection sees the same frames in order.
        stream = ChunkPrefetcher(
            lambda stop: self.reader.stream_frames_at_indices(
                video_path, idxs, self.GATHER_CHUNK, stop=stop),
            item_frames=lambda item: len(item[0]))
        stats = getattr(self, "stage_stats", None)  # opt-in breakdown timers
        detect_s = 0.0
        try:
            for frames, _ in stream:
                t0 = time.perf_counter() if stats is not None else 0.0
                if extractor is None:
                    self._boxed_crops_into(crops, frames, size, kind)
                else:
                    for fd in extractor.process_frames(frames):
                        for face in fd["faces"][
                                : self.cfg.data.max_faces_per_frame]:
                            if len(crops) >= 29:  # cap (cvit_prediction:194)
                                break
                            crops.append(cv2.resize(
                                face, (size, size),
                                interpolation=cv2.INTER_AREA))
                if stats is not None:
                    detect_s += time.perf_counter() - t0
                if len(crops) >= 29:
                    break
        finally:
            stream.close()   # early exit: abort the speculative decode now
            # decode_s AND frames both come producer-side from the stream
            # (close() joined the worker, so both are final): the early-exit
            # speculative chunk's seconds and frames stay paired.
            self._stats_add(decode_s=stream.decode_s, detect_s=detect_s,
                            frames=stream.frames)
        if not crops:
            return np.zeros((0, size, size, 3), np.uint8)
        return np.stack(crops)

    def _boxed_crops_into(self, crops: List[np.ndarray], frames,
                          size: int, kind: str) -> None:
        """Box-detector crop gathering — the reference's `face_mtcnn`
        (`cvit_prediction.py:86-102`) and `face_face_rec` (`:106-121`)
        loops: ≤5 faces/frame, ≤29/video, plain box crop + 224² resize.
        Appends into `crops` so the streaming caller can stop at the cap."""
        import cv2
        max_pf = min(5, self.cfg.data.max_faces_per_frame)
        for frame in frames:
            if len(crops) >= 29:
                break
            if kind == "mtcnn":
                boxes, probs, _, valid = self.detector.detect(frame)
                rects = [(int(y1), int(y2), int(x1), int(x2))
                         for (x1, y1, x2, y2), v in zip(boxes, valid) if v]
            else:
                import face_recognition
                self.detector  # validates the lib is importable
                rects = [(top, bottom, left, right) for
                         (top, right, bottom, left)
                         in face_recognition.face_locations(frame)]
            for (y1, y2, x1, x2) in rects[:max_pf]:
                if len(crops) >= 29:
                    break
                face = frame[max(y1, 0):y2, max(x1, 0):x2]
                if face.size:
                    crops.append(cv2.resize(face, (size, size),
                                            interpolation=cv2.INTER_AREA))

    # --- scoring ---------------------------------------------------------
    def score_crops(self, crops_u8: np.ndarray) -> float:
        """Score a stack of uint8 RGB 224² crops (the bit-parity surface:
        given identical crops, matches the reference pipeline)."""
        n = int(crops_u8.shape[0])
        if n == 0:
            return float(self.cfg.infer.no_face_score)
        self._maybe_quantize(crops_u8)
        cap = self.capacity
        padded = np.zeros((cap, *crops_u8.shape[1:]), np.uint8)
        padded[: min(n, cap)] = crops_u8[:cap]
        stats = getattr(self, "stage_stats", None)
        t0 = time.perf_counter() if stats is not None else 0.0
        prob = float(self._score(self.variables, self._put_crops(padded),
                                 jnp.asarray(min(n, cap), jnp.int32)))
        if stats is not None:
            self._stats_add(score_s=time.perf_counter() - t0)
        return prob

    def score_video(self, video_path: str) -> float:
        import time
        t0 = time.perf_counter()
        prob = self.score_crops(self.gather_crops(video_path))
        if not hasattr(self, "video_latencies"):
            self.video_latencies = []
        self.video_latencies.append(time.perf_counter() - t0)
        return prob

    def latency_stats(self) -> dict:
        """p50/p90 end-to-end per-video latency (the BASELINE.md secondary
        metric). Empty until score_video has run."""
        lats = sorted(getattr(self, "video_latencies", []))
        if not lats:
            return {}
        return {"p50_s": lats[len(lats) // 2],
                "p90_s": lats[int(len(lats) * 0.9)],
                "count": len(lats)}

    def enable_stage_stats(self) -> dict:
        """Opt-in per-stage timers for the video path: accumulated decode /
        detect / score seconds + frames decoded across subsequent
        gather/score calls. Decode seconds AND the frame count are both
        producer-side, from inside the chunk generator (the 1-core host's
        serial resource — its per-video cost is the latency floor PARITY.md
        "video-path breakdown" pins), so ms/frame stays unbiased under the
        29-crop early exit; detect and score overlap it via
        `ChunkPrefetcher`, so the three shares are component costs, not
        additive wall-clock. Accumulation is lock-guarded: score_videos[
        _batched] gathers on a thread pool, and concurrent read-add-stores
        on a plain dict would drop increments on multi-core hosts."""
        import threading
        self._stats_lock = threading.Lock()
        self.stage_stats = {"decode_s": 0.0, "detect_s": 0.0,
                            "score_s": 0.0, "frames": 0}
        return self.stage_stats

    def _stats_add(self, **deltas) -> None:
        stats = getattr(self, "stage_stats", None)
        if stats is None:
            return
        with self._stats_lock:
            for k, v in deltas.items():
                stats[k] += v

    @staticmethod
    def default_workers() -> int:
        """Decode is CPU-bound: threads beyond the core count inflate
        per-video latency ~linearly (6× measured on a 1-core host)."""
        return max(1, min(4, os.cpu_count() or 1))

    def score_videos(self, paths: Sequence[str],
                     num_workers: Optional[int] = None) -> List[float]:
        """Per-video scoring with host decode/detect overlapped across videos
        by a thread pool (the reference's ThreadPoolExecutor ran with
        workers=1 because its torch path wasn't thread-safe,
        `cvit_prediction.py:302-303`; ours is — JAX dispatch is thread-safe
        and the model is pure)."""
        workers = num_workers or self.default_workers()
        with ThreadPoolExecutor(max_workers=workers) as ex:
            return list(ex.map(self.score_video, paths))

    # --- batched multi-video scoring (production throughput path) ---------
    VIDEO_SLOT = 32       # ≥ the 29-crop/video cap; pos rows = slot rows
    VIDEO_BUCKETS = (8, 32)

    def _batched_fn(self, v_cap: int):
        if not hasattr(self, "_batched_cache"):
            self._batched_cache = {}
        if v_cap in self._batched_cache:
            return self._batched_cache[v_cap]

        model, slot = self.model, self.VIDEO_SLOT
        legacy = getattr(model, "pos_mode", "legacy") == "legacy"

        def fn(v, crops_u8, counts):
            from fac_fake_tpu.ops.preprocess import normalize_imagenet
            # crops (V, slot, H, W, 3); counts (V,)
            vv = crops_u8.shape[0]
            x = normalize_imagenet(
                crops_u8.reshape(vv * slot, *crops_u8.shape[2:]))
            kw = {}
            if legacy:
                # row-within-slot == the reference's single-chunk pos rows
                kw["pos_indices"] = jnp.tile(jnp.arange(slot), vv)
            logits = model.apply(v, x, train=False, **kw).reshape(vv, slot, -1)
            return jax.vmap(aggregate_probs)(logits, counts)

        jfn = jax.jit(fn, out_shardings=self._rep) if self.mesh is not None \
            else jax.jit(fn)
        self._batched_cache[v_cap] = jfn
        return jfn

    def _score_packed(self, chunk, results):
        """Score a list of (video_index, crops) through one batched forward."""
        self._maybe_quantize(chunk[0][1])
        slot = self.VIDEO_SLOT
        v_cap = next((b for b in self.VIDEO_BUCKETS if len(chunk) <= b),
                     self.VIDEO_BUCKETS[-1])
        packed = np.zeros((v_cap, slot, *chunk[0][1].shape[1:]), np.uint8)
        counts = np.zeros((v_cap,), np.int32)
        for k, (_, crops) in enumerate(chunk):
            n = min(crops.shape[0], slot)
            packed[k, :n] = crops[:n]
            counts[k] = n
        stats = getattr(self, "stage_stats", None)
        t0 = time.perf_counter() if stats is not None else 0.0
        probs = np.asarray(self._batched_fn(v_cap)(
            self.variables, self._put_crops(packed), jnp.asarray(counts)))
        if stats is not None:
            self._stats_add(score_s=time.perf_counter() - t0)
        for k, (i, _) in enumerate(chunk):
            results[i] = float(probs[k])

    def score_videos_batched(self, paths: Sequence[str],
                             num_workers: Optional[int] = None) -> List[float]:
        """Batch crops of MANY videos into one forward (the SURVEY §5.7
        'throughput from batching across frames and videos' design): V-video
        slots of 32 rows each, vmapped aggregation — scores are identical to
        per-video scoring.

        Pipelined: gathers (host decode + device detect) run on a thread
        pool and a full bucket of videos is scored as soon as it's ready,
        instead of waiting for every gather to finish.

        `latency_stats` gets honest PER-VIDEO wall-clock: each video is
        timed from when ITS gather starts executing on a worker to when its
        score is available. (Round-2 timed from the batch start, which
        reported queue position, not per-video latency.)"""
        import time
        from concurrent.futures import as_completed

        results: List[float] = [self.cfg.infer.no_face_score] * len(paths)
        lat = self.video_latencies = getattr(self, "video_latencies", [])
        starts: dict = {}

        def gather(i: int, path: str):
            starts[i] = time.perf_counter()
            return i, self.gather_crops(path)

        pending: List[tuple] = []

        def flush():
            self._score_packed(pending, results)
            now = time.perf_counter()
            lat.extend(now - starts[i] for i, _ in pending)
            pending.clear()

        with ThreadPoolExecutor(max_workers=num_workers or
                                self.default_workers()) as ex:
            futs = [ex.submit(gather, i, p) for i, p in enumerate(paths)]
            for fut in as_completed(futs):
                i, crops = fut.result()
                if crops.shape[0] == 0:
                    lat.append(time.perf_counter() - starts[i])
                    continue
                pending.append((i, crops))
                # flush at the SMALLEST bucket: the forward is ~10 ms
                # against ~seconds of gather, so small buckets cost no
                # throughput but cut each video's bucket-wait latency 4×
                if len(pending) >= self.VIDEO_BUCKETS[0]:
                    flush()
        if pending:
            flush()
        return results

    def predict_to_csv(self, video_dir: str, save_csv: str,
                       num_workers: int = 1, batched: bool = False):
        """Directory scan + CSV dump, schema `filename,label`
        (`cvit_prediction.py:342-343`)."""
        import pandas as pd
        filenames = sorted(f for f in os.listdir(video_dir) if f.endswith(".mp4"))
        paths = [os.path.join(video_dir, f) for f in filenames]
        preds = (self.score_videos_batched(paths, num_workers) if batched
                 else self.score_videos(paths, num_workers))
        df = pd.DataFrame({"filename": filenames, "label": preds})
        os.makedirs(os.path.dirname(save_csv) or ".", exist_ok=True)
        df.to_csv(save_csv, index=False)
        return df
