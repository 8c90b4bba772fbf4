"""Inference pipeline: frame policies, aggregation semantics, end-to-end
video scoring on the reference's sample fixtures."""
import numpy as np
import pytest

from conftest import requires_reference

SAMPLE = "/root/reference/CViT-main/sample__prediction_data/aajsqyyjni.mp4"


def test_predict_indices_match_reference_seek_pattern():
    """cvit_prediction.py:160-198 reads frame 0 twice, then strides by 5,
    for int(0.1·length) iterations."""
    from fac_fake_tpu.data.video import predict_indices
    assert predict_indices(300) == [0, 0] + [5 * j for j in range(1, 29)]
    assert predict_indices(10) == [0]
    assert predict_indices(5) == []


def test_evenly_spaced_indices():
    from fac_fake_tpu.data.video import evenly_spaced_indices
    idx = evenly_spaced_indices(100, 10)
    assert idx[0] == 0 and idx[-1] == 99 and len(idx) == 10


def test_aggregate_semantics():
    import jax.numpy as jnp
    from fac_fake_tpu.infer.aggregate import aggregate_probs

    def sig(v):
        return 1 / (1 + np.exp(-v))

    # <3 crops -> 0.5 regardless of logits
    logits = np.zeros((8, 2), np.float32)
    logits[:2] = [[5, -5], [5, -5]]
    assert float(aggregate_probs(jnp.asarray(logits), jnp.asarray(2))) == 0.5

    # fake column wins -> mean fake prob
    logits = np.zeros((8, 2), np.float32)
    logits[:4] = [[2.0, -1.0]] * 4
    got = float(aggregate_probs(jnp.asarray(logits), jnp.asarray(4)))
    assert np.isclose(got, sig(2.0), atol=1e-6)

    # real column wins -> abs(1 - mean real prob)
    logits = np.zeros((8, 2), np.float32)
    logits[:4] = [[-2.0, 1.0]] * 4
    got = float(aggregate_probs(jnp.asarray(logits), jnp.asarray(4)))
    assert np.isclose(got, abs(1 - sig(1.0)), atol=1e-6)


def _tiny_cvit():
    """A small CViT (same skeleton, 8-ch stem, dim 64) for pipeline tests."""
    from fac_fake_tpu.models.cvit import CViT
    spec = ()
    for _ in range(5):
        spec += (("conv", 8), ("bn", 8), ("relu",), ("pool",))
    return CViT(stem_spec=spec, dim=64, depth=1, heads=2, mlp_dim=64,
                pos_mode="legacy")


@requires_reference
def test_video_reader_reads_sample():
    from fac_fake_tpu.data.video import VideoReader
    r = VideoReader()
    out = r.read_frames_at_indices(SAMPLE, [0, 0, 5, 10])
    assert out is not None
    frames, idxs = out
    assert frames.shape == (4, 1080, 1920, 3) and idxs == [0, 0, 5, 10]
    assert np.array_equal(frames[0], frames[1])  # duplicate index re-emitted
    mid = r.read_middle_frame(SAMPLE)
    assert mid is not None and mid[1] == [150]


@requires_reference
def test_scorer_end_to_end_sample_video():
    import jax
    import jax.numpy as jnp
    from fac_fake_tpu.core.config import Config
    from fac_fake_tpu.infer.predictor import VideoScorer

    model = _tiny_cvit()
    variables = model.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)))
    cfg = Config()
    cfg.infer.batch_crops = 32
    scorer = VideoScorer(model, variables, cfg)

    crops = scorer.gather_crops(SAMPLE)
    assert crops.ndim == 4 and crops.shape[1:] == (224, 224, 3)
    assert 1 <= crops.shape[0] <= 29  # the sample has one visible face

    prob = scorer.score_video(SAMPLE)
    assert 0.0 <= prob <= 1.0

    # zero-crop fallback
    assert scorer.score_crops(np.zeros((0, 224, 224, 3), np.uint8)) == 0.5
    # <3 crops -> 0.5
    assert scorer.score_crops(crops[:2]) == 0.5


def test_score_crops_matches_reference_chunked_algorithm():
    """End-to-end: padded single-forward scoring == the reference's
    chunk-0:32/32:64/64:90 + sigmoid + pre_process_prediction recipe,
    recomputed here directly from model logits."""
    import jax
    import jax.numpy as jnp
    from fac_fake_tpu.core.config import Config
    from fac_fake_tpu.infer.predictor import (IMAGENET_MEAN, IMAGENET_STD,
                                              VideoScorer)

    model = _tiny_cvit()  # legacy pos mode
    variables = model.init(jax.random.key(1), jnp.zeros((1, 224, 224, 3)))
    cfg = Config()
    cfg.infer.batch_crops = 96
    scorer = VideoScorer(model, variables, cfg)

    rng = np.random.default_rng(7)
    n = 40  # spans two reference chunks
    crops = rng.integers(0, 255, (n, 224, 224, 3), dtype=np.uint8)
    got = scorer.score_crops(crops)

    # reference algorithm: chunked forwards with per-chunk pos rows
    x = (crops.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    logits = []
    for lo, hi in ((0, 32), (32, 64), (64, 90)):
        chunk = x[lo:hi]
        if chunk.shape[0] == 0:
            continue
        out = model.apply(variables, jnp.asarray(chunk), train=False)
        logits.append(np.asarray(out))
    probs = 1.0 / (1.0 + np.exp(-np.concatenate(logits)))
    f_c, r_c = probs[:, 0].mean(), probs[:, 1].mean()
    expected = f_c if f_c > r_c else abs(1 - r_c)
    assert got == pytest.approx(float(expected), abs=1e-5)


def test_batched_video_scoring_matches_per_video():
    """score_videos_batched packs V×32 slots; results must equal per-video
    score_crops for ≤32-crop videos."""
    import jax
    import jax.numpy as jnp
    from fac_fake_tpu.core.config import Config
    from fac_fake_tpu.infer.predictor import VideoScorer

    model = _tiny_cvit()
    variables = model.init(jax.random.key(2), jnp.zeros((1, 224, 224, 3)))
    cfg = Config()
    scorer = VideoScorer(model, variables, cfg)

    rng = np.random.default_rng(3)
    crops_sets = [rng.integers(0, 255, (n, 224, 224, 3), dtype=np.uint8)
                  for n in (5, 12, 0, 2)]
    scorer.gather_crops = lambda p: crops_sets[int(p)]

    batched = scorer.score_videos_batched(["0", "1", "2", "3"])
    single = [scorer.score_crops(c) for c in crops_sets]
    np.testing.assert_allclose(batched, single, atol=2e-5)
    assert batched[2] == 0.5 and batched[3] == 0.5


def test_gather_stops_decoding_at_crop_cap():
    """The stream must stop once 29 crops are stored (frames past the cap
    can't affect the score — the reference discards them too,
    `cvit_prediction.py:191-197`); decoding all ~90 sampled frames was the
    round-2 p90 tail."""
    import jax
    import jax.numpy as jnp
    from fac_fake_tpu.core.config import Config
    from fac_fake_tpu.infer.predictor import VideoScorer

    emitted = []

    class FakeReader:
        def frame_count(self, path):
            return 907                      # samples 90 indices

        def stream_frames_at_indices(self, path, idxs, chunk=16, stop=None):
            for lo in range(0, len(idxs), chunk):
                if stop is not None and stop():
                    return
                group = idxs[lo:lo + chunk]
                emitted.extend(group)
                yield np.zeros((len(group), 64, 64, 3), np.uint8), group

    class FakeDetector:                      # one face per frame
        def detect(self, frame):
            return ([(5.0, 5.0, 60.0, 60.0)], [0.9], None, [True])

    model = _tiny_cvit()
    variables = model.init(jax.random.key(6), jnp.zeros((1, 224, 224, 3)))
    cfg = Config()
    cfg.infer.detector = "mtcnn"
    scorer = VideoScorer(model, variables, cfg,
                         detector=FakeDetector(), reader=FakeReader())
    crops = scorer.gather_crops("whatever.mp4")
    assert crops.shape[0] == 29
    # 29 crops need 29 frames → 2 consumed chunks of 16, plus at most two
    # speculative chunks from the decode prefetch (ChunkPrefetcher: one
    # buffered in its 1-deep queue + one in-flight, which the real reader
    # aborts at frame granularity via `stop`) — never all 90 samples
    assert len(emitted) <= 64, len(emitted)
    assert len(emitted) < 90


def test_batched_latency_is_per_video():
    """latency_stats from the batched path must report per-video wall-clock
    (own gather start → score available), NOT time since the batch started:
    late-gathered videos get small latencies even in a long batch."""
    import time

    import jax
    import jax.numpy as jnp
    from fac_fake_tpu.core.config import Config
    from fac_fake_tpu.infer.predictor import VideoScorer

    model = _tiny_cvit()
    variables = model.init(jax.random.key(7), jnp.zeros((1, 224, 224, 3)))
    scorer = VideoScorer(model, variables, Config())
    crops = np.random.default_rng(8).integers(
        0, 255, (4, 224, 224, 3), dtype=np.uint8)

    def slow_gather(path):
        time.sleep(0.1)
        return crops

    def instant_score(chunk, results):   # timing bookkeeping is under test,
        for i, _ in chunk:               # not the forward (slow on 1 CPU core)
            results[i] = 0.7

    scorer.gather_crops = slow_gather
    scorer._score_packed = instant_score
    scorer.score_videos_batched([str(i) for i in range(10)], num_workers=1)
    lats = scorer.video_latencies
    assert len(lats) == 10
    # Load-invariant structural checks (absolute bounds flake when the
    # 1-core host is oversubscribed — sleeps only ever stretch):
    # per-video timing makes latencies DESCEND within the serially-gathered
    # first bucket (video 0 waits for 8 gathers, video 7 for ~1), and the
    # late-flushed tail waits less than the first bucket's head. Batch-start
    # timing (the round-2 bug) would give every video in a flush the SAME
    # value and the whole-batch tail the LARGEST.
    assert lats[0] > lats[7] * 1.5, lats
    assert min(lats[8:]) < lats[0] * 0.6, lats
    assert lats[0] == max(lats), lats


def test_mesh_sharded_scoring_matches_single_device():
    """Multi-chip serving: a VideoScorer over an 8-device mesh (crops
    sharded on 'data', weights replicated) produces the same scores as the
    single-device scorer — both per-video and batched paths."""
    import jax
    import jax.numpy as jnp
    from fac_fake_tpu.core.config import Config
    from fac_fake_tpu.infer.predictor import VideoScorer
    from fac_fake_tpu.parallel.mesh import build_mesh

    model = _tiny_cvit()
    variables = model.init(jax.random.key(4), jnp.zeros((1, 224, 224, 3)))
    cfg = Config()
    plain = VideoScorer(model, variables, cfg)
    mesh = build_mesh()                      # 8 virtual CPU devices (conftest)
    sharded = VideoScorer(model, variables, cfg, mesh=mesh)

    rng = np.random.default_rng(5)
    crops_sets = [rng.integers(0, 255, (n, 224, 224, 3), dtype=np.uint8)
                  for n in (7, 3, 0, 21)]
    for c in crops_sets:
        np.testing.assert_allclose(sharded.score_crops(c),
                                   plain.score_crops(c), atol=1e-6)

    sharded.gather_crops = lambda p: crops_sets[int(p)]
    plain.gather_crops = lambda p: crops_sets[int(p)]
    np.testing.assert_allclose(
        sharded.score_videos_batched(["0", "1", "2", "3"]),
        plain.score_videos_batched(["0", "1", "2", "3"]), atol=1e-6)


def test_chunk_prefetcher_order_exhaustion_and_early_close():
    """ChunkPrefetcher must preserve item order, terminate cleanly on
    exhaustion, stay exactly 1 chunk ahead, and abort the producer promptly
    on close() via the cooperative stop callable."""
    import threading
    import time as _time

    from fac_fake_tpu.data.video import ChunkPrefetcher

    # order + exhaustion
    def gen_all(stop):
        for i in range(5):
            yield i
    pf = ChunkPrefetcher(gen_all)
    assert list(pf) == [0, 1, 2, 3, 4]
    pf.close()  # idempotent after exhaustion

    # early close stops the producer via `stop` at item granularity
    produced = []
    release = threading.Event()

    def gen_slow(stop):
        for i in range(100):
            if stop():
                return
            produced.append(i)
            yield i
            release.wait(2)          # producer paused mid-stream

    pf = ChunkPrefetcher(gen_slow)
    assert next(pf) == 0
    pf._stop.set()                  # what close() sets, before unparking
    release.set()
    pf.close()
    assert not pf._thread.is_alive()
    # the producer never ran ahead more than the 1-deep buffer allows
    assert len(produced) <= 3, produced


def test_chunk_prefetcher_accounts_decode_time():
    """`decode_s` accumulates producer-side generator time — the serial
    decode cost PARITY.md's video-path breakdown (and bench.py's
    `videos_per_min_ceiling` row) is derived from."""
    import time as _time

    from fac_fake_tpu.data.video import ChunkPrefetcher

    def gen_sleepy(stop):
        for i in range(4):
            _time.sleep(0.03)
            yield i

    pf = ChunkPrefetcher(gen_sleepy)
    assert list(pf) == [0, 1, 2, 3]
    pf.close()
    assert 0.10 <= pf.decode_s <= 2.0, pf.decode_s


def test_scorer_stage_stats_accumulate():
    """enable_stage_stats(): score_crops adds score_s; gather-side decode /
    detect / frames come from the instrumented stream (exercised here via
    the packed batched path + a stub stream-less gather, so the contract —
    keys exist and accumulate — is pinned without a real video file)."""
    import jax
    import jax.numpy as jnp
    from fac_fake_tpu.core.config import Config
    from fac_fake_tpu.infer.predictor import VideoScorer

    model = _tiny_cvit()
    variables = model.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)))
    scorer = VideoScorer(model, variables, Config())
    st = scorer.enable_stage_stats()
    assert set(st) == {"decode_s", "detect_s", "score_s", "frames"}
    crops = np.random.default_rng(0).integers(
        0, 255, (5, 224, 224, 3), dtype=np.uint8)
    scorer.score_crops(crops)
    assert st["score_s"] > 0.0
    before = st["score_s"]
    scorer.gather_crops = lambda p: crops
    scorer.score_videos_batched(["a", "b"])
    assert st["score_s"] > before          # _score_packed accumulates too


def test_chunk_prefetcher_counts_frames_producer_side():
    """`frames` pairs with `decode_s` on the PRODUCER side: a chunk the
    consumer never reads (the 29-crop early exit's speculative decode) must
    still be counted, or bench's ms/frame row biases high by ~1 chunk."""
    import time as _time

    import numpy as np
    from fac_fake_tpu.data.video import ChunkPrefetcher

    def gen_chunks(stop):
        for i in range(3):
            if stop():
                return
            yield np.zeros((4, 2, 2, 3), np.uint8), list(range(4))

    pf = ChunkPrefetcher(gen_chunks, item_frames=lambda item: len(item[0]))
    next(pf)                        # consume chunk 0 only
    _time.sleep(0.2)                # worker decodes chunk 1 into the buffer
    pf.close()                      # early exit: chunk 1 never consumed
    assert pf.frames >= 8, pf.frames   # chunks 0 AND 1 counted
    # and a counter-less prefetcher stays at 0 (non-chunk streams)
    pf2 = ChunkPrefetcher(gen_chunks)
    list(pf2)
    pf2.close()
    assert pf2.frames == 0


def test_chunk_prefetcher_close_is_fast_with_saturated_producer():
    """Regression: close() while the worker is blocked in put() must not
    eat the 10 s join timeout. The old sentinel put raced close()'s drain —
    the worker's in-flight item could land *after* the drain emptied the
    queue, so the final put(None) blocked forever on the refilled 1-slot
    queue (observed as a reproducible +10 s on every early-exit video)."""
    import time as _time

    from fac_fake_tpu.data.video import ChunkPrefetcher

    def gen_fast(stop):
        i = 0
        while not stop():
            yield i
            i += 1

    pf = ChunkPrefetcher(gen_fast)
    assert next(pf) == 0
    _time.sleep(0.2)                # worker fills the queue, parks in put()
    t0 = _time.monotonic()
    pf.close()
    assert _time.monotonic() - t0 < 2.0
    assert not pf._thread.is_alive()


def test_chunk_prefetcher_worker_exception_terminates_stream():
    from fac_fake_tpu.data.video import ChunkPrefetcher

    def gen_boom(stop):
        yield 1
        raise RuntimeError("decoder died")

    pf = ChunkPrefetcher(gen_boom)
    got = []
    try:
        # transparency: the worker's exception re-raises in the consumer at
        # end of stream, exactly like iterating the generator directly —
        # a silently truncated stream would score videos from partial crops
        with pytest.raises(RuntimeError, match="decoder died"):
            for x in pf:
                got.append(x)
    finally:
        pf.close()
    assert got == [1]               # items before the error still arrive
    assert isinstance(pf.error, RuntimeError)
