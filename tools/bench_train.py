"""Training-throughput measurement (img/s) on the live backend.

Measures the full production path — host batches (uint8) → double-buffered
upload → jitted train step with on-device augmentation → device-side metric
accumulation — exactly as `Trainer._run_epoch` runs it, so the number moves
when the input pipeline does. The reference's analogue is the DataLoader
worker overlap in `CViT-main/helpers/loader.py:55-62`.

    python tools/bench_train.py [--batch 128] [--steps 30] [--model cvit]

Prints one JSON line {"img_per_sec": ..., "batch": ..., "steps": ...}.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--model", default="cvit")
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--no-augment", action="store_true")
    ap.add_argument("--cached", action="store_true",
                    help="device-cached dataset: epoch as one lax.scan jit")
    ap.add_argument("--dtype", default="float32",
                    help="compute dtype (bfloat16 = mixed precision; "
                         "params/optimizer stay fp32)")
    ap.add_argument("--frames", type=int, default=0,
                    help=">0: clip models (S3D family) — batches are "
                         "(B, frames, H, W, 3) and the metric is clips/s")
    args = ap.parse_args(argv)

    import jax
    import numpy as np

    from fac_fake_tpu.core.config import Config
    from fac_fake_tpu.models import build_model
    from fac_fake_tpu.train.trainer import Trainer

    cfg = Config()
    cfg.model.name = args.model
    cfg.model.dtype = args.dtype
    if args.batch > 32:
        # the legacy (32,1,dim) pos-embedding caps batch at 32; large-batch
        # training uses the per-position mode
        cfg.model.pos_embedding_mode = "patch"
    cfg.data.image_size = args.image_size
    cfg.data.augment.enabled = not args.no_augment
    cfg.train.log_every = 0
    cfg.train.epochs = 1

    loss_kwargs = {}
    if args.frames:
        # S3D workload shape (`S3D-train.py:318-443`): raw 0-255 floats,
        # single-logit weighted BCE, S3D-transform augs from the plan schema
        cfg.data.normalize = "raw255"
        cfg.train.loss = "bce_weighted"
        loss_kwargs = {"pos_weight": 1.0}
        input_shape = (1, args.frames, args.image_size, args.image_size, 3)
    else:
        input_shape = (1, args.image_size, args.image_size, 3)

    model = build_model(cfg.model)
    trainer = Trainer(model, cfg, loss_kwargs=loss_kwargs,
                      input_shape=input_shape)
    state = trainer.shard_state(trainer.init_state())
    rng = jax.random.key(0)

    gen = np.random.default_rng(0)

    sample = ((args.frames,) if args.frames else ()) + (
        args.image_size, args.image_size, 3)

    def batches(n):
        for _ in range(n):
            yield {
                "image": gen.integers(
                    0, 255, (args.batch,) + sample, dtype=np.uint8),
                "label": gen.integers(0, 2, (args.batch,), dtype=np.int64
                                      ).astype(np.int32),
                "mask": np.ones(args.batch, np.float32),
            }

    if args.cached:
        n = args.batch * args.steps
        images = gen.integers(0, 255, (n,) + sample, dtype=np.uint8)
        labels = gen.integers(0, 2, (n,)).astype(np.int32)
        cache = trainer.cache_data(images, labels, args.batch)
        feed = lambda: cache
    else:
        feed = lambda: batches(args.steps)

    # warmup: compile train step (+ epoch scan) and run one full pass
    state, rng, _ = trainer._run_epoch(state, feed(), rng, train=True)

    t0 = time.perf_counter()
    state, rng, _ = trainer._run_epoch(state, feed(), rng, train=True)
    # _run_epoch ends with a device_get of the accumulated metrics, which
    # through the relay forces real completion of every step
    dt = time.perf_counter() - t0

    img_per_sec = args.batch * args.steps / dt
    print(json.dumps({
        ("clips_per_sec" if args.frames else "img_per_sec"):
            round(img_per_sec, 1),
        "batch": args.batch,
        "steps": args.steps,
        "model": args.model,
        "augment": not args.no_augment,
        "cached": args.cached,
        "dtype": args.dtype,
        "seconds": round(dt, 2),
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
