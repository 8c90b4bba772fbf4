"""Video scoring CLI.

Replaces `cvit_prediction.py` / `cvit_prediction2.py` (hard-coded paths,
SURVEY.md §5.6) with flags:

  python -m fac_fake_tpu.cli.predict --videos dir/ --weights cvit.pth \
      --save-csv out.csv [--metadata meta.json]

Same public contract: input a folder of mp4s, output `filename,label` CSV of
fake-probabilities; prob < 0.5 → REAL, ≥ 0.5 → FAKE (README rule).
"""
from __future__ import annotations

import argparse
import time


def parse_args(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--videos", required=True, help="directory of .mp4 files")
    ap.add_argument("--weights", default=None,
                    help="checkpoint: torch .pth (auto-converted) or orbax dir")
    ap.add_argument("--model", default="cvit")
    ap.add_argument("--save-csv", default="predictions.csv")
    ap.add_argument("--metadata", default=None,
                    help="metadata.json to report accuracy/AUC against")
    ap.add_argument("--workers", type=int, default=None,
                    help="videos decoded/detected concurrently (default: "
                         "min(4, cpu_count) — decode is CPU-bound; the "
                         "reference pinned 1 worker only because its torch "
                         "path wasn't thread-safe)")
    ap.add_argument("--batched", action="store_true",
                    help="pack many videos per forward (throughput mode)")
    ap.add_argument("--set", nargs="*", default=[])
    return ap.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp
    from fac_fake_tpu.core.config import Config, apply_dotted
    from fac_fake_tpu.infer.predictor import VideoScorer
    from fac_fake_tpu.models import build_model

    cfg = Config()
    cfg.model.name = args.model
    apply_dotted(cfg, args.set)

    model = build_model(cfg.model)
    from fac_fake_tpu.models import init_variables
    variables = init_variables(
        model, (1, cfg.model.image_size, cfg.model.image_size, 3))
    if args.weights:
        if args.weights.endswith((".pth", ".pt")):
            from fac_fake_tpu.compat.torch_weights import (convert_cvit,
                                                           load_torch_state_dict)
            variant = "cvit" if cfg.model.name == "cvit" else "multi"
            variables = convert_cvit(load_torch_state_dict(args.weights),
                                     variables, variant)
        else:
            from fac_fake_tpu.train.checkpoint import restore_variables
            variables = restore_variables(args.weights, variables)

    scorer = VideoScorer(model, variables, cfg)
    t0 = time.perf_counter()
    df = scorer.predict_to_csv(args.videos, args.save_csv, args.workers,
                               batched=args.batched)
    dt = time.perf_counter() - t0
    print(df.to_string(index=False))
    print(f"--- {dt // 60:.0f} m {dt % 60:.0f} s ---")
    stats = scorer.latency_stats()
    if stats:
        print(f"per-video latency: p50 {stats['p50_s']:.2f}s "
              f"p90 {stats['p90_s']:.2f}s over {stats['count']} videos")

    if args.metadata:
        from fac_fake_tpu.evaluate.metrics import evaluate_prediction_csv
        out = evaluate_prediction_csv(args.save_csv, args.metadata)
        print(f"accuracy: {out['accuracy'] * 100:.2f}%  AUC: {out['auc']:.4f} "
              f"({out['count']} scored)")
    return df


if __name__ == "__main__":
    main()
